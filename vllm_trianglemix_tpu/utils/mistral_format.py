"""Mistral-format checkpoint support: tekken tokenizer, params.json
config, consolidated weight names.

Role of the reference's vllm/transformers_utils/tokenizers/mistral.py +
configs/mistral.py (adapt_config_dict) + the per-model mistral weight
mappings (models/llama.py:505-523): serve checkpoints distributed in
Mistral's native layout —

- ``tekken.json`` tokenizer (a tiktoken-style ranked byte-BPE with a
  reserved special-token id block at the bottom of the id space);
- ``params.json`` instead of config.json (dim/n_layers/n_heads/...
  key names, ``moe`` subdict for Mixtral);
- ``consolidated.safetensors`` weight names (layers.N.attention.wq,
  feed_forward.w1/w2/w3, tok_embeddings, output, ...).

The tokenizer runs on the in-image ``tiktoken`` package (no
mistral_common dependency): tekken vocab entries carry
(rank, base64 token_bytes); token id = rank + num_special_tokens.
"""

from __future__ import annotations

import base64
import json
import os
import re


class TekkenTokenizer:
    """Minimal tekken.json tokenizer with the HF-ish surface the engine
    uses (encode / decode / eos_token_id / vocab_size)."""

    def __init__(self, path: str) -> None:
        import tiktoken

        with open(path) as f:
            data = json.load(f)
        cfg = data["config"]
        self.num_special = int(cfg.get("default_num_special_tokens", 1000))
        vocab_size = int(cfg["default_vocab_size"])
        n_words = vocab_size - self.num_special
        ranks = {
            base64.b64decode(e["token_bytes"]): int(e["rank"])
            for e in data["vocab"][:n_words]
        }
        self._enc = tiktoken.Encoding(
            "tekken", pat_str=cfg["pattern"], mergeable_ranks=ranks,
            special_tokens={})
        self.vocab_size = vocab_size

        self._special_str: dict[int, str] = {}
        for e in data.get("special_tokens") or []:
            self._special_str[int(e["rank"])] = e["token_str"]
        if not self._special_str:
            # tekken v3 default control block
            for i, s in enumerate(("<unk>", "<s>", "</s>")):
                self._special_str[i] = s

        def _find(name: str, default: int) -> int:
            for r, s in self._special_str.items():
                if s == name:
                    return r
            return default

        self.bos_token_id = _find("<s>", 1)
        self.eos_token_id = _find("</s>", 2)
        self.unk_token_id = _find("<unk>", 0)

    def encode(self, text: str, add_special_tokens: bool = True,
               **_) -> list[int]:
        ids = [t + self.num_special
               for t in self._enc.encode(text, disallowed_special=())]
        return [self.bos_token_id] + ids if add_special_tokens else ids

    def decode(self, ids, skip_special_tokens: bool = True, **_) -> str:
        out: list[str] = []
        run: list[int] = []

        def flush():
            if run:
                out.append(self._enc.decode(run))
                run.clear()

        for i in ids:
            i = int(i)
            if i < self.num_special:
                flush()
                if not skip_special_tokens:
                    out.append(self._special_str.get(i, f"<special_{i}>"))
            else:
                run.append(i - self.num_special)
        flush()
        return "".join(out)

    def convert_ids_to_tokens(self, ids, skip_special_tokens=False):
        return [self.decode([i], skip_special_tokens=skip_special_tokens)
                for i in ids]

    def __call__(self, text: str, **kw):
        return {"input_ids": self.encode(text, **kw)}

    def get_vocab(self) -> dict[str, int]:
        vocab = {s: r for r, s in self._special_str.items()}
        for bs, r in self._enc._mergeable_ranks.items():
            vocab[bs.decode("utf-8", errors="replace")] = \
                r + self.num_special
        return vocab


def params_json_to_hf_config(d: dict) -> dict:
    """Mistral params.json → HF-style config dict (reference
    configs/mistral.py _remap_general_mistral_args + MoE arch pick)."""
    d = dict(d)
    for src, dst in (("dim", "hidden_size"),
                     ("norm_eps", "rms_norm_eps"),
                     ("n_kv_heads", "num_key_value_heads"),
                     ("n_layers", "num_hidden_layers"),
                     ("n_heads", "num_attention_heads"),
                     ("hidden_dim", "intermediate_size")):
        if src in d:
            d[dst] = d.pop(src)
    d.setdefault("hidden_act", d.pop("activation", "silu"))
    d.setdefault("tie_word_embeddings", d.pop("tied_embeddings", False))
    d.setdefault("max_position_embeddings",
                 d.get("max_seq_len", 128_000))
    moe = d.get("moe") or {}
    if moe:
        d["architectures"] = ["MixtralForCausalLM"]
        d.setdefault("num_local_experts", moe.get("num_experts"))
        d.setdefault("num_experts_per_tok",
                     moe.get("num_experts_per_tok", 2))
    else:
        d["architectures"] = ["MistralForCausalLM"]
    # sliding_window may be a per-layer list (reference config.py:186)
    sw = d.get("sliding_window")
    if isinstance(sw, list):
        d["sliding_window"] = next((x for x in sw if x), None) or 0
    return d


_LAYER_RX = re.compile(r"model\.layers\.(\d+)\.(.+)")

_LEAF_MAP = {
    "self_attn.q_proj.weight": "attention.wq.weight",
    "self_attn.k_proj.weight": "attention.wk.weight",
    "self_attn.v_proj.weight": "attention.wv.weight",
    "self_attn.o_proj.weight": "attention.wo.weight",
    "input_layernorm.weight": "attention_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "mlp.gate_proj.weight": "feed_forward.w1.weight",
    "mlp.up_proj.weight": "feed_forward.w3.weight",
    "mlp.down_proj.weight": "feed_forward.w2.weight",
    "block_sparse_moe.gate.weight": "feed_forward.gate.weight",
}
_EXPERT_RX = re.compile(
    r"block_sparse_moe\.experts\.(\d+)\.(w[123])\.weight")
_TOP_MAP = {
    "model.embed_tokens.weight": "tok_embeddings.weight",
    "model.norm.weight": "norm.weight",
    "lm_head.weight": "output.weight",
}


def is_consolidated(names) -> bool:
    return "tok_embeddings.weight" in set(names)


def consolidated_shim(get_tensor):
    """Wrap a tensor reader so canonical HF names resolve against
    Mistral consolidated.safetensors names."""

    def shim(name: str):
        if name in _TOP_MAP:
            return get_tensor(_TOP_MAP[name])
        m = _LAYER_RX.fullmatch(name)
        if m:
            i, leaf = m.group(1), m.group(2)
            if leaf in _LEAF_MAP:
                return get_tensor(f"layers.{i}.{_LEAF_MAP[leaf]}")
            em = _EXPERT_RX.fullmatch(leaf)
            if em:
                return get_tensor(
                    f"layers.{i}.feed_forward.experts."
                    f"{em.group(1)}.{em.group(2)}.weight")
        return get_tensor(name)

    return shim


def detect_mistral_dir(path: str) -> bool:
    return (os.path.isfile(os.path.join(path, "params.json"))
            and not os.path.isfile(os.path.join(path, "config.json")))
