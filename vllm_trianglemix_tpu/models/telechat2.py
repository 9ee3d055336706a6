"""TeleChat2 (TeleChat2ForCausalLM): llama semantics under TeleAI's
native names.

Reference: vllm/model_executor/models/telechat2.py — a LlamaModel with
biases ONLY on the attention output projection and mlp.down_proj
(telechat2.py:52-64 constructs llama with bias=True then strips the
qkv/gate_up biases). Checkpoint scheme:

- ``transformer.word_embeddings`` / ``transformer.h.{i}`` /
  ``transformer.ln_f`` (+ ``lm_head``);
- split ``self_attention.query`` and fused ``self_attention.key_value``
  whose rows interleave per head as [k_h; v_h] pairs
  (telechat2.py:77-92), ``self_attention.dense`` WITH bias;
- llama-named mlp with a bias on ``down_proj`` only;
- config via attribute map ``n_layer``/``n_head``/``ffn_hidden_size``/
  ``layer_norm_epsilon`` (telechat2.py:43-48), MHA.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import decoder as _dec
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class TeleChat2Config(DecoderConfig):
    use_o_bias: bool = True
    use_mlp_bias: bool = True
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "TeleChat2Config":
        heads = cfg.get("n_head") or cfg["num_attention_heads"]
        layers = cfg.get("n_layer") or cfg["num_hidden_layers"]
        d = cfg["hidden_size"]
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=d,
            intermediate_size=(cfg.get("ffn_hidden_size")
                               or cfg["intermediate_size"]),
            num_hidden_layers=layers,
            num_attention_heads=heads,
            num_key_value_heads=heads,            # fused key_value is MHA
            head_dim=d // heads,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            rope_theta=cfg.get("rope_theta", 10_000.0),
            max_position_embeddings=cfg.get("seq_length")
            or cfg.get("max_position_embeddings", 8192),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            eos_token_id=cfg.get("eos_token_id") or 2,
            bos_token_id=cfg.get("bos_token_id") or 1,
        )


_KV_RX = re.compile(r"model\.layers\.(\d+)\.self_attn\.([kv])_proj\.weight")


def _shim(cfg: TeleChat2Config, get_tensor):
    n, hd = cfg.num_attention_heads, cfg.head_dim

    def split_kv(w, which: int):
        w = np.asarray(w)                       # [n*2*hd, D]
        return w.reshape(n, 2, hd, w.shape[-1])[:, which].reshape(
            n * hd, w.shape[-1])

    def shim(name: str):
        m = _KV_RX.fullmatch(name)
        if m:
            i, which = m.group(1), "kv".index(m.group(2))
            return split_kv(get_tensor(
                f"transformer.h.{i}.self_attention.key_value.weight"),
                which)
        # the checkpoint carries no gate/up biases (stripped in the
        # reference after constructing llama with mlp bias)
        if name.endswith("mlp.gate_proj.bias") \
                or name.endswith("mlp.up_proj.bias"):
            return np.zeros((cfg.intermediate_size,), np.float32)
        name = (name
                .replace("model.embed_tokens.",
                         "transformer.word_embeddings.")
                .replace("model.norm.", "transformer.ln_f."))
        m2 = re.fullmatch(r"model\.layers\.(\d+)\.(.+)", name)
        if m2:
            rest = (m2.group(2)
                    .replace("self_attn.q_proj.", "self_attention.query.")
                    .replace("self_attn.o_proj.", "self_attention.dense."))
            return get_tensor(f"transformer.h.{m2.group(1)}.{rest}")
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: TeleChat2Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized TeleChat2 checkpoints (fused "
                         "key_value) are not supported")
    return _dec.params_from_hf_state_dict(cfg, _shim(cfg, get_tensor),
                                          dtype=dtype)
