"""MPT (MptForCausalLM): ALiBi attention, fused Wqkv, non-gated GELU MLP.

Reference: vllm/model_executor/models/mpt.py + HF
transformers/models/mpt/modeling_mpt.py. Structure over the shared
decoder:

- NO positional embeddings of any kind except ALiBi score biases
  (``attn_config.alibi``; slopes per reference mpt.py:36-46 spread
  alibi_bias_max over the next power of two of n_heads) — served via
  the XLA attention path (attention/backend.py);
- fused ``attn.Wqkv`` rows [D | KH*Dh | KH*Dh] split into q/k/v
  (HF MptAttention .split, NOT per-head interleaved);
- LayerNorm pairs norm_1/norm_2, biasless when ``no_bias`` (the MosaicML
  default), and a non-gated up_proj -> GELU -> down_proj MLP;
- optional ``clip_qkv`` clamp (the OLMo-1 knob) and ``softmax_scale``
  override; ``qk_ln`` checkpoints are rejected (LayerNorm on q/k is not
  a shared-decoder knob).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import decoder as _dec
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    alibi_slopes_mpt,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class MptConfig(DecoderConfig):
    use_rope: bool = False
    norm_type: str = "layernorm"
    norm_bias: bool = False
    gated_mlp: bool = False
    hidden_act: str = "gelu"
    tie_word_embeddings: bool = True
    eos_token_id: int = 0
    bos_token_id: int = 0

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "MptConfig":
        attn = cfg.get("attn_config") or {}
        if attn.get("qk_ln"):
            raise ValueError("MPT qk_ln checkpoints are not supported "
                             "(LayerNorm on q/k)")
        n_heads = cfg["n_heads"]
        d = cfg["d_model"]
        kv_heads = attn.get("kv_n_heads") or n_heads
        slopes = (alibi_slopes_mpt(n_heads, attn.get("alibi_bias_max", 8))
                  if attn.get("alibi", True) else None)
        if slopes is None:
            raise ValueError("non-ALiBi MPT checkpoints (learned_pos) are "
                             "not supported")
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=d,
            intermediate_size=int(cfg.get("expansion_ratio", 4)) * d,
            num_hidden_layers=cfg["n_layers"],
            num_attention_heads=n_heads,
            num_key_value_heads=kv_heads,
            head_dim=d // n_heads,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=cfg.get("max_seq_len", 2048),
            alibi_slopes=slopes,
            attention_multiplier=attn.get("softmax_scale"),
            qkv_clip=attn.get("clip_qkv") or 0.0,
            # HF MptAttention/MptMLP hardcode bias=False and the norms
            # carry no bias parameter — ``no_bias`` only matters to the
            # original MosaicML code, never to HF-format checkpoints.
            eos_token_id=cfg.get("eos_token_id") or 0,
            bos_token_id=cfg.get("bos_token_id") or 0,
        )


def _shim(cfg: MptConfig, get_tensor):
    D = cfg.hidden_size
    kv = cfg.num_key_value_heads * cfg.head_dim

    def shim(name: str):
        name = (name
                .replace("model.embed_tokens.weight",
                         "transformer.wte.weight")
                .replace("model.norm.", "transformer.norm_f."))
        if name.startswith("model.layers."):
            _, _, i, rest = name.split(".", 3)
            h = f"transformer.blocks.{i}"
            for key, hf in (("input_layernorm", "norm_1"),
                            ("post_attention_layernorm", "norm_2"),
                            ("self_attn.o_proj", "attn.out_proj"),
                            ("mlp.up_proj", "ffn.up_proj"),
                            ("mlp.down_proj", "ffn.down_proj")):
                if rest.startswith(key + "."):
                    return get_tensor(
                        f"{h}.{hf}.{rest[len(key) + 1:]}")
            for j, key in enumerate(("self_attn.q_proj", "self_attn.k_proj",
                                     "self_attn.v_proj")):
                if rest.startswith(key + "."):
                    w = np.asarray(get_tensor(
                        f"{h}.attn.Wqkv.{rest[len(key) + 1:]}"))
                    lo = (0, D, D + kv)[j]
                    hi = (D, D + kv, D + 2 * kv)[j]
                    return w[lo:hi]
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: MptConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized MPT checkpoints (fused Wqkv layouts) "
                         "are not supported yet")
    return _dec.params_from_hf_state_dict(cfg, _shim(cfg, get_tensor),
                                          dtype=dtype)
