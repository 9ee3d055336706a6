"""OLMo-1 (AI2): non-parametric LayerNorm + clipped qkv.

Reference: vllm/model_executor/models/olmo.py + HF
transformers/models/olmo/modeling_olmo.py — Llama-shaped decoder whose
norms are LayerNorm WITHOUT weight or bias (elementwise_affine=False,
fp32), with optional ``clip_qkv`` clamping on the q/k/v projections and
a bias-free gated SiLU MLP. Expressed through the generic decoder as
LayerNorm with no bias and a ones weight (numerically identical to the
non-parametric norm); the checkpoint simply has no norm tensors, so the
ingest shim synthesizes the ones.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import decoder
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
class OlmoConfig(DecoderConfig):
    norm_type: str = "layernorm"
    norm_bias: bool = False
    tie_word_embeddings: bool = False
    rope_theta: float = 10_000.0
    rms_norm_eps: float = 1e-5
    eos_token_id: int = 50279
    bos_token_id: int = 50279

    @classmethod
    def from_hf_config(cls, cfg) -> "OlmoConfig":
        d = dict(cfg)
        heads = d["num_attention_heads"]
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=d.get("num_key_value_heads") or heads,
            head_dim=d["hidden_size"] // heads,
            rope_theta=d.get("rope_theta", 10_000.0),
            qkv_clip=float(d.get("clip_qkv") or 0.0),
            use_qkv_bias=bool(d.get("attention_bias", False)),
            use_o_bias=bool(d.get("attention_bias", False)),
            max_position_embeddings=d.get("max_position_embeddings", 2048),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            eos_token_id=d.get("eos_token_id") or 50279,
            bos_token_id=d.get("bos_token_id") or 50279,
        )


_NORM_RX = re.compile(
    r"(model\.layers\.\d+\.(input_layernorm|post_attention_layernorm)"
    r"\.weight|model\.norm\.weight)")


def _shim(cfg: OlmoConfig, get_tensor):
    ones = np.ones(cfg.hidden_size, np.float32)

    def shim(name: str):
        if _NORM_RX.fullmatch(name):
            return ones  # non-parametric norm: no tensors in checkpoint
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: OlmoConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    return decoder.params_from_hf_state_dict(
        cfg, _shim(cfg, get_tensor), dtype=dtype, quant=quant, **kw)
