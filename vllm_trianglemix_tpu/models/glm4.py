"""GLM-4 (0414 series, Glm4ForCausalLM): GLM + sandwich norms.

Reference: vllm/model_executor/models/glm4.py + HF
transformers/models/glm4/modeling_glm4.py — the GLM decoder (interleaved
half-rotary, qkv bias, fused gate_up checkpoints) with EXTRA
``post_self_attn_layernorm`` / ``post_mlp_layernorm`` applied to the
branch outputs before their residual adds (the decoder's
``sandwich_norm`` knob).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from vllm_trianglemix_tpu.models import glm as _glm
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)
from vllm_trianglemix_tpu.models.glm import GlmConfig


@dataclass(frozen=True)
class Glm4Config(GlmConfig):
    sandwich_norm: bool = True


def params_from_hf_state_dict(cfg: Glm4Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    return _glm.params_from_hf_state_dict(cfg, get_tensor, dtype=dtype,
                                          quant=quant, **kw)
