"""Qwen3 (dense): the generic decoder with per-head q/k RMSNorm.

Architecture semantics follow the reference's wiring
(reference vllm/model_executor/models/qwen3.py:61-191 and HF Qwen3):
RMSNorm -> QKV proj (no bias) -> per-head q/k RMSNorm over head_dim ->
RoPE (rotate-half, theta=1e6) -> GQA attention -> o_proj; SwiGLU MLP;
pre-norm residual blocks; optional tied LM head. See models/decoder.py
for the shared TPU-first implementation.
"""

from __future__ import annotations

from dataclasses import dataclass

from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401  (re-export)
    DecoderConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    params_from_hf_state_dict,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class Qwen3Config(DecoderConfig):
    use_qk_norm: bool = True
    use_qkv_bias: bool = False
