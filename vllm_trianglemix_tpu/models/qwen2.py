"""Qwen2 / Qwen2.5 (dense): the generic decoder with QKV biases.

Reference: vllm/model_executor/models/qwen2.py (Qwen2 = Llama + qkv bias,
no q/k norm; Qwen3Model subclasses it). See models/decoder.py for the
shared TPU-first implementation.
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
class Qwen2Config(DecoderConfig):
    use_qk_norm: bool = False
    use_qkv_bias: bool = True
    rope_theta: float = 1_000_000.0
