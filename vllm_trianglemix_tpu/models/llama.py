"""Llama (2/3) dense: the generic decoder, plain variant.

Reference: vllm/model_executor/models/llama.py (no qkv bias, no q/k norm,
untied lm_head for the large variants). See models/decoder.py for the
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
class LlamaConfig(DecoderConfig):
    use_qk_norm: bool = False
    use_qkv_bias: bool = False
    rope_theta: float = 500_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 128009
    bos_token_id: int = 128000
