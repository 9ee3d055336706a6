"""Mistral dense: the generic decoder, Llama-shaped variant.

Reference: vllm/model_executor/models/llama.py (MistralForCausalLM is
registered onto the Llama implementation there too) — no qkv bias, no
q/k norm, untied lm_head. A checkpoint ``sliding_window`` is enforced
for real: windowed visibility inside the attention kernels
(decoder.py attn_kwargs["attn_window"], ops/ragged_paged_attention.py)
and out-of-window KV block reclamation in the scheduler
(core/single_type_kv_cache_manager.py:SlidingWindowManager — reference
vllm/v1/core/single_type_kv_cache_manager.py:304). See models/decoder.py
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
class MistralConfig(DecoderConfig):
    use_qk_norm: bool = False
    use_qkv_bias: bool = False
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 2
    bos_token_id: int = 1
