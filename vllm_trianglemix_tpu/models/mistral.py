"""Mistral dense: the generic decoder, Llama-shaped variant.

Reference: vllm/model_executor/models/llama.py (MistralForCausalLM is
registered onto the Llama implementation there too) — no qkv bias, no
q/k norm, untied lm_head. Mistral checkpoints may declare a
``sliding_window``; the engine bounds the context with
``max_model_len`` instead (per-layer sliding-window KV groups are the
hybrid-allocator extension). See models/decoder.py for the shared
TPU-first implementation.
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
