"""Gemma (1) dense: GeGLU MLP, (1+w) RMSNorm, sqrt(hidden) embeddings.

Reference: vllm/model_executor/models/gemma.py + HF
transformers/models/gemma/modeling_gemma.py. Numerics to match:
- GemmaRMSNorm: fp32 normalize, multiply by (1 + w) in fp32, cast
  (modeling_gemma.py GemmaRMSNorm) — ``DecoderConfig.gemma_norm``;
- embeddings scaled by sqrt(hidden_size) in the model dtype;
- GeGLU (gelu_pytorch_tanh) MLP, head_dim 256, tied embeddings.

Everything else is the shared decoder (models/decoder.py).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
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
class GemmaConfig(DecoderConfig):
    hidden_act: str = "gelu_tanh"
    gemma_norm: bool = True
    tie_word_embeddings: bool = True
    rope_theta: float = 10_000.0
    head_dim: int = 256
    eos_token_id: int = 1
    bos_token_id: int = 2

    @classmethod
    def from_hf_config(cls, cfg) -> "GemmaConfig":
        base = super().from_hf_config(cfg)
        return replace(
            base,
            hidden_act="gelu_tanh",   # HF forces gelu_pytorch_tanh
            gemma_norm=True,
            tie_word_embeddings=True,
            embedding_multiplier=float(cfg["hidden_size"]) ** 0.5,
        )
