"""OLMo-2: post-norm residual blocks with flat q/k RMSNorm.

Reference: vllm/model_executor/models/olmo2.py + HF
transformers/models/olmo2/modeling_olmo2.py — attention and MLP read the
RAW residual stream (no input norm); RMSNorms apply to the attention /
MLP OUTPUTS before their residual adds (post_attention / post_feedforward
norms); q/k RMSNorm runs over the FLAT projection (HQ*Dh / KH*Dh) before
the head split. SwiGLU MLP, untied lm_head. Expressed through the
generic decoder's postnorm / qk_norm_flat knobs.
"""

from __future__ import annotations

from dataclasses import dataclass

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
class Olmo2Config(DecoderConfig):
    postnorm: bool = True
    use_qk_norm: bool = True
    qk_norm_flat: bool = True
    rope_theta: float = 500_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 100257
    bos_token_id: int = 100257

    @classmethod
    def from_hf_config(cls, cfg) -> "Olmo2Config":
        from dataclasses import replace

        base = super().from_hf_config(cfg)
        return replace(base, postnorm=True, use_qk_norm=True,
                       qk_norm_flat=True)
