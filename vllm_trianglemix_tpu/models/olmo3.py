"""OLMo-3: OLMo-2's post-norm block + 3:1 sliding/full attention.

Reference: vllm/model_executor/models/olmo3.py + HF
transformers/models/olmo3/modeling_olmo3.py — OLMo-2 structure (post
norms, flat q/k RMSNorm, untied head) where 3 of every 4 layers slide;
the config's rope_scaling applies ONLY to full-attention layers while
sliding layers rotate at the plain theta (HF Olmo3RotaryEmbedding
rope_type="default"). Served via models/hybrid_window.py's
period-chunked scan + per-type KV-cache groups.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from vllm_trianglemix_tpu.models import hybrid_window as _hw
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    compute_logits,
    init_random,
    params_from_hf_state_dict,
    partition_specs,
    shape_tree,
)

SUPPORTS_FUSED_DECODE = False

forward = _hw.forward
kv_cache_spec = _hw.kv_cache_spec
kv_cache_group_specs = _hw.kv_cache_group_specs


@dataclass(frozen=True)
class Olmo3Config(DecoderConfig):
    postnorm: bool = True
    use_qk_norm: bool = True
    qk_norm_flat: bool = True
    rope_theta: float = 10_000.0
    sliding_window: int = 4096
    layer_types: tuple = ()
    full_attention_rope: str = "scaled"
    tie_word_embeddings: bool = False
    eos_token_id: int = 100257
    bos_token_id: int = 100257

    def __post_init__(self):
        if not self.layer_types:
            object.__setattr__(self, "layer_types", tuple(
                "full_attention" if (i + 1) % 4 == 0
                else "sliding_attention"
                for i in range(self.num_hidden_layers)))

    @classmethod
    def from_hf_config(cls, cfg) -> "Olmo3Config":
        base = super().from_hf_config(cfg)
        kw = dict(postnorm=True, use_qk_norm=True, qk_norm_flat=True,
                  rms_norm_eps=cfg.get("rms_norm_eps", 1e-6))
        if cfg.get("layer_types"):
            kw["layer_types"] = tuple(cfg["layer_types"])
        return replace(base, **kw)
