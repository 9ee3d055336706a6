"""EXAONE-4: post-norm block, per-head qk-norm, hybrid NoPE attention.

Reference: vllm/model_executor/models/exaone4.py + HF
transformers/models/exaone4/modeling_exaone4.py — llama-canonical
weights in a POST-norm arrangement (post_attention / post_feedforward
norms, no input norm), per-head q/k RMSNorm before rope, and a 3:1
sliding/full pattern where FULL layers skip rotary entirely ("global
NoPE": HF applies rope only when sliding or when the model has no
sliding at all). Served via models/hybrid_window.py.
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
class Exaone4Config(DecoderConfig):
    postnorm: bool = True
    use_qk_norm: bool = True
    rope_theta: float = 1_000_000.0
    sliding_window: int = 4096
    layer_types: tuple = ()
    full_attention_rope: str = "none"
    tie_word_embeddings: bool = False
    eos_token_id: int = 361
    bos_token_id: int = 1

    def __post_init__(self):
        if not self.layer_types:
            object.__setattr__(self, "layer_types", tuple(
                "full_attention" if (i + 1) % 4 == 0
                else "sliding_attention"
                for i in range(self.num_hidden_layers)))

    @classmethod
    def from_hf_config(cls, cfg) -> "Exaone4Config":
        base = super().from_hf_config(cfg)
        kw = dict(postnorm=True, use_qk_norm=True,
                  rms_norm_eps=cfg.get("rms_norm_eps", 1e-5))
        if cfg.get("layer_types"):
            kw["layer_types"] = tuple(cfg["layer_types"])
        elif not (cfg.get("sliding_window") or 0):
            # dense variants (EXAONE-4.0-1.2B has no sliding layers):
            # every layer is full attention WITH rope.
            kw["layer_types"] = tuple(
                "full_attention" for _ in range(cfg["num_hidden_layers"]))
        if not any(t == "sliding_attention"
                   for t in kw.get("layer_types", ())) \
                and kw.get("layer_types"):
            kw["full_attention_rope"] = "scaled"
        return replace(base, **kw)
