"""Gemma-3 (text): 5:1 sliding/full pattern, per-head qk-norm, dual rope.

Reference: vllm/model_executor/models/gemma3.py + HF
transformers/models/gemma3/modeling_gemma3.py. Gemma-2's machinery
(sandwich norms, GeGLU, scaled embeddings, per-type KV groups) carries
over; the deltas are:

- ``layer_types`` runs 5 sliding_attention then 1 full_attention;
- per-head Gemma (1+w) RMSNorm on q AND k after the head split;
- TWO rotary tables: global layers use rope_theta (1M) with the
  config's linear rope_scaling (factor 8), sliding layers use
  ``rope_local_base_freq`` (10k) unscaled;
- no attention or final logit soft-capping.

All expressed through Gemma2Config's use_qk_norm /
rope_local_base_freq knobs (models/gemma2.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from vllm_trianglemix_tpu.models.decoder import RopeScalingConfig
from vllm_trianglemix_tpu.models.gemma2 import (  # noqa: F401 (re-export)
    Gemma2Config,
    compute_logits,
    forward,
    init_random,
    kv_cache_group_specs,
    kv_cache_spec,
    params_from_hf_state_dict,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class Gemma3Config(Gemma2Config):
    use_qk_norm: bool = True
    attn_logit_softcapping: float = 0.0
    final_logit_softcapping: float = 0.0
    rope_local_base_freq: float = 10_000.0
    rope_theta: float = 1_000_000.0
    sliding_window: int = 512
    query_pre_attn_scalar: float = 256.0

    def __post_init__(self):
        if not self.layer_types:
            # default 5 sliding : 1 full (HF sliding_window_pattern=6)
            object.__setattr__(self, "layer_types", tuple(
                "full_attention" if (i + 1) % 6 == 0
                else "sliding_attention"
                for i in range(self.num_hidden_layers)))

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Gemma3Config":
        keys = ["vocab_size", "hidden_size", "intermediate_size",
                "num_hidden_layers", "num_attention_heads",
                "num_key_value_heads", "head_dim", "sliding_window",
                "query_pre_attn_scalar", "rms_norm_eps", "rope_theta",
                "rope_local_base_freq", "max_position_embeddings",
                "eos_token_id", "bos_token_id"]
        kw = {k: cfg[k] for k in keys if cfg.get(k) is not None}
        if isinstance(kw.get("eos_token_id"), list):
            kw["eos_token_id"] = kw["eos_token_id"][0]
        if cfg.get("layer_types"):
            kw["layer_types"] = tuple(cfg["layer_types"])
        elif cfg.get("sliding_window_pattern"):
            p = int(cfg["sliding_window_pattern"])
            kw["layer_types"] = tuple(
                "full_attention" if (i + 1) % p == 0
                else "sliding_attention"
                for i in range(cfg["num_hidden_layers"]))
        kw["rope_scaling"] = RopeScalingConfig.from_hf(
            cfg.get("rope_scaling"))
        kw["tie_word_embeddings"] = bool(
            cfg.get("tie_word_embeddings", True))
        return cls(**kw)
