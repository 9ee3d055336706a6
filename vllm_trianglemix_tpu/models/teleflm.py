"""TeleFLM / FLM-2 (TeleFLMForCausalLM): llama + muP scaling.

Reference: vllm/model_executor/models/teleflm.py — a llama checkpoint
(llama weight names) whose config carries muP multipliers when
``use_mup``:

- token embeddings scaled by ``input_mult`` (teleflm.py:56-64, the
  decoder's embedding_multiplier knob);
- logits scaled by ``output_mult / mup_scale_factor`` (teleflm.py:
  71-80, expressed through the decoder's logits_scaling DIVISOR as
  ``mup_scale_factor / output_mult``).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any

from vllm_trianglemix_tpu.models.llama import (  # noqa: F401 (re-export)
    LlamaConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    params_from_hf_state_dict,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class TeleFLMConfig(LlamaConfig):

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "TeleFLMConfig":
        base = super().from_hf_config(cfg)
        if not cfg.get("use_mup", False):
            return base
        out = cfg.get("output_mult", 1.0)
        scale = cfg.get("mup_scale_factor", 1.0)
        return replace(
            base,
            embedding_multiplier=cfg.get("input_mult", 1.0),
            logits_scaling=scale / out,
        )
