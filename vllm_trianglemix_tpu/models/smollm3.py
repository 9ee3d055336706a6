"""SmolLM3: Llama-shaped decoder with NoPE layers.

Reference: vllm/model_executor/models/smollm3.py role + HF
transformers/models/smollm3/modeling_smollm3.py — standard RMSNorm GQA
decoder except every ``no_rope_layer_interval``-th layer skips rotary
entirely (config ``no_rope_layers``: 1 = rotate, 0 = NoPE). Expressed
through the decoder's per-layer ``rope_layers`` flag (a scanned boolean
select inside the layer scan, so the stacked-layer lax.scan body stays
single-shape).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from vllm_trianglemix_tpu.models import decoder
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class SmolLM3Config(DecoderConfig):
    tie_word_embeddings: bool = True
    rope_theta: float = 5_000_000.0
    eos_token_id: int = 128012
    bos_token_id: int = 128000

    @classmethod
    def from_hf_config(cls, cfg) -> "SmolLM3Config":
        base = super().from_hf_config(cfg)
        from dataclasses import replace

        nrl = cfg.get("no_rope_layers")
        if nrl is None and cfg.get("no_rope_layer_interval"):
            p = int(cfg["no_rope_layer_interval"])
            nrl = [0 if (i + 1) % p == 0 else 1
                   for i in range(cfg["num_hidden_layers"])]
        return replace(
            base,
            rope_layers=tuple(int(x) for x in nrl) if nrl else None,
            use_qkv_bias=bool(cfg.get("attention_bias", False)),
            use_o_bias=bool(cfg.get("attention_bias", False)),
            use_mlp_bias=bool(cfg.get("mlp_bias", False)),
        )


def params_from_hf_state_dict(cfg: SmolLM3Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    return decoder.params_from_hf_state_dict(
        cfg, get_tensor, dtype=dtype, quant=quant, **kw)
