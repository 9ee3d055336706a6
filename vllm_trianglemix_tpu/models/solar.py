"""Upstage SOLAR (SolarForCausalLM): llama + backbone skip connections.

Reference: vllm/model_executor/models/solar.py — a llama decoder whose
forward snapshots the running state at layers in ``bskcn_1``/``bskcn_2``
and blends it back at layers in ``bskcn_3``/``bskcn_4`` with the
inference weight ``tv = bskcn_tv[1]`` (solar.py:327-348). The reference
blends the (hidden, residual) pair with the same tv, which in combined
form is simply ``x = tv * x_saved + (1 - tv) * x`` at the START of each
blend layer.

TPU shape: the snapshot layers break scan uniformity, so layers run in
a python loop over the stacked parameter tree (decoder._layer_compute
per layer — compile-time cost only; SOLAR is a single niche family).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from vllm_trianglemix_tpu.attention.backend import (
    ragged_paged_attention,
    write_kv,
)
from vllm_trianglemix_tpu.models import decoder as _dec
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    compute_logits,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)
from vllm_trianglemix_tpu.models.llama import LlamaConfig

SUPPORTS_FUSED_DECODE = False  # python-loop forward; single-step decode


@dataclass(frozen=True)
class SolarConfig(LlamaConfig):
    rope_theta: float = 10_000.0
    bskcn_1: tuple = ()
    bskcn_2: tuple = ()
    bskcn_3: tuple = ()
    bskcn_4: tuple = ()
    bskcn_tv: float = 0.0          # inference weight (config bskcn_tv[1])

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "SolarConfig":
        from dataclasses import replace

        base = super().from_hf_config(cfg)
        tv = cfg.get("bskcn_tv") or (0.9, 0.0)
        return replace(
            base,
            bskcn_1=tuple(cfg.get("bskcn_1") or ()),
            bskcn_2=tuple(cfg.get("bskcn_2") or ()),
            bskcn_3=tuple(cfg.get("bskcn_3") or ()),
            bskcn_4=tuple(cfg.get("bskcn_4") or ()),
            bskcn_tv=float(tv[1]),
        )


def params_from_hf_state_dict(cfg: SolarConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    return _dec.params_from_hf_state_dict(cfg, get_tensor, dtype=dtype,
                                          quant=quant)


def forward(params, cfg: SolarConfig, tri_cfg, token_ids, kv_caches, md,
            tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False, mm_scatter=None):
    assert not fused_decode, \
        "SOLAR fused-decode path not implemented (bskcn python loop)"
    del lora, moe_fn, mm_scatter
    L = cfg.num_hidden_layers
    tv = cfg.bskcn_tv

    x = params["embed_tokens"][token_ids]
    cos, sin = _dec.rope_cos_sin(
        md.positions, cfg.head_dim, cfg.rope_theta, dtype=x.dtype,
        scaling=cfg.rope_scaling,
        max_position_embeddings=cfg.max_position_embeddings)
    attn_kwargs = _dec.build_attn_kwargs(cfg, tri_cfg, kv_quant)

    saved_1 = saved_2 = None
    new_kvs = []
    for i in range(L):
        if i in cfg.bskcn_1:
            saved_1 = x
        if i in cfg.bskcn_2:
            saved_2 = x
        if i in cfg.bskcn_3 and saved_1 is not None and tv != 0.0:
            x = saved_1 * tv + x * (1.0 - tv)
        if i in cfg.bskcn_4 and saved_2 is not None and tv != 0.0:
            x = saved_2 * tv + x * (1.0 - tv)
        lp = jax.tree_util.tree_map(lambda a: a[i], params["layers"])
        kv_l = kv_caches[i]
        kept = {}

        def attn_of(q, k, v):
            kept["kv"] = write_kv(kv_l, k, v, md, kv_quant=kv_quant)
            return ragged_paged_attention(q, kept["kv"], md,
                                          tri_flags[i], **attn_kwargs)

        x = _dec._layer_compute(x, lp, {}, None, cfg, cos, sin,
                                attn_of, None)
        new_kvs.append(kept["kv"])
    x = _dec.decoder_norm(x, params["norm"], cfg)
    return x, jnp.stack(new_kvs)
