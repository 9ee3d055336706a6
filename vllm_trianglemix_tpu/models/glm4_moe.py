"""GLM-4.5 / GLM-4.6 MoE (Glm4MoeForCausalLM): GLM attention +
DeepSeek-V3-style routed experts.

Reference: vllm/model_executor/models/glm4_moe.py + HF
transformers/models/glm4_moe/modeling_glm4_moe.py. Structure:

- attention: partial rotary (0.5) in the ROTATE-HALF layout (unlike
  dense GLM-4's interleaved pairs — HF modeling_glm4_moe
  apply_rotary_pos_emb), optional per-head q/k RMSNorm, optional qkv
  bias;
- the first ``first_k_dense_replace`` layers run a dense SwiGLU MLP,
  the rest a DeepSeek-V3 MoE: sigmoid router scores + aux-loss-free
  ``e_score_correction_bias`` selection, group top-k by the sum of each
  group's top-2, weight renorm, routed_scaling_factor, plus always-on
  shared experts;
- TPU-native shape: TWO lax.scan stacks over the shared decoder's
  scan_layers (dense prefix / MoE rest — deepseek_v2.py's stack split)
  so each stack's pytree is uniform; the MoE math is the exact
  deepseek_v2._routed_moe used for V3 (noaux_tc + sigmoid).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import decoder as _dec
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    compute_logits,
    kv_cache_spec,
)
from vllm_trianglemix_tpu.models.deepseek_v2 import _routed_moe

SUPPORTS_FUSED_DECODE = False  # two-stack scan; single-step decode only


@dataclass(frozen=True)
class Glm4MoeConfig(DecoderConfig):
    partial_rotary_factor: float = 0.5
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = False
    norm_topk_prob: bool = True
    # DeepSeek-V3 routing knobs (deepseek_v2.py names so _routed_moe
    # reads them directly).
    first_k_dense_replace: int = 1
    n_group: int = 1
    topk_group: int = 1
    routed_scaling_factor: float = 1.0
    scoring_func: str = "sigmoid"
    topk_method: str = "noaux_tc"
    # e_score_correction_bias present in the checkpoint (GLM-4.5/ERNIE
    # yes; DeepSeek-V1 no)
    has_gate_bias: bool = True
    eos_token_id: int = 151329
    bos_token_id: int = 151329

    @property
    def n_routed_experts(self) -> int:
        return self.num_experts

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "Glm4MoeConfig":
        d = dict(cfg)
        d.setdefault("num_experts", d.get("n_routed_experts", 0))
        base = super().from_hf_config(d)
        shared = (d.get("n_shared_experts", 1)
                  * d.get("moe_intermediate_size", 0))
        return replace(
            base,
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            rope_theta=d.get("rope_theta", 10_000.0),
            partial_rotary_factor=d.get("partial_rotary_factor", 0.5),
            use_qk_norm=bool(d.get("use_qk_norm", False)),
            use_qkv_bias=bool(d.get("attention_bias", False)),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            shared_expert_intermediate_size=shared,
            first_k_dense_replace=d.get("first_k_dense_replace", 1),
            n_group=d.get("n_group", 1),
            topk_group=d.get("topk_group", 1),
            routed_scaling_factor=d.get("routed_scaling_factor", 1.0),
            norm_topk_prob=d.get("norm_topk_prob", True),
        )


def _stack_cfgs(cfg: Glm4MoeConfig):
    Ld = cfg.first_k_dense_replace
    Lm = cfg.num_hidden_layers - Ld
    dense = replace(cfg, num_experts=0,
                    shared_expert_intermediate_size=0,
                    num_hidden_layers=max(Ld, 1))
    moe = replace(cfg, num_hidden_layers=max(Lm, 1))
    return Ld, Lm, dense, moe


def shape_tree(cfg: Glm4MoeConfig) -> dict:
    Ld, Lm, dense, moe = _stack_cfgs(cfg)
    td = _dec.shape_tree(dense)
    tm = _dec.shape_tree(moe)
    tree = {k: v for k, v in td.items() if k != "layers"}
    tree["dense_layers"] = td["layers"] if Ld else {}
    moe_layers = dict(tm["layers"])
    if cfg.has_gate_bias:
        moe_layers["moe_gate_bias"] = (Lm, cfg.num_experts)
    tree["moe_layers"] = moe_layers if Lm else {}
    return tree


def partition_specs(cfg: Glm4MoeConfig, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    Ld, Lm, dense, moe = _stack_cfgs(cfg)
    sd = _dec.partition_specs(dense, quantized=quantized)
    sm = _dec.partition_specs(moe, quantized=quantized)
    specs = {k: v for k, v in sd.items() if k != "layers"}
    specs["dense_layers"] = sd["layers"] if Ld else {}
    moe_specs = dict(sm["layers"])
    if cfg.has_gate_bias:
        moe_specs["moe_gate_bias"] = P(None, None)
    specs["moe_layers"] = moe_specs if Lm else {}
    return specs


def init_random(cfg: Glm4MoeConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))

    def init_one(key, shape):
        # 1-D / norm-like leaves -> ones; everything else small gaussian
        # (decoder.py init_random convention).
        if len(shape) <= 2 and shape and shape[-1] == cfg.hidden_size \
                and len(shape) != 2:
            return jnp.ones(shape, dtype)
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(
            dtype)

    return jax.tree_util.tree_unflatten(
        treedef, [init_one(k, s) for k, s in zip(keys, leaves)])


def _moe_shim(cfg: Glm4MoeConfig, get_tensor, offset: int):
    """Rebase moe-stack layer indices by ``offset`` and rename GLM's
    plural ``mlp.shared_experts`` to the decoder's ``mlp.shared_expert``
    canonical names."""

    def shim(name: str):
        if name.startswith("model.layers."):
            _, _, i, rest = name.split(".", 3)
            rest = rest.replace("mlp.shared_expert.",
                                "mlp.shared_experts.")
            return get_tensor(f"model.layers.{int(i) + offset}.{rest}")
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: Glm4MoeConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None,
                              gate_bias_fmt: str = (
                                  "model.layers.{i}.mlp.gate"
                                  ".e_score_correction_bias"), **kw):
    if quant is not None:
        raise ValueError("quantized GLM-4-MoE checkpoints are not "
                         "supported yet")
    Ld, Lm, dense, moe = _stack_cfgs(cfg)
    params = {}
    if Ld:
        pd = _dec.params_from_hf_state_dict(
            cfg=dense, get_tensor=get_tensor, dtype=dtype)
        params = {k: v for k, v in pd.items() if k != "layers"}
        params["dense_layers"] = pd["layers"]
    else:
        params["dense_layers"] = {}
    if Lm:
        pm = _dec.params_from_hf_state_dict(
            cfg=moe, get_tensor=_moe_shim(cfg, get_tensor, Ld),
            dtype=dtype)
        if not Ld:
            params.update({k: v for k, v in pm.items() if k != "layers"})
        ml = pm["layers"]
        if cfg.has_gate_bias:
            ml["moe_gate_bias"] = jnp.asarray(np.stack([
                np.asarray(get_tensor(
                    gate_bias_fmt.format(i=i + Ld))).reshape(-1)
                for i in range(Lm)]), jnp.float32)
        params["moe_layers"] = ml
    else:
        params["moe_layers"] = {}
    return params


def forward(params, cfg: Glm4MoeConfig, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False):
    """Two-stack scan over the shared flat KV page pool. Returns
    (hidden[T, D], new kv_caches [L, nb, page, 2KH, D])."""
    assert not fused_decode, \
        "GLM-4-MoE fused-decode path not implemented (two-stack scan)"
    del lora, moe_fn
    Ld, Lm, dense_cfg, moe_cfg = _stack_cfgs(cfg)
    num_blocks = kv_caches.shape[1]

    x = params["embed_tokens"][token_ids]
    rot_dim = int(cfg.head_dim * cfg.partial_rotary_factor) // 2 * 2
    cos, sin = _dec.rope_cos_sin(
        md.positions, rot_dim, cfg.rope_theta, dtype=x.dtype,
        scaling=cfg.rope_scaling,
        max_position_embeddings=cfg.max_position_embeddings)
    attn_kwargs = _dec.build_attn_kwargs(cfg, tri_cfg, kv_quant)

    new_stacks = []
    if Ld:
        flat_d = kv_caches[:Ld].reshape(
            (Ld * num_blocks,) + kv_caches.shape[2:])
        x, flat_d = _dec.scan_layers(
            params["dense_layers"], dense_cfg, x, flat_d, md,
            tri_flags[:Ld], cos=cos, sin=sin, attn_kwargs=attn_kwargs,
            kv_quant=kv_quant)
        new_stacks.append(flat_d.reshape((Ld,) + kv_caches.shape[1:]))
    if Lm:
        flat_m = kv_caches[Ld:].reshape(
            (Lm * num_blocks,) + kv_caches.shape[2:])
        x, flat_m = _dec.scan_layers(
            params["moe_layers"], moe_cfg, x, flat_m, md,
            tri_flags[Ld:], cos=cos, sin=sin, attn_kwargs=attn_kwargs,
            kv_quant=kv_quant, moe_fn=_routed_moe)
        new_stacks.append(flat_m.reshape((Lm,) + kv_caches.shape[1:]))
    x = _dec.decoder_norm(x, params["norm"], cfg)
    return x, jnp.concatenate(new_stacks, axis=0)
