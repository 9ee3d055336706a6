"""Qwen2.5-VL: windowed ViT tower + mrope text decoder.

Reference: vllm/model_executor/models/qwen2_5_vl.py + HF
transformers/models/qwen2_5_vl/modeling_qwen2_5_vl.py. The text side is
exactly Qwen2-VL (mrope 3-D rotary over the shared decoder —
models/qwen2_vl.py); the vision tower changes:

- RMSNorm (weight-only) instead of LayerNorm in the blocks and merger;
- gated SiLU MLP (gate/up/down, biased) instead of fc1/quick-gelu/fc2;
- WINDOW attention: blocks attend within 112-pixel windows (8x8 patches
  at patch 14 / merge 2 == 4x4 merge blocks) except the
  ``fullatt_block_indexes`` blocks, which attend globally.

Fixed-resolution processing (448 x 448 -> 32x32 patches -> 4x4 windows)
keeps every shape static: patches are permuted ONCE into
window-major/merge-block-nested order (HF get_window_index without the
padding arm — the fixed grid divides evenly), window blocks run as a
batched [N*windows, 64, D] attention, and the merger output is permuted
back to raster merge-block order for the LLM placeholder span.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.layers.common import rms_norm
from vllm_trianglemix_tpu.models import decoder
from vllm_trianglemix_tpu.models.qwen2_vl import (  # noqa: F401 (re-export)
    Qwen2VLConfig,
    mrope_position_table,
)

IS_MULTIMODAL = True
IS_MROPE = True


@dataclass(frozen=True)
class Qwen25VLVisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple = (7, 15, 23, 31)
    in_channels: int = 3
    image_size: int = 448
    # HF Qwen2_5_VL get_rope_index: video temporal indices scale by
    # second_per_grid_ts * tokens_per_second (second_per_grid_ts
    # defaults to 1 without per-video fps metadata)
    tokens_per_second: float = 2.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def llm_grid(self) -> int:
        return self.grid // self.spatial_merge_size

    @property
    def window_blocks(self) -> int:
        """merge blocks per window side (HF vit_merger_window_size)."""
        return self.window_size // self.spatial_merge_size \
            // self.patch_size

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "Qwen25VLVisionConfig":
        keys = ["depth", "hidden_size", "intermediate_size", "num_heads",
                "patch_size", "temporal_patch_size", "spatial_merge_size",
                "window_size", "in_channels", "image_size",
                "tokens_per_second"]
        kw = {k: cfg[k] for k in keys if cfg.get(k) is not None}
        if cfg.get("fullatt_block_indexes") is not None:
            kw["fullatt_block_indexes"] = tuple(
                cfg["fullatt_block_indexes"])
        return cls(**kw)


@dataclass(frozen=True)
class Qwen25VLConfig(Qwen2VLConfig):
    vision: Qwen25VLVisionConfig = Qwen25VLVisionConfig()

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "Qwen25VLConfig":
        base = Qwen2VLConfig.from_hf_config(cfg)
        return cls(
            text=base.text,
            vision=Qwen25VLVisionConfig.from_hf_config(
                cfg.get("vision_config") or {}),
            image_token_index=base.image_token_index,
            video_token_index=base.video_token_index,
            vision_start_token_id=base.vision_start_token_id,
        )

    @property
    def video_t_scale(self) -> float:
        return float(self.vision.tokens_per_second)

    @classmethod
    def from_pretrained(cls, path: str) -> "Qwen25VLConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


# --- permutations ------------------------------------------------------------

def _window_patch_order(g: int, ms: int, wb: int) -> np.ndarray:
    """Raster patch index -> window-major, merge-block-nested order.

    g patches per side; ms patches per merge-block side; wb merge blocks
    per window side. Matches HF get_window_index (no padding: the fixed
    grid divides evenly) composed with the processor's merge-block
    nesting."""
    nw = g // (ms * wb)
    idx = np.arange(g * g).reshape(nw, wb, ms, nw, wb, ms)
    return idx.transpose(0, 3, 1, 4, 2, 5).reshape(-1)


def _window_block_order(g: int, ms: int, wb: int) -> np.ndarray:
    """Raster merge-block index -> window-major order (for undoing the
    permutation on the merger output)."""
    mb = g // ms
    nw = mb // wb
    idx = np.arange(mb * mb).reshape(nw, wb, nw, wb)
    return idx.transpose(0, 2, 1, 3).reshape(-1)


# --- parameter tree -----------------------------------------------------------

def _vision_shape_tree(vc: Qwen25VLVisionConfig) -> dict:
    Dv, I = vc.hidden_size, vc.intermediate_size
    L = vc.depth
    pin = vc.in_channels * vc.temporal_patch_size * vc.patch_size ** 2
    return {
        "patch_embed": (pin, Dv),
        "layers": {
            "ln1_w": (L, Dv),
            "qkv_w": (L, Dv, 3 * Dv), "qkv_b": (L, 3 * Dv),
            "out_w": (L, Dv, Dv), "out_b": (L, Dv),
            "ln2_w": (L, Dv),
            "gate_w": (L, Dv, I), "gate_b": (L, I),
            "up_w": (L, Dv, I), "up_b": (L, I),
            "down_w": (L, I, Dv), "down_b": (L, Dv),
        },
    }


def shape_tree(cfg: Qwen25VLConfig) -> dict:
    tree = decoder.shape_tree(cfg.text)
    vc = cfg.vision
    ms, Dv, Dt = (vc.spatial_merge_size, vc.hidden_size,
                  cfg.text.hidden_size)
    tree["vision"] = _vision_shape_tree(vc)
    tree["merger"] = {
        "ln_q_w": (Dv,),
        "fc1_w": (ms * ms * Dv, ms * ms * Dv),
        "fc1_b": (ms * ms * Dv,),
        "fc2_w": (ms * ms * Dv, Dt),
        "fc2_b": (Dt,),
    }
    return tree


def partition_specs(cfg: Qwen25VLConfig, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    specs = decoder.partition_specs(cfg.text, quantized)
    specs["vision"] = jax.tree_util.tree_map(
        lambda s: P(*([None] * len(s))), _vision_shape_tree(cfg.vision),
        is_leaf=lambda x: isinstance(x, tuple))
    specs["merger"] = {k: P(*([None] * len(s))) for k, s in
                       shape_tree(cfg)["merger"].items()}
    return specs


def init_random(cfg: Qwen25VLConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    params = decoder.init_random(cfg.text, seed, dtype)
    extra = {"vision": _vision_shape_tree(cfg.vision),
             "merger": shape_tree(cfg)["merger"]}
    leaves, treedef = jax.tree_util.tree_flatten(
        extra, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), len(leaves))
    vals = [(jax.random.normal(k, s, jnp.float32) * 0.02).astype(dtype)
            for k, s in zip(keys, leaves)]
    extra = jax.tree_util.tree_unflatten(treedef, vals)
    params.update(extra)
    return params


def params_from_hf_state_dict(cfg: Qwen25VLConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    if quant is not None:
        raise ValueError("quantized Qwen2.5-VL checkpoints not wired yet")

    def get(name: str) -> np.ndarray:
        for cand in (name,
                     name.replace("model.", "model.language_model.", 1)
                     if name.startswith("model.") else name,
                     "model." + name if name.startswith("visual.")
                     else name):
            try:
                return get_tensor(cand)
            except KeyError:
                continue
        return get_tensor(name)

    params = decoder.params_from_hf_state_dict(cfg.text, get, dtype=dtype)
    L = cfg.vision.depth

    def stack(fmt: str, transpose: bool = False) -> jnp.ndarray:
        mats = []
        for i in range(L):
            w = np.asarray(get(fmt.format(i=i)))
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), dtype=dtype)

    pe = np.asarray(get("visual.patch_embed.proj.weight"))
    params["vision"] = {
        "patch_embed": jnp.asarray(pe.reshape(pe.shape[0], -1).T, dtype),
        "layers": {
            "ln1_w": stack("visual.blocks.{i}.norm1.weight"),
            "qkv_w": stack("visual.blocks.{i}.attn.qkv.weight", True),
            "qkv_b": stack("visual.blocks.{i}.attn.qkv.bias"),
            "out_w": stack("visual.blocks.{i}.attn.proj.weight", True),
            "out_b": stack("visual.blocks.{i}.attn.proj.bias"),
            "ln2_w": stack("visual.blocks.{i}.norm2.weight"),
            "gate_w": stack("visual.blocks.{i}.mlp.gate_proj.weight",
                            True),
            "gate_b": stack("visual.blocks.{i}.mlp.gate_proj.bias"),
            "up_w": stack("visual.blocks.{i}.mlp.up_proj.weight", True),
            "up_b": stack("visual.blocks.{i}.mlp.up_proj.bias"),
            "down_w": stack("visual.blocks.{i}.mlp.down_proj.weight",
                            True),
            "down_b": stack("visual.blocks.{i}.mlp.down_proj.bias"),
        },
    }
    params["merger"] = {
        "ln_q_w": jnp.asarray(
            np.asarray(get("visual.merger.ln_q.weight")), dtype),
        "fc1_w": jnp.asarray(
            np.asarray(get("visual.merger.mlp.0.weight")).T, dtype),
        "fc1_b": jnp.asarray(
            np.asarray(get("visual.merger.mlp.0.bias")), dtype),
        "fc2_w": jnp.asarray(
            np.asarray(get("visual.merger.mlp.2.weight")).T, dtype),
        "fc2_b": jnp.asarray(
            np.asarray(get("visual.merger.mlp.2.bias")), dtype),
    }
    return params


# --- vision tower ------------------------------------------------------------

def encode_images(params: dict, cfg: Qwen25VLConfig,
                  pixel_values: jnp.ndarray) -> jnp.ndarray:
    """pixel_values [N, 3, S, S] -> merged embeddings
    [N, llm_grid^2, D_text] (HF Qwen2_5_VisionTransformer). Single
    images tile the frame temporal_patch_size times."""
    vc = cfg.vision
    N = pixel_values.shape[0]
    p, g = vc.patch_size, vc.grid
    P_tot = g * g
    x = pixel_values.reshape(N, vc.in_channels, g, p, g, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, P_tot, vc.in_channels,
                                              p * p)
    x = jnp.tile(x, (1, 1, 1, vc.temporal_patch_size)).reshape(
        N, P_tot, vc.in_channels, vc.temporal_patch_size, p * p)
    return _vision_tower(params, cfg, x.reshape(N, P_tot, -1))


def encode_video_slices(params: dict, cfg: Qwen25VLConfig,
                        pixel_values: jnp.ndarray) -> jnp.ndarray:
    """pixel_values [N, tps, 3, S, S] real-frame temporal slices ->
    merged embeddings [N, llm_grid^2, D_text] (reference
    Qwen2_5_VLVideoPixelInputs): same windowed tower, patch_embed fed
    the real frame pair."""
    vc = cfg.vision
    N = pixel_values.shape[0]
    p, g = vc.patch_size, vc.grid
    x = pixel_values.reshape(N, vc.temporal_patch_size, vc.in_channels,
                             g, p, g, p)
    x = x.transpose(0, 3, 5, 2, 1, 4, 6)   # [N, g, g, C, tps, p, p]
    return _vision_tower(params, cfg, x.reshape(N, g * g, -1))


def _vision_tower(params: dict, cfg: Qwen25VLConfig,
                  x: jnp.ndarray) -> jnp.ndarray:
    """Windowed ViT + merger over raster-order patches
    [N, g*g, C*tps*p*p]."""
    vc = cfg.vision
    vp = params["vision"]
    N = x.shape[0]
    p, g, ms, wb = (vc.patch_size, vc.grid, vc.spatial_merge_size,
                    vc.window_blocks)
    H, Dv, Dh = vc.num_heads, vc.hidden_size, vc.head_dim
    P_tot = g * g
    win_patches = (ms * wb) ** 2
    n_win = P_tot // win_patches
    scale = Dh ** -0.5

    order = _window_patch_order(g, ms, wb)
    x = x[:, jnp.asarray(order, jnp.int32)]
    x = x.astype(vp["patch_embed"].dtype) @ vp["patch_embed"]

    # 2-D vision rotary at each patch's true (h, w), in window order
    hh = np.repeat(np.arange(g), g)[order]
    ww = np.tile(np.arange(g), g)[order]
    inv = 1.0 / (10000.0 ** (np.arange(0, Dh // 2, 2, np.float32)
                             / (Dh // 2)))
    half = np.concatenate([hh[:, None] * inv[None],
                           ww[:, None] * inv[None]], axis=1)
    emb = np.concatenate([half, half], axis=1)        # [P, Dh]
    cos = jnp.asarray(np.cos(emb), jnp.float32)
    sin = jnp.asarray(np.sin(emb), jnp.float32)

    def rot(t):
        tf = t.astype(jnp.float32)
        half_ = tf.shape[-1] // 2
        rot_half = jnp.concatenate([-tf[..., half_:], tf[..., :half_]], -1)
        return (tf * cos[None, :, None, :]
                + rot_half * sin[None, :, None, :]).astype(t.dtype)

    def block(x, lp, full: bool):
        h = rms_norm(x, lp["ln1_w"], 1e-6)
        T = h.shape[1]
        qkv = h @ lp["qkv_w"] + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rot(q.reshape(N, T, H, Dh))
        k = rot(k.reshape(N, T, H, Dh))
        v = v.reshape(N, T, H, Dh)
        if full:
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            attn = jnp.einsum("nhqk,nkhd->nqhd", probs, v)
        else:
            # window attention: block-diagonal over n_win windows
            def w(t):
                return t.reshape(N, n_win, win_patches, H, Dh)

            logits = jnp.einsum(
                "nwqhd,nwkhd->nwhqk", w(q), w(k),
                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            attn = jnp.einsum("nwhqk,nwkhd->nwqhd", probs,
                              w(v)).reshape(N, T, H, Dh)
        x = x + (attn.reshape(N, T, Dv) @ lp["out_w"] + lp["out_b"])
        h2 = rms_norm(x, lp["ln2_w"], 1e-6)
        gate = h2 @ lp["gate_w"] + lp["gate_b"]
        up = h2 @ lp["up_w"] + lp["up_b"]
        mlp = (jax.nn.silu(gate.astype(jnp.float32))
               * up.astype(jnp.float32)).astype(x.dtype)
        return x + (mlp @ lp["down_w"] + lp["down_b"])

    full_set = set(int(i) for i in vc.fullatt_block_indexes)
    for i in range(vc.depth):
        lp = jax.tree_util.tree_map(lambda a: a[i], vp["layers"])
        x = block(x, lp, i in full_set)

    mg = params["merger"]
    x = rms_norm(x, mg["ln_q_w"], 1e-6)
    x = x.reshape(N, (g // ms) ** 2, ms * ms * Dv)    # window-major blocks
    y = jax.nn.gelu(x @ mg["fc1_w"] + mg["fc1_b"], approximate=False)
    y = y @ mg["fc2_w"] + mg["fc2_b"]                 # [N, P_m, Dt]
    # back to raster merge-block order for the LLM placeholder span
    inv_order = np.argsort(_window_block_order(g, ms, wb))
    return y[:, jnp.asarray(inv_order, jnp.int32)]


# --- engine protocol ---------------------------------------------------------

def forward(params, cfg: Qwen25VLConfig, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False, mm_scatter=None):
    return decoder.forward(params, cfg.text, tri_cfg, token_ids,
                           kv_caches, md, tri_flags, lora=lora,
                           kv_quant=kv_quant, moe_fn=moe_fn,
                           fused_decode=fused_decode,
                           mm_scatter=mm_scatter)


def compute_logits(params, cfg: Qwen25VLConfig, hidden):
    return decoder.compute_logits(params, cfg.text, hidden)


def kv_cache_spec(cfg: Qwen25VLConfig, block_size: int,
                  dtype_bytes: int = 2):
    return decoder.kv_cache_spec(cfg.text, block_size, dtype_bytes)
