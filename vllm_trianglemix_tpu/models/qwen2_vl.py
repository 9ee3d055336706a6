"""Qwen2-VL: ViT vision tower + 2D vision rotary + mrope text decoder.

Reference: vllm/model_executor/models/qwen2_vl.py + HF
transformers/models/qwen2_vl/modeling_qwen2_vl.py. Numerics matched:

- Vision tower: Conv3d patch embed (temporal_patch_size x p x p, single
  images repeat the frame), pre-norm blocks (LayerNorm eps 1e-6, fused
  QKV with bias, FULL attention within an image, quick-GELU MLP), 2-D
  vision rotary (first head_dim/4 frequency lanes read the patch ROW,
  the next head_dim/4 the COLUMN; rotate-half layout), PatchMerger
  (ln_q then 2x2 spatial merge -> Linear/GELU/Linear into the text
  hidden size). Patches and their (row, col) rotary ids are emitted in
  the HF processor's merge-block-contiguous order.
- Text model: Qwen2 (QKV biases) through the generic decoder with
  mrope — 3-D (temporal, height, width) position ids whose per-request
  tables follow HF get_rope_index: text runs advance all three axes
  together; an image span pins the temporal axis and rasterizes
  height/width over the merged grid; decode positions resume at
  max(table) + 1 on all axes.

Serving constraint (TPU static shapes): images are processed at ONE
fixed resolution (``vision.image_size``, preprocessor-overridable), so
every image costs the same ``tokens_per_image`` and the vision encoder
compiles once per image-count bucket — the dynamic-resolution tiling of
the HF processor maps to a resize (reference TPU deployments pin
min_pixels == max_pixels the same way).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_trianglemix_tpu.models import decoder
from vllm_trianglemix_tpu.models.decoder import DecoderConfig

IS_MULTIMODAL = True
IS_MROPE = True


@dataclass(frozen=True)
class Qwen2VLVisionConfig:
    depth: int = 32
    embed_dim: int = 1280
    num_heads: int = 16
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    mlp_ratio: float = 4.0
    in_channels: int = 3
    # fixed processing resolution (see module docstring)
    image_size: int = 448

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def llm_grid(self) -> int:
        return self.grid // self.spatial_merge_size

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "Qwen2VLVisionConfig":
        keys = ["depth", "embed_dim", "num_heads", "patch_size",
                "temporal_patch_size", "spatial_merge_size", "mlp_ratio",
                "in_channels", "image_size"]
        kw = {k: cfg[k] for k in keys if cfg.get(k) is not None}
        if "embed_dim" not in kw and cfg.get("hidden_size"):
            kw["embed_dim"] = cfg["hidden_size"]
        return cls(**kw)


@dataclass(frozen=True)
class Qwen2VLConfig:
    text: DecoderConfig = DecoderConfig()
    vision: Qwen2VLVisionConfig = Qwen2VLVisionConfig()
    image_token_index: int = 151655
    video_token_index: int = 151656
    vision_start_token_id: int = 151652
    # Serving cap on frames per video (TPU static shapes: frame counts
    # quantize to <= this, in temporal_patch_size steps); reference
    # VLLM_MAX_VIDEO... role is the processor's dynamic fps sampling.
    max_video_frames: int = 16

    # --- delegated text-model fields the engine reads ---------------------
    @property
    def num_hidden_layers(self) -> int:
        return self.text.num_hidden_layers

    @property
    def num_attention_heads(self) -> int:
        return self.text.num_attention_heads

    @property
    def num_key_value_heads(self) -> int:
        return self.text.num_key_value_heads

    @property
    def head_dim(self) -> int:
        return self.text.head_dim

    @property
    def hidden_size(self) -> int:
        return self.text.hidden_size

    @property
    def intermediate_size(self) -> int:
        return self.text.intermediate_size

    @property
    def vocab_size(self) -> int:
        return self.text.vocab_size

    @property
    def eos_token_id(self) -> int:
        return self.text.eos_token_id

    @property
    def sliding_window(self) -> int:
        return 0

    @property
    def num_experts(self) -> int:
        return 0

    @property
    def rope_scaling(self):
        return None

    @property
    def max_position_embeddings(self) -> int:
        return self.text.max_position_embeddings

    @property
    def tokens_per_image(self) -> int:
        return self.vision.llm_grid ** 2

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "Qwen2VLConfig":
        text_cfg = dict(cfg.get("text_config") or cfg)
        rs = (text_cfg.get("rope_scaling") or cfg.get("rope_scaling")
              or {})
        section = rs.get("mrope_section")
        if not section:
            raise ValueError("Qwen2-VL config missing rope_scaling."
                             "mrope_section")
        text_cfg = dict(text_cfg, rope_scaling=None)
        base = DecoderConfig.from_hf_config(text_cfg)
        from dataclasses import replace

        text = replace(base, use_qkv_bias=True,
                       mrope_section=tuple(int(x) for x in section))
        return cls(
            text=text,
            vision=Qwen2VLVisionConfig.from_hf_config(
                cfg.get("vision_config") or {}),
            image_token_index=cfg.get("image_token_id",
                                      cfg.get("image_token_index",
                                              151655)),
            video_token_index=cfg.get("video_token_id",
                                      cfg.get("video_token_index",
                                              151656)),
            vision_start_token_id=cfg.get("vision_start_token_id",
                                          151652),
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "Qwen2VLConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


# --- mrope position tables (HF Qwen2VL get_rope_index semantics) -----------

def mrope_position_table(token_ids, image_token_id: int,
                         llm_grid: int,
                         video_token_id: int | None = None,
                         video_t_scale: float = 1.0,
                         ) -> tuple[np.ndarray, int]:
    """[3, len] (temporal, height, width) position ids for a prompt with
    fixed-grid image/video placeholder spans, plus the next free position
    for decode. Text tokens advance all three axes together; an image
    span pins t and rasterizes (h, w) over the merged grid; a VIDEO span
    (a contiguous run of video placeholder tokens, n_slices * grid^2
    long) advances t by one per temporal slice while each slice
    rasterizes (h, w) — HF Qwen2VL get_rope_index video semantics."""
    ids = np.asarray(token_ids)
    n = len(ids)
    table = np.zeros((3, n), np.int64)
    st = 0
    i = 0
    per_img = llm_grid * llm_grid
    h = np.repeat(np.arange(llm_grid), llm_grid)
    w = np.tile(np.arange(llm_grid), llm_grid)
    while i < n:
        if ids[i] == image_token_id:
            span = per_img  # fixed-resolution grid
            table[0, i:i + span] = st
            table[1, i:i + span] = st + h[:span]
            table[2, i:i + span] = st + w[:span]
            st += llm_grid  # max(t=1, h, w) advance
            i += span
        elif video_token_id is not None and ids[i] == video_token_id:
            run = 1
            while i + run < n and ids[i + run] == video_token_id:
                run += 1
            n_slices = max(run // per_img, 1)
            # Qwen2.5-VL scales the temporal index by
            # second_per_grid_ts * tokens_per_second (video_t_scale;
            # Qwen2-VL: 1.0) — HF get_rope_index time_tensor semantics.
            t_of = [int(k * video_t_scale) for k in range(n_slices)]
            for k in range(n_slices):
                s0 = i + k * per_img
                table[0, s0:s0 + per_img] = st + t_of[k]
                table[1, s0:s0 + per_img] = st + h
                table[2, s0:s0 + per_img] = st + w
            st += max(t_of[-1] + 1, llm_grid)
            i += run
        else:
            table[:, i] = st
            st += 1
            i += 1
    return table, st


# --- parameter tree ---------------------------------------------------------

def _vision_shape_tree(vc: Qwen2VLVisionConfig) -> dict:
    Dv = vc.embed_dim
    I = int(Dv * vc.mlp_ratio)
    patch_in = vc.in_channels * vc.temporal_patch_size * vc.patch_size ** 2
    L = vc.depth
    return {
        "patch_embed": (patch_in, Dv),
        "layers": {
            "ln1_w": (L, Dv), "ln1_b": (L, Dv),
            "qkv_w": (L, Dv, 3 * Dv), "qkv_b": (L, 3 * Dv),
            "out_w": (L, Dv, Dv), "out_b": (L, Dv),
            "ln2_w": (L, Dv), "ln2_b": (L, Dv),
            "fc1_w": (L, Dv, I), "fc1_b": (L, I),
            "fc2_w": (L, I, Dv), "fc2_b": (L, Dv),
        },
    }


def shape_tree(cfg: Qwen2VLConfig) -> dict:
    tree = decoder.shape_tree(cfg.text)
    vc = cfg.vision
    Dv, Dt = vc.embed_dim, cfg.text.hidden_size
    ms2 = vc.spatial_merge_size ** 2
    tree["vision"] = _vision_shape_tree(vc)
    tree["merger"] = {
        "ln_q_w": (Dv,), "ln_q_b": (Dv,),
        "fc1_w": (Dv * ms2, Dv * ms2), "fc1_b": (Dv * ms2,),
        "fc2_w": (Dv * ms2, Dt), "fc2_b": (Dt,),
    }
    return tree


def partition_specs(cfg: Qwen2VLConfig, quantized: str | None = None) -> dict:
    specs = decoder.partition_specs(cfg.text, quantized)
    specs["vision"] = jax.tree_util.tree_map(
        lambda _: P(), _vision_shape_tree(cfg.vision),
        is_leaf=lambda x: isinstance(x, tuple))
    specs["merger"] = {k: P(*([None] * len(s))) for k, s in
                      shape_tree(cfg)["merger"].items()}
    return specs


def init_random(cfg: Qwen2VLConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    params = decoder.init_random(cfg.text, seed, dtype)
    shapes = {"vision": _vision_shape_tree(cfg.vision),
              "merger": shape_tree(cfg)["merger"]}
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed + 7), len(leaves))
    extra = jax.tree_util.tree_unflatten(
        treedef,
        [(jax.random.normal(k, s, jnp.float32) * 0.02).astype(dtype)
         for k, s in zip(keys, leaves)])
    params.update(extra)
    return params


def params_from_hf_state_dict(cfg: Qwen2VLConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    if quant is not None:
        raise ValueError("quantized Qwen2-VL checkpoints not wired yet")

    def get(name: str) -> np.ndarray:
        # transformers moved text weights under model.language_model and
        # vision under model.visual across versions; probe both layouts.
        for cand in (name,
                     name.replace("model.", "model.language_model.", 1)
                     if name.startswith("model.") else name,
                     "model." + name if name.startswith("visual.")
                     else name):
            try:
                return get_tensor(cand)
            except KeyError:
                continue
        return get_tensor(name)  # raise with the canonical name

    params = decoder.params_from_hf_state_dict(cfg.text, get, dtype=dtype)
    vc = cfg.vision
    L = vc.depth

    def stack(fmt: str, transpose: bool = False) -> jnp.ndarray:
        mats = []
        for i in range(L):
            w = np.asarray(get(fmt.format(i=i)))
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), dtype=dtype)

    pe = np.asarray(get("visual.patch_embed.proj.weight"))
    params["vision"] = {
        # Conv3d [Dv, C, tps, p, p] -> linear [C*tps*p*p, Dv]
        "patch_embed": jnp.asarray(pe.reshape(pe.shape[0], -1).T, dtype),
        "layers": {
            "ln1_w": stack("visual.blocks.{i}.norm1.weight"),
            "ln1_b": stack("visual.blocks.{i}.norm1.bias"),
            "qkv_w": stack("visual.blocks.{i}.attn.qkv.weight", True),
            "qkv_b": stack("visual.blocks.{i}.attn.qkv.bias"),
            "out_w": stack("visual.blocks.{i}.attn.proj.weight", True),
            "out_b": stack("visual.blocks.{i}.attn.proj.bias"),
            "ln2_w": stack("visual.blocks.{i}.norm2.weight"),
            "ln2_b": stack("visual.blocks.{i}.norm2.bias"),
            "fc1_w": stack("visual.blocks.{i}.mlp.fc1.weight", True),
            "fc1_b": stack("visual.blocks.{i}.mlp.fc1.bias"),
            "fc2_w": stack("visual.blocks.{i}.mlp.fc2.weight", True),
            "fc2_b": stack("visual.blocks.{i}.mlp.fc2.bias"),
        },
    }
    params["merger"] = {
        "ln_q_w": jnp.asarray(np.asarray(get("visual.merger.ln_q.weight")),
                              dtype),
        "ln_q_b": jnp.asarray(np.asarray(get("visual.merger.ln_q.bias")),
                              dtype),
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

def _layer_norm(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def _merge_order(grid: int, ms: int) -> np.ndarray:
    """Permutation from raster patch order to the HF processor's
    merge-block-contiguous order."""
    idx = np.arange(grid * grid).reshape(grid // ms, ms, grid // ms, ms)
    return idx.transpose(0, 2, 1, 3).reshape(-1)


def encode_images(params: dict, cfg: Qwen2VLConfig,
                  pixel_values: jnp.ndarray) -> jnp.ndarray:
    """pixel_values [N, 3, S, S] -> merged embeddings
    [N, llm_grid^2, D_text] (HF Qwen2VisionTransformer + PatchMerger).
    Single images repeat the frame temporal_patch_size times (HF
    processor tiling)."""
    vc = cfg.vision
    N = pixel_values.shape[0]
    p, g = vc.patch_size, vc.grid
    x = pixel_values.reshape(N, vc.in_channels, g, p, g, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, g * g, vc.in_channels,
                                              p * p)
    x = jnp.tile(x, (1, 1, 1, vc.temporal_patch_size)).reshape(
        N, g * g, vc.in_channels, vc.temporal_patch_size, p * p)
    # Conv3d flattening order is [C, tps, p, p]
    return _vision_tower(params, cfg, x.reshape(N, g * g, -1))


def encode_video_slices(params: dict, cfg: Qwen2VLConfig,
                        pixel_values: jnp.ndarray) -> jnp.ndarray:
    """pixel_values [N, tps, 3, S, S] (N temporal slices of tps REAL
    consecutive frames, reference Qwen2VLVideoPixelInputs) -> merged
    embeddings [N, llm_grid^2, D_text]. Identical tower to images —
    Qwen2-VL's vision attention spans one temporal slice — but the
    patch_embed consumes the real frame pair instead of a tiled copy."""
    vc = cfg.vision
    N = pixel_values.shape[0]
    p, g = vc.patch_size, vc.grid
    x = pixel_values.reshape(N, vc.temporal_patch_size, vc.in_channels,
                             g, p, g, p)
    # per-patch flattening order [C, tps, p, p]
    x = x.transpose(0, 3, 5, 2, 1, 4, 6)
    return _vision_tower(params, cfg, x.reshape(N, g * g, -1))


def _vision_tower(params: dict, cfg: Qwen2VLConfig,
                  x: jnp.ndarray) -> jnp.ndarray:
    """Shared ViT + PatchMerger over raster-order patches
    [N, g*g, C*tps*p*p]."""
    vc = cfg.vision
    vp = params["vision"]
    N = x.shape[0]
    p, g, ms = vc.patch_size, vc.grid, vc.spatial_merge_size
    H, Dv = vc.num_heads, vc.embed_dim
    Dh = vc.head_dim
    scale = Dh ** -0.5

    order = jnp.asarray(_merge_order(g, ms), jnp.int32)
    x = x[:, order]                                   # merge-block order
    x = x.astype(vp["patch_embed"].dtype) @ vp["patch_embed"]

    # 2-D vision rotary in the same permuted order
    hh = np.repeat(np.arange(g), g)[_merge_order(g, ms)]
    ww = np.tile(np.arange(g), g)[_merge_order(g, ms)]
    inv = 1.0 / (10000.0 ** (np.arange(0, Dh // 2, 2, np.float32)
                             / (Dh // 2)))
    half = np.concatenate([hh[:, None] * inv[None], ww[:, None] * inv[None]],
                          axis=1)                     # [P, Dh/2]
    emb = np.concatenate([half, half], axis=1)        # [P, Dh]
    cos = jnp.asarray(np.cos(emb), jnp.float32)
    sin = jnp.asarray(np.sin(emb), jnp.float32)

    def rot(t):
        tf = t.astype(jnp.float32)
        half_ = tf.shape[-1] // 2
        rot_half = jnp.concatenate([-tf[..., half_:], tf[..., :half_]], -1)
        return (tf * cos[None, :, None, :]
                + rot_half * sin[None, :, None, :]).astype(t.dtype)

    def block(x, lp):
        h = _layer_norm(x, lp["ln1_w"], lp["ln1_b"])
        T = h.shape[1]
        qkv = h @ lp["qkv_w"] + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rot(q.reshape(N, T, H, Dh))
        k = rot(k.reshape(N, T, H, Dh))
        v = v.reshape(N, T, H, Dh)
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(N, T, Dv)
        x = x + (attn @ lp["out_w"] + lp["out_b"])
        h2 = _layer_norm(x, lp["ln2_w"], lp["ln2_b"])
        mlp = h2 @ lp["fc1_w"] + lp["fc1_b"]
        mlp = mlp.astype(jnp.float32)
        mlp = (mlp * jax.nn.sigmoid(1.702 * mlp)).astype(x.dtype)  # quick gelu
        x = x + (mlp @ lp["fc2_w"] + lp["fc2_b"])
        return x, None

    x, _ = jax.lax.scan(block, x, vp["layers"])

    mg = params["merger"]
    x = _layer_norm(x, mg["ln_q_w"], mg["ln_q_b"])
    x = x.reshape(N, (g // ms) ** 2, ms * ms * Dv)    # 2x2 merge
    y = jax.nn.gelu(x @ mg["fc1_w"] + mg["fc1_b"], approximate=False)
    return y @ mg["fc2_w"] + mg["fc2_b"]              # [N, P_m, Dt]


# --- engine protocol ---------------------------------------------------------

def forward(params, cfg: Qwen2VLConfig, tri_cfg, token_ids, kv_caches, md,
            tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False, mm_scatter=None, **fkw):
    return decoder.forward(params, cfg.text, tri_cfg, token_ids, kv_caches,
                           md, tri_flags, lora=lora, kv_quant=kv_quant,
                           moe_fn=moe_fn, fused_decode=fused_decode,
                           mm_scatter=mm_scatter, **fkw)


def compute_logits(params, cfg: Qwen2VLConfig, hidden):
    return decoder.compute_logits(params, cfg.text, hidden)


def kv_cache_spec(cfg: Qwen2VLConfig, block_size: int,
                  dtype_bytes: int = 2):
    return decoder.kv_cache_spec(cfg.text, block_size, dtype_bytes)
