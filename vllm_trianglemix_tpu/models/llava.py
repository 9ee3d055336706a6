"""LLaVA-style vision-language model: CLIP ViT tower + projector + decoder.

Reference: vllm/model_executor/models/llava.py (LlavaForConditionalGeneration)
+ clip.py (CLIPVisionModel); numerics match HF
transformers/models/llava/modeling_llava.py:

- CLIP vision tower: conv patch embed (bias-free) + CLS token + learned
  position embeddings, pre-layernorm, pre-norm transformer blocks
  (LayerNorm w/ bias, bidirectional MHA, quick-GELU MLP);
- ``vision_feature_layer`` selects a hidden state (default -2: the output
  of the second-to-last block; post_layernorm is NOT applied to it);
- ``vision_feature_select_strategy``: "default" drops the CLS row,
  "full" keeps it;
- multi_modal_projector: linear → GELU → linear into the text hidden size;
- projected image embeddings replace the embedding rows of the
  ``image_token_index`` placeholder spans; the language model is the
  generic scanned decoder (models/decoder.py).

TPU-first: the tower runs as ONE jitted ``encode_images`` over a batch of
images (bucketized by image count by the runner), with the transformer
blocks as a ``lax.scan`` over stacked layer weights — the MXU sees
[N*P, D] GEMMs, not per-layer Python loops. The placeholder merge happens
inside the decoder's jitted step via a scatter (decoder.forward mm_scatter),
so one host→device transfer ships pixel tensors and everything downstream
stays on device.
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


@dataclass(frozen=True)
class VisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "VisionConfig":
        keys = ["hidden_size", "intermediate_size", "num_hidden_layers",
                "num_attention_heads", "image_size", "patch_size",
                "layer_norm_eps", "hidden_act"]
        return cls(**{k: cfg[k] for k in keys if cfg.get(k) is not None})


@dataclass(frozen=True)
class LlavaConfig:
    text: DecoderConfig = DecoderConfig()
    vision: VisionConfig = VisionConfig()
    image_token_index: int = 32000
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = "default"
    projector_hidden_act: str = "gelu"

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
        return self.text.rope_scaling

    @property
    def tokens_per_image(self) -> int:
        n = self.vision.num_patches
        return n + 1 if self.vision_feature_select_strategy == "full" else n

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "LlavaConfig":
        tc = dict(cfg["text_config"])
        # HF nests tie_word_embeddings inconsistently across versions.
        tc.setdefault("tie_word_embeddings",
                      cfg.get("tie_word_embeddings", False))
        tc.setdefault("vocab_size", 32064)
        tc.setdefault("intermediate_size", 11008)
        tc.setdefault("max_position_embeddings", 4096)
        return cls(
            text=DecoderConfig.from_hf_config(tc),
            vision=VisionConfig.from_hf_config(cfg["vision_config"]),
            image_token_index=cfg.get("image_token_index", 32000),
            vision_feature_layer=cfg.get("vision_feature_layer", -2),
            vision_feature_select_strategy=cfg.get(
                "vision_feature_select_strategy", "default"),
            projector_hidden_act=cfg.get("projector_hidden_act", "gelu"),
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "LlavaConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


# --- parameter tree -----------------------------------------------------------

def _vision_shape_tree(vc: VisionConfig) -> dict:
    Lv, Dv, Iv = vc.num_hidden_layers, vc.hidden_size, vc.intermediate_size
    pp3 = 3 * vc.patch_size * vc.patch_size
    layers = {
        "ln1_w": (Lv, Dv), "ln1_b": (Lv, Dv),
        "q_w": (Lv, Dv, Dv), "q_b": (Lv, Dv),
        "k_w": (Lv, Dv, Dv), "k_b": (Lv, Dv),
        "v_w": (Lv, Dv, Dv), "v_b": (Lv, Dv),
        "out_w": (Lv, Dv, Dv), "out_b": (Lv, Dv),
        "ln2_w": (Lv, Dv), "ln2_b": (Lv, Dv),
        "fc1_w": (Lv, Dv, Iv), "fc1_b": (Lv, Iv),
        "fc2_w": (Lv, Iv, Dv), "fc2_b": (Lv, Dv),
    }
    return {
        "patch_embed": (pp3, Dv),
        "class_embedding": (Dv,),
        "position_embedding": (vc.num_patches + 1, Dv),
        "pre_ln_w": (Dv,), "pre_ln_b": (Dv,),
        "layers": layers,
    }


def shape_tree(cfg: LlavaConfig) -> dict:
    Dv, Dt = cfg.vision.hidden_size, cfg.text.hidden_size
    tree = decoder.shape_tree(cfg.text)
    tree["vision"] = _vision_shape_tree(cfg.vision)
    tree["projector"] = {
        "linear_1": (Dv, Dt), "bias_1": (Dt,),
        "linear_2": (Dt, Dt), "bias_2": (Dt,),
    }
    return tree


def partition_specs(cfg: LlavaConfig, quantized: str | None = None) -> dict:
    """Text decoder shards Megatron-style; the vision tower + projector are
    small (≲5% of weights for llava-1.5) and stay replicated so the encode
    runs without collectives."""
    specs = decoder.partition_specs(cfg.text, quantized=quantized)

    def rep(shapes):
        return {k: (rep(v) if isinstance(v, dict) else P(*([None] * len(v))))
                for k, v in shapes.items()}

    specs["vision"] = rep(_vision_shape_tree(cfg.vision))
    specs["projector"] = rep({
        "linear_1": (0, 0), "bias_1": (0,),
        "linear_2": (0, 0), "bias_2": (0,),
    })
    return specs


def init_random(cfg: LlavaConfig, seed: int = 0, dtype=jnp.bfloat16) -> dict:
    params = decoder.init_random(cfg.text, seed, dtype)
    shapes = {"vision": _vision_shape_tree(cfg.vision),
              "projector": shape_tree(cfg)["projector"]}
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), len(leaves))

    def init_one(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(
            dtype)

    extra = jax.tree_util.tree_unflatten(
        treedef, [init_one(k, s) for k, s in zip(keys, leaves)])
    params.update(extra)
    return params


_V_KEYMAP = {
    "ln1": "layer_norm1", "ln2": "layer_norm2",
    "q": "self_attn.q_proj", "k": "self_attn.k_proj",
    "v": "self_attn.v_proj", "out": "self_attn.out_proj",
    "fc1": "mlp.fc1", "fc2": "mlp.fc2",
}


def params_from_hf_state_dict(cfg: LlavaConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    if quant is not None:
        raise ValueError("quantized LLaVA checkpoints not wired yet")

    # Key layout differs across transformers versions: >=4.52 nests under
    # "model." ("model.language_model.*"), older checkpoints (the published
    # llava-1.5 weights) use "language_model.model.*".
    try:
        get_tensor("model.language_model.embed_tokens.weight")
        lm, vt, pj = ("model.language_model.", "model.vision_tower.",
                      "model.multi_modal_projector.")
        lm_head = "lm_head.weight"
    except KeyError:
        lm, vt, pj = ("language_model.model.", "vision_tower.",
                      "multi_modal_projector.")
        lm_head = "language_model.lm_head.weight"

    def lm_get(name: str) -> np.ndarray:
        if name == "lm_head.weight":
            return get_tensor(lm_head)
        assert name.startswith("model.")
        return get_tensor(lm + name[len("model."):])

    params = decoder.params_from_hf_state_dict(cfg.text, lm_get, dtype=dtype)

    vc = cfg.vision
    Lv = vc.num_hidden_layers
    vm = vt + "vision_model."

    def t(name):
        return jnp.asarray(np.asarray(get_tensor(name)), dtype=dtype)

    def stack(sub: str, transpose: bool) -> jnp.ndarray:
        mats = []
        for i in range(Lv):
            w = np.asarray(get_tensor(f"{vm}encoder.layers.{i}.{sub}"))
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), dtype=dtype)

    vlayers = {}
    for ours, theirs in _V_KEYMAP.items():
        vlayers[f"{ours}_w"] = stack(f"{theirs}.weight",
                                     transpose="ln" not in ours)
        vlayers[f"{ours}_b"] = stack(f"{theirs}.bias", transpose=False)

    # Conv2d weight [Dv, 3, p, p]: flatten the (c, ph, pw) taps in that
    # order to match the patchify layout in encode_images.
    conv = np.asarray(get_tensor(f"{vm}embeddings.patch_embedding.weight"))
    Dv = conv.shape[0]
    params["vision"] = {
        "patch_embed": jnp.asarray(conv.reshape(Dv, -1).T, dtype=dtype),
        "class_embedding": t(f"{vm}embeddings.class_embedding"),
        "position_embedding": t(
            f"{vm}embeddings.position_embedding.weight"),
        "pre_ln_w": t(f"{vm}pre_layrnorm.weight"),
        "pre_ln_b": t(f"{vm}pre_layrnorm.bias"),
        "layers": vlayers,
    }
    params["projector"] = {
        "linear_1": jnp.asarray(
            np.asarray(get_tensor(pj + "linear_1.weight")).T, dtype=dtype),
        "bias_1": t(pj + "linear_1.bias"),
        "linear_2": jnp.asarray(
            np.asarray(get_tensor(pj + "linear_2.weight")).T, dtype=dtype),
        "bias_2": t(pj + "linear_2.bias"),
    }
    return params


# --- vision forward -------------------------------------------------------------

def _layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (normed * w.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(x.dtype)


def _act(name: str, x: jnp.ndarray) -> jnp.ndarray:
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_new", "gelu_pytorch_tanh"):
        return jax.nn.gelu(x, approximate=(name != "gelu"))
    raise ValueError(f"unsupported activation {name!r}")


def encode_images(params: dict, cfg: LlavaConfig,
                  pixel_values: jnp.ndarray) -> jnp.ndarray:
    """pixel_values [N, 3, S, S] → projected embeddings [N, P, D_text].

    Matches HF CLIPVisionTransformer → hidden_states[vision_feature_layer]
    → (drop CLS under "default") → LlavaMultiModalProjector.
    """
    vc = cfg.vision
    vp = params["vision"]
    N = pixel_values.shape[0]
    p, S = vc.patch_size, vc.image_size
    g = S // p
    eps = vc.layer_norm_eps
    H = vc.num_attention_heads
    Dv = vc.hidden_size
    Dh = Dv // H
    scale = Dh ** -0.5

    x = pixel_values.reshape(N, 3, g, p, g, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, g * g, 3 * p * p)
    x = x.astype(vp["patch_embed"].dtype) @ vp["patch_embed"]  # [N, P, Dv]
    cls = jnp.broadcast_to(vp["class_embedding"], (N, 1, Dv))
    x = jnp.concatenate([cls, x], axis=1)                      # [N, 1+P, Dv]
    x = x + vp["position_embedding"][None]
    x = _layer_norm(x, vp["pre_ln_w"], vp["pre_ln_b"], eps)

    # hidden_states[k] is the input of block k (k=0: the embeddings), so
    # feature layer f runs blocks 0..f-1 — for f=-2 that is Lv-1 blocks.
    f = cfg.vision_feature_layer
    n_run = f if f >= 0 else vc.num_hidden_layers + 1 + f
    lp_run = jax.tree_util.tree_map(lambda a: a[:n_run], vp["layers"])

    def block(x, lp):
        h = _layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps)
        T = h.shape[1]
        q = ((h @ lp["q_w"] + lp["q_b"]) * scale).reshape(N, T, H, Dh)
        k = (h @ lp["k_w"] + lp["k_b"]).reshape(N, T, H, Dh)
        v = (h @ lp["v_w"] + lp["v_b"]).reshape(N, T, H, Dh)
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(N, T, Dv)
        x = x + (attn @ lp["out_w"] + lp["out_b"])
        h2 = _layer_norm(x, lp["ln2_w"], lp["ln2_b"], eps)
        mlp = _act(vc.hidden_act, h2 @ lp["fc1_w"] + lp["fc1_b"])
        x = x + (mlp @ lp["fc2_w"] + lp["fc2_b"])
        return x, None

    x, _ = jax.lax.scan(block, x, lp_run)

    if cfg.vision_feature_select_strategy == "default":
        x = x[:, 1:]
    pj = params["projector"]
    y = _act(cfg.projector_hidden_act,
             x @ pj["linear_1"] + pj["bias_1"])
    return y @ pj["linear_2"] + pj["bias_2"]                   # [N, P, Dt]


# --- engine protocol (text decoding delegates to the generic decoder) ---------

def forward(params, cfg: LlavaConfig, tri_cfg, token_ids, kv_caches, md,
            tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False, mm_scatter=None):
    return decoder.forward(params, cfg.text, tri_cfg, token_ids, kv_caches,
                           md, tri_flags, lora=lora, kv_quant=kv_quant,
                           moe_fn=moe_fn, fused_decode=fused_decode,
                           mm_scatter=mm_scatter)


def compute_logits(params, cfg: LlavaConfig, hidden):
    return decoder.compute_logits(params, cfg.text, hidden)


def kv_cache_spec(cfg: LlavaConfig, block_size: int, dtype_bytes: int = 2):
    return decoder.kv_cache_spec(cfg.text, block_size, dtype_bytes)
