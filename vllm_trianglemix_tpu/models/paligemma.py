"""PaliGemma (PaliGemmaForConditionalGeneration): SigLIP ViT tower +
linear projector + Gemma decoder with a bidirectional prompt prefix.

Reference: vllm/model_executor/models/paligemma.py + siglip.py; numerics
match HF transformers/models/paligemma/modeling_paligemma.py:

- SigLIP vision tower (SiglipVisionTransformer): biased conv patch
  embed, NO class token, learned positions, pre-norm blocks (biased
  LayerNorm, bidirectional MHA, gelu-tanh MLP), post_layernorm applied
  to the output;
- multi_modal_projector: ONE biased linear; features then divided by
  sqrt(text hidden) (get_image_features:243-245) — while text embedding
  rows are MULTIPLIED by sqrt(text hidden) (the Gemma normalizer);
- image rows replace the ``image_token_index`` placeholder embeddings;
- PREFIX-LM attention at inference: every prompt token attends over the
  whole prompt bidirectionally, decode stays causal
  (_update_causal_mask "attend to the whole prefix", :202-206) — the
  decoder's prefix_lm knob routes to the XLA attention predicate and
  such requests prefill in one shot (no_chunking).

The tower functions are module-level and shared with other SigLIP
consumers (gemma3_mm).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, replace
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_trianglemix_tpu.models import decoder
from vllm_trianglemix_tpu.models.gemma import GemmaConfig
from vllm_trianglemix_tpu.models.llava import _act, _layer_norm

IS_MULTIMODAL = True


@dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_pytorch_tanh"
    projection_dim: int = 2048

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "SiglipVisionConfig":
        keys = ["hidden_size", "intermediate_size", "num_hidden_layers",
                "num_attention_heads", "image_size", "patch_size",
                "layer_norm_eps", "hidden_act", "projection_dim"]
        return cls(**{k: cfg[k] for k in keys if cfg.get(k) is not None})


def siglip_shape_tree(vc: SiglipVisionConfig) -> dict:
    Dv, Iv, Lv = (vc.hidden_size, vc.intermediate_size,
                  vc.num_hidden_layers)
    p = vc.patch_size
    layers = {}
    for k, shp in (("q", (Dv, Dv)), ("k", (Dv, Dv)), ("v", (Dv, Dv)),
                   ("out", (Dv, Dv)), ("fc1", (Dv, Iv)),
                   ("fc2", (Iv, Dv))):
        layers[f"{k}_w"] = (Lv,) + shp
        layers[f"{k}_b"] = (Lv, shp[-1])
    for k in ("ln1", "ln2"):
        layers[f"{k}_w"] = (Lv, Dv)
        layers[f"{k}_b"] = (Lv, Dv)
    return {
        "patch_embed": (3 * p * p, Dv),
        "patch_bias": (Dv,),
        "position_embedding": (vc.num_patches, Dv),
        "post_ln_w": (Dv,), "post_ln_b": (Dv,),
        "layers": layers,
    }


_SIGLIP_KEYMAP = {
    "q": "self_attn.q_proj", "k": "self_attn.k_proj",
    "v": "self_attn.v_proj", "out": "self_attn.out_proj",
    "fc1": "mlp.fc1", "fc2": "mlp.fc2",
    "ln1": "layer_norm1", "ln2": "layer_norm2",
}


def siglip_load(get_tensor, vm: str, vc: SiglipVisionConfig, dtype):
    """Load a SiglipVisionModel subtree rooted at ``vm`` (ending '.')."""
    Lv = vc.num_hidden_layers

    def t(name):
        return jnp.asarray(np.asarray(get_tensor(name)), dtype=dtype)

    def stack(sub: str, transpose: bool) -> jnp.ndarray:
        mats = []
        for i in range(Lv):
            w = np.asarray(get_tensor(f"{vm}encoder.layers.{i}.{sub}"))
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), dtype=dtype)

    layers = {}
    for ours, theirs in _SIGLIP_KEYMAP.items():
        layers[f"{ours}_w"] = stack(f"{theirs}.weight",
                                    transpose="ln" not in ours)
        layers[f"{ours}_b"] = stack(f"{theirs}.bias", transpose=False)
    conv = np.asarray(get_tensor(f"{vm}embeddings.patch_embedding.weight"))
    Dv = conv.shape[0]
    return {
        "patch_embed": jnp.asarray(conv.reshape(Dv, -1).T, dtype=dtype),
        "patch_bias": t(f"{vm}embeddings.patch_embedding.bias"),
        "position_embedding": t(
            f"{vm}embeddings.position_embedding.weight"),
        "post_ln_w": t(f"{vm}post_layernorm.weight"),
        "post_ln_b": t(f"{vm}post_layernorm.bias"),
        "layers": layers,
    }


def siglip_encode(vp: dict, vc: SiglipVisionConfig,
                  pixel_values: jnp.ndarray) -> jnp.ndarray:
    """pixel_values [N, 3, S, S] -> post-layernorm hidden [N, P, Dv]."""
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
    x = x.astype(vp["patch_embed"].dtype) @ vp["patch_embed"] \
        + vp["patch_bias"]
    x = x + vp["position_embedding"][None]

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

    x, _ = jax.lax.scan(block, x, vp["layers"])
    return _layer_norm(x, vp["post_ln_w"], vp["post_ln_b"], eps)


@dataclass(frozen=True)
class PaliGemmaConfig:
    text: GemmaConfig = field(default_factory=GemmaConfig)
    vision: SiglipVisionConfig = field(
        default_factory=SiglipVisionConfig)
    image_token_index: int = 257152

    # engine-facing delegation (models/llava.py convention)
    @property
    def num_hidden_layers(self):
        return self.text.num_hidden_layers

    @property
    def num_attention_heads(self):
        return self.text.num_attention_heads

    @property
    def num_key_value_heads(self):
        return self.text.num_key_value_heads

    @property
    def head_dim(self):
        return self.text.head_dim

    @property
    def hidden_size(self):
        return self.text.hidden_size

    @property
    def intermediate_size(self):
        return self.text.intermediate_size

    @property
    def vocab_size(self):
        return self.text.vocab_size

    @property
    def eos_token_id(self):
        return self.text.eos_token_id

    @property
    def bos_token_id(self):
        return self.text.bos_token_id

    @property
    def sliding_window(self):
        return 0

    @property
    def num_experts(self):
        return 0

    @property
    def rope_scaling(self):
        return None

    @property
    def prefix_lm(self):
        return True

    @property
    def tokens_per_image(self) -> int:
        return self.vision.num_patches

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "PaliGemmaConfig":
        tc = dict(cfg["text_config"])
        tc.setdefault("tie_word_embeddings",
                      cfg.get("tie_word_embeddings", True))
        tc.setdefault("intermediate_size", 16384)
        text = GemmaConfig.from_hf_config(tc)
        text = replace(text, prefix_lm=True)
        return cls(
            text=text,
            vision=SiglipVisionConfig.from_hf_config(cfg["vision_config"]),
            image_token_index=cfg.get("image_token_index", 257152),
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "PaliGemmaConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


def shape_tree(cfg: PaliGemmaConfig) -> dict:
    tree = decoder.shape_tree(cfg.text)
    tree["vision"] = siglip_shape_tree(cfg.vision)
    tree["projector"] = {
        "linear": (cfg.vision.hidden_size, cfg.vision.projection_dim),
        "bias": (cfg.vision.projection_dim,),
    }
    return tree


def partition_specs(cfg: PaliGemmaConfig,
                    quantized: str | None = None) -> dict:
    specs = decoder.partition_specs(cfg.text, quantized=quantized)

    def rep(shapes):
        return jax.tree_util.tree_map(
            lambda s: P(*([None] * len(s))), shapes,
            is_leaf=lambda x: isinstance(x, tuple))

    tree = shape_tree(cfg)
    specs["vision"] = rep(tree["vision"])
    specs["projector"] = rep(tree["projector"])
    return specs


def init_random(cfg: PaliGemmaConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    params = decoder.init_random(cfg.text, seed, dtype)
    tree = {"vision": siglip_shape_tree(cfg.vision),
            "projector": shape_tree(cfg)["projector"]}
    leaves, treedef = jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed + 7), len(leaves))
    extra = jax.tree_util.tree_unflatten(
        treedef,
        [(jax.random.normal(k, s, jnp.float32) * 0.02).astype(dtype)
         for k, s in zip(keys, leaves)])
    params.update(extra)
    return params


def params_from_hf_state_dict(cfg: PaliGemmaConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    if quant is not None:
        raise ValueError("quantized PaliGemma checkpoints not wired yet")
    try:
        get_tensor("model.language_model.embed_tokens.weight")
        lm, vt, pj = ("model.language_model.", "model.vision_tower.",
                      "model.multi_modal_projector.")
    except KeyError:
        lm, vt, pj = ("language_model.model.", "vision_tower.",
                      "multi_modal_projector.")

    def lm_get(name: str) -> np.ndarray:
        assert name.startswith("model.")
        return get_tensor(lm + name[len("model."):])

    params = decoder.params_from_hf_state_dict(cfg.text, lm_get,
                                               dtype=dtype)
    params["vision"] = siglip_load(get_tensor, vt + "vision_model.",
                                   cfg.vision, dtype)
    params["projector"] = {
        "linear": jnp.asarray(
            np.asarray(get_tensor(pj + "linear.weight")).T, dtype=dtype),
        "bias": jnp.asarray(np.asarray(get_tensor(pj + "linear.bias")),
                            dtype=dtype),
    }
    return params


def encode_images(params: dict, cfg: PaliGemmaConfig,
                  pixel_values: jnp.ndarray) -> jnp.ndarray:
    """[N, 3, S, S] -> projected rows [N, P, D_text].

    HF divides the projected features by sqrt(text hidden)
    (modeling_paligemma.py:243-245) and then GemmaModel multiplies the
    WHOLE scattered embedding tensor (image rows included) by the
    sqrt(text hidden) normalizer — net image rows are the raw projector
    output. Our decoder scatters AFTER the embedding multiplier, so we
    return the projector output directly (the two scales cancel)."""
    x = siglip_encode(params["vision"], cfg.vision, pixel_values)
    return x @ params["projector"]["linear"] + params["projector"]["bias"]


def forward(params, cfg: PaliGemmaConfig, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False, mm_scatter=None):
    return decoder.forward(params, cfg.text, tri_cfg, token_ids,
                           kv_caches, md, tri_flags, lora=lora,
                           kv_quant=kv_quant, moe_fn=moe_fn,
                           fused_decode=fused_decode,
                           mm_scatter=mm_scatter)


def compute_logits(params, cfg: PaliGemmaConfig, hidden):
    return decoder.compute_logits(params, cfg.text, hidden)


def kv_cache_spec(cfg: PaliGemmaConfig, block_size: int,
                  dtype_bytes: int = 2):
    return decoder.kv_cache_spec(cfg.text, block_size, dtype_bytes)
