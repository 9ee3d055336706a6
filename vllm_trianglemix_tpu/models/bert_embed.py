"""Encoder-only embedding models: BERT / XLM-RoBERTa (BGE, E5, ...).

Reference: vllm/model_executor/models/bert.py + roberta.py (the
dedicated embedding architectures). Numerics match HF BertModel /
XLMRobertaModel: word + learned-position + token-type embeddings with
LayerNorm, classic post-norm blocks (LN(x + sublayer(x))), biased
q/k/v/output linears, GELU intermediate — and BIDIRECTIONAL attention.

TPU-first integration: an encoder-only request is one prefill pass plus
the engine's pooling path (cls/mean pooling, normalization — the
existing /v1/embeddings flow). There is no KV reuse, so the model
declares a 1-element dummy cache row per block and computes dense
bidirectional attention over the ragged batch in-graph, masked by
request membership — no paged gather at all. Bidirectionality forbids
chunked prefill: requests carry ``no_chunking`` and the scheduler
admits them only when the whole prompt fits the step budget.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

IS_ENCODER_ONLY = True
# Default pooling for BGE-style embedders (CLS token).
DEFAULT_POOLING_TYPE = "cls"


@dataclass(frozen=True)
class BertEmbedConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    # XLM-RoBERTa offsets learned positions by padding_idx + 1.
    position_offset: int = 0
    tie_word_embeddings: bool = True
    eos_token_id: int = 102
    bos_token_id: int = 101
    sliding_window: int = 0
    rope_scaling: Any = None
    num_experts: int = 0

    @property
    def num_key_value_heads(self) -> int:
        return self.num_attention_heads

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "BertEmbedConfig":
        keys = ["vocab_size", "hidden_size", "intermediate_size",
                "num_hidden_layers", "num_attention_heads",
                "max_position_embeddings", "type_vocab_size",
                "layer_norm_eps", "hidden_act"]
        kw = {k: cfg[k] for k in keys if cfg.get(k) is not None}
        archs = cfg.get("architectures") or []
        if any("Roberta" in a for a in archs) \
                or cfg.get("model_type") in ("roberta", "xlm-roberta"):
            kw["position_offset"] = int(cfg.get("pad_token_id", 1)) + 1
        if cfg.get("eos_token_id") is not None:
            kw["eos_token_id"] = cfg["eos_token_id"]
        return cls(**kw)

    @classmethod
    def from_pretrained(cls, path: str) -> "BertEmbedConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


def kv_cache_spec(cfg: BertEmbedConfig, block_size: int,
                  dtype_bytes: int = 2):
    from vllm_trianglemix_tpu.core.kv_cache_interface import (
        FullAttentionSpec,
    )

    # No KV is ever reused; a minimal spec keeps the allocator happy.
    return FullAttentionSpec(block_size=block_size, num_kv_heads=1,
                             head_size=1, dtype_bytes=dtype_bytes)


def kv_cache_layer_shape(cfg: BertEmbedConfig, num_blocks: int,
                         block_size: int):
    return (num_blocks, 1)


def shape_tree(cfg: BertEmbedConfig) -> dict:
    L, D, I = (cfg.num_hidden_layers, cfg.hidden_size,
               cfg.intermediate_size)
    layers = {
        "q_w": (L, D, D), "q_b": (L, D),
        "k_w": (L, D, D), "k_b": (L, D),
        "v_w": (L, D, D), "v_b": (L, D),
        "ao_w": (L, D, D), "ao_b": (L, D),
        "ao_ln_w": (L, D), "ao_ln_b": (L, D),
        "fc1_w": (L, D, I), "fc1_b": (L, I),
        "fc2_w": (L, I, D), "fc2_b": (L, D),
        "out_ln_w": (L, D), "out_ln_b": (L, D),
    }
    return {
        "word_embeddings": (cfg.vocab_size, D),
        "position_embeddings": (cfg.max_position_embeddings, D),
        "token_type_embeddings": (cfg.type_vocab_size, D),
        "emb_ln_w": (D,), "emb_ln_b": (D,),
        "layers": layers,
    }


def init_random(cfg: BertEmbedConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [(jax.random.normal(k, s, jnp.float32) * 0.02).astype(dtype)
         for k, s in zip(keys, leaves)])


def params_from_hf_state_dict(cfg: BertEmbedConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    if quant is not None:
        raise ValueError("quantized encoder checkpoints not wired yet")
    L = cfg.num_hidden_layers

    def get(name):
        # Task-model checkpoints keep the encoder under a "bert." /
        # "roberta." prefix (RobertaForMaskedLM, *ForSequence-
        # Classification); bare BertModel/XLMRobertaModel dumps don't.
        for prefix in ("", "bert.", "roberta."):
            try:
                return np.asarray(get_tensor(prefix + name))
            except KeyError:
                continue
        raise KeyError(name)

    def stack(fmt, transpose=False):
        mats = [get(fmt.format(i=i)) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats), dtype=dtype)

    p = "encoder.layer.{i}."
    layers = {
        "q_w": stack(p + "attention.self.query.weight", True),
        "q_b": stack(p + "attention.self.query.bias"),
        "k_w": stack(p + "attention.self.key.weight", True),
        "k_b": stack(p + "attention.self.key.bias"),
        "v_w": stack(p + "attention.self.value.weight", True),
        "v_b": stack(p + "attention.self.value.bias"),
        "ao_w": stack(p + "attention.output.dense.weight", True),
        "ao_b": stack(p + "attention.output.dense.bias"),
        "ao_ln_w": stack(p + "attention.output.LayerNorm.weight"),
        "ao_ln_b": stack(p + "attention.output.LayerNorm.bias"),
        "fc1_w": stack(p + "intermediate.dense.weight", True),
        "fc1_b": stack(p + "intermediate.dense.bias"),
        "fc2_w": stack(p + "output.dense.weight", True),
        "fc2_b": stack(p + "output.dense.bias"),
        "out_ln_w": stack(p + "output.LayerNorm.weight"),
        "out_ln_b": stack(p + "output.LayerNorm.bias"),
    }
    return {
        "word_embeddings": jnp.asarray(
            get("embeddings.word_embeddings.weight"), dtype),
        "position_embeddings": jnp.asarray(
            get("embeddings.position_embeddings.weight"), dtype),
        "token_type_embeddings": jnp.asarray(
            get("embeddings.token_type_embeddings.weight"), dtype),
        "emb_ln_w": jnp.asarray(get("embeddings.LayerNorm.weight"), dtype),
        "emb_ln_b": jnp.asarray(get("embeddings.LayerNorm.bias"), dtype),
        "layers": layers,
    }


def partition_specs(cfg: BertEmbedConfig, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    shapes = shape_tree(cfg)
    return jax.tree_util.tree_map(
        lambda s: P(*([None] * len(s))), shapes,
        is_leaf=lambda x: isinstance(x, tuple))


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(x.dtype)


def forward(params, cfg: BertEmbedConfig, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False, mm_scatter=None):
    """One bidirectional encoder pass over the ragged batch. Returns
    (hidden [T, D], kv_caches unchanged)."""
    del tri_cfg, tri_flags, lora, kv_quant, moe_fn, mm_scatter
    T = token_ids.shape[0]
    H, Dh, D = cfg.num_attention_heads, cfg.head_dim, cfg.hidden_size
    eps = cfg.layer_norm_eps
    scale = Dh ** -0.5

    pos = jnp.clip(md.positions + cfg.position_offset, 0,
                   cfg.max_position_embeddings - 1)
    x = (params["word_embeddings"][token_ids]
         + params["position_embeddings"][pos]
         + params["token_type_embeddings"][0][None, :])
    x = _ln(x, params["emb_ln_w"], params["emb_ln_b"], eps)

    # Bidirectional visibility: same request AND both rows live.
    qsl = md.query_start_loc
    live = jnp.arange(T, dtype=jnp.int32) < qsl[md.num_reqs]
    same = (md.req_idx[:, None] == md.req_idx[None, :]) & live[None, :]
    bias = jnp.where(same, 0.0, -1e30).astype(jnp.float32)

    def block(x, lp):
        q = (x @ lp["q_w"] + lp["q_b"]).reshape(T, H, Dh)
        k = (x @ lp["k_w"] + lp["k_b"]).reshape(T, H, Dh)
        v = (x @ lp["v_w"] + lp["v_b"]).reshape(T, H, Dh)
        s = jnp.einsum("qhd,khd->hqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p_attn = jax.nn.softmax(s + bias[None], axis=-1).astype(v.dtype)
        a = jnp.einsum("hqk,khd->qhd", p_attn, v).reshape(T, D)
        x = _ln(x + (a @ lp["ao_w"] + lp["ao_b"]), lp["ao_ln_w"],
                lp["ao_ln_b"], eps)
        h = jax.nn.gelu((x @ lp["fc1_w"] + lp["fc1_b"]).astype(
            jnp.float32), approximate=False).astype(x.dtype)
        x = _ln(x + (h @ lp["fc2_w"] + lp["fc2_b"]), lp["out_ln_w"],
                lp["out_ln_b"], eps)
        return x, None

    x, _ = jax.lax.scan(block, x, params["layers"])
    return x, kv_caches


def compute_logits(params, cfg: BertEmbedConfig, hidden):
    # Embedding models never really sample; the engine's fixed-shape
    # sampler still runs, so give it a harmless vocab projection.
    return jnp.dot(hidden, params["word_embeddings"].T,
                   preferred_element_type=jnp.float32)
