"""Qwen2 reward models (Qwen2ForRewardModel /
Qwen2ForProcessRewardModel — Qwen2.5-Math-RM/PRM).

Reference: vllm/model_executor/models/qwen2_rm.py — the Qwen2 backbone
plus a two-layer reward head ``score = Linear(D, D) -> ReLU ->
Linear(D, num_labels)`` (checkpoint names ``score.0`` / ``score.2``,
qwen2_rm.py:58-65), exposed as the runner's ``score_mlp`` host head.

- RM (num_labels=1): the classify task returns the RAW reward value of
  the pooled token (no softmax; last-token pooling = the sequence
  reward).
- PRM (num_labels=2): softmaxed P(step correct). The reference's
  step-level pooling at separator tokens is served here one step at a
  time via last-token pooling (pooling_type="last").
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import qwen2 as _base
from vllm_trianglemix_tpu.models.decoder import DecoderConfig

forward = _base.forward
compute_logits = _base.compute_logits
kv_cache_spec = _base.kv_cache_spec

DEFAULT_POOLING_TYPE = "last"


@dataclass(frozen=True)
class Qwen2RewardConfig(DecoderConfig):
    use_qkv_bias: bool = True
    rope_theta: float = 1_000_000.0
    num_labels: int = 1
    score_act: str = "relu"
    tie_word_embeddings: bool = True

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Qwen2RewardConfig":
        base = DecoderConfig.from_hf_config.__func__(cls, cfg)
        object.__setattr__(base, "num_labels",
                           int(cfg.get("num_labels", 1)))
        object.__setattr__(base, "tie_word_embeddings", True)
        return base


@dataclass(frozen=True)
class Qwen2ProcessRewardConfig(Qwen2RewardConfig):
    num_labels: int = 2

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Qwen2ProcessRewardConfig":
        base = super().from_hf_config(cfg)
        object.__setattr__(base, "num_labels",
                           int(cfg.get("num_labels", 2)))
        return base


def shape_tree(cfg: Qwen2RewardConfig) -> dict:
    tree = _base.shape_tree(cfg)
    D = cfg.hidden_size
    tree["score_mlp"] = {"w1": (D, D), "b1": (D,),
                         "w2": (D, cfg.num_labels),
                         "b2": (cfg.num_labels,)}
    return tree


def init_random(cfg: Qwen2RewardConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    import jax

    params = _base.init_random(cfg, seed, dtype)
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), 2)
    D = cfg.hidden_size
    params["score_mlp"] = {
        "w1": (jax.random.normal(keys[0], (D, D), jnp.float32)
               * 0.02).astype(dtype),
        "b1": jnp.zeros((D,), dtype),
        "w2": (jax.random.normal(keys[1], (D, cfg.num_labels),
                                 jnp.float32) * 0.02).astype(dtype),
        "b2": jnp.zeros((cfg.num_labels,), dtype),
    }
    return params


def partition_specs(cfg: Qwen2RewardConfig, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    specs = _base.partition_specs(cfg, quantized=quantized)
    specs["score_mlp"] = {"w1": P(None, None), "b1": P(None),
                          "w2": P(None, None), "b2": P(None)}
    return specs


def params_from_hf_state_dict(cfg: Qwen2RewardConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    params = _base.params_from_hf_state_dict(cfg, get_tensor, dtype=dtype,
                                             quant=quant)

    def get(name, fallback_shape=None):
        try:
            return np.asarray(get_tensor(name))
        except KeyError:
            if fallback_shape is None:
                raise
            return np.zeros(fallback_shape, np.float32)

    D = cfg.hidden_size
    params["score_mlp"] = {
        "w1": jnp.asarray(get("score.0.weight").T, dtype=dtype),
        "b1": jnp.asarray(get("score.0.bias", (D,)), dtype=dtype),
        "w2": jnp.asarray(get("score.2.weight").T, dtype=dtype),
        "b2": jnp.asarray(get("score.2.bias", (cfg.num_labels,)),
                          dtype=dtype),
    }
    return params
