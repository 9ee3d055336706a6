"""InternLM2 reward model (InternLM2ForRewardModel).

Reference: vllm/model_executor/models/internlm2.py
InternLM2ForRewardModel — the InternLM2 backbone (fused-wqkv name shim)
plus a bias-less ``v_head`` [1, D] value head on the last token's hidden
state; the classify task returns the RAW reward (num_labels == 1).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import internlm2 as _base
from vllm_trianglemix_tpu.models.internlm2 import InternLM2Config

forward = _base.forward
compute_logits = _base.compute_logits
kv_cache_spec = _base.kv_cache_spec

DEFAULT_POOLING_TYPE = "last"


@dataclass(frozen=True)
class InternLM2RewardConfig(InternLM2Config):
    num_labels: int = 1
    # reward checkpoints carry no output head; tie so compute_logits
    # (unused for pooling requests) resolves against the embedding
    tie_word_embeddings: bool = True

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "InternLM2RewardConfig":
        base = super().from_hf_config(dict(cfg))
        object.__setattr__(base, "tie_word_embeddings", True)
        return base


def shape_tree(cfg: InternLM2RewardConfig) -> dict:
    tree = _base.shape_tree(cfg)
    tree["score"] = (cfg.hidden_size, 1)
    return tree


def init_random(cfg: InternLM2RewardConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    import jax

    params = _base.init_random(cfg, seed, dtype)
    params["score"] = (jax.random.normal(
        jax.random.PRNGKey(seed + 1), (cfg.hidden_size, 1),
        jnp.float32) * 0.02).astype(dtype)
    return params


def partition_specs(cfg: InternLM2RewardConfig, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    specs = _base.partition_specs(cfg, quantized=quantized)
    specs["score"] = P(None, None)
    return specs


def params_from_hf_state_dict(cfg: InternLM2RewardConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    params = _base.params_from_hf_state_dict(cfg, get_tensor, dtype=dtype,
                                             quant=quant)
    params["score"] = jnp.asarray(
        np.asarray(get_tensor("v_head.weight")).T, dtype=dtype)
    return params
