"""GPT-2 sequence classification (GPT2ForSequenceClassification).

Reference: vllm/model_executor/models/gpt2.py as_seq_cls_model row
(registry.py) + HF GPT2ForSequenceClassification — the GPT-2 backbone
plus a bias-less ``score`` linear [num_labels, D] on the LAST token's
hidden state (HF pools at the last non-pad position; one sequence per
request here, so last-token pooling matches).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import gpt2 as _base
from vllm_trianglemix_tpu.models.gpt2 import Gpt2Config

forward = _base.forward
compute_logits = _base.compute_logits
kv_cache_spec = _base.kv_cache_spec

DEFAULT_POOLING_TYPE = "last"


@dataclass(frozen=True)
class Gpt2ClsConfig(Gpt2Config):
    num_labels: int = 2

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Gpt2ClsConfig":
        base = Gpt2Config.from_hf_config.__func__(cls, cfg)
        object.__setattr__(base, "num_labels",
                           int(cfg.get("num_labels", 2)))
        return base


def shape_tree(cfg: Gpt2ClsConfig) -> dict:
    tree = _base.shape_tree(cfg)
    tree["score"] = (cfg.hidden_size, cfg.num_labels)
    return tree


def init_random(cfg: Gpt2ClsConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    import jax

    params = _base.init_random(cfg, seed, dtype)
    params["score"] = (jax.random.normal(
        jax.random.PRNGKey(seed + 1),
        (cfg.hidden_size, cfg.num_labels), jnp.float32) * 0.02).astype(
            dtype)
    return params


def partition_specs(cfg: Gpt2ClsConfig, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    specs = _base.partition_specs(cfg, quantized=quantized)
    specs["score"] = P(None, None)
    return specs


def params_from_hf_state_dict(cfg: Gpt2ClsConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    params = _base.params_from_hf_state_dict(cfg, get_tensor, dtype=dtype,
                                             quant=quant)
    params["score"] = jnp.asarray(
        np.asarray(get_tensor("score.weight")).T, dtype=dtype)
    return params
