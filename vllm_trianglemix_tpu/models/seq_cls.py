"""Sequence-classification heads over more backbones (cross-encoders /
reward models): Qwen3 and Llama variants of the Qwen2 pattern.

Reference: vllm/model_executor/models/ *ForSequenceClassification
adapters (as_seq_cls_model) + layers/pooler.py classify pooling — the
decoder backbone plus a ``score`` linear [D, num_labels] on the last
token's hidden state (see models/qwen2_cls.py for the serving path).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import decoder as _base
from vllm_trianglemix_tpu.models.decoder import DecoderConfig

forward = _base.forward
compute_logits = _base.compute_logits
kv_cache_spec = _base.kv_cache_spec


class _ClsMixin:
    @classmethod
    def from_hf_config(cls, cfg: dict):
        base = DecoderConfig.from_hf_config.__func__(cls, cfg)
        object.__setattr__(base, "num_labels",
                           int(cfg.get("num_labels", 2)))
        # classification checkpoints carry no lm_head; tie so
        # compute_logits (unused for pooling requests) resolves
        object.__setattr__(base, "tie_word_embeddings", True)
        return base


@dataclass(frozen=True)
class Qwen3ClsConfig(_ClsMixin, DecoderConfig):
    use_qk_norm: bool = True
    rope_theta: float = 1_000_000.0
    num_labels: int = 2
    tie_word_embeddings: bool = True


@dataclass(frozen=True)
class LlamaClsConfig(_ClsMixin, DecoderConfig):
    rope_theta: float = 10_000.0
    num_labels: int = 2
    tie_word_embeddings: bool = True
    eos_token_id: int = 2
    bos_token_id: int = 1


def shape_tree(cfg) -> dict:
    tree = _base.shape_tree(cfg)
    tree["score"] = (cfg.hidden_size, cfg.num_labels)
    return tree


def init_random(cfg, seed: int = 0, dtype=jnp.bfloat16) -> dict:
    import jax

    params = _base.init_random(cfg, seed, dtype)
    params["score"] = (jax.random.normal(
        jax.random.PRNGKey(seed + 1),
        (cfg.hidden_size, cfg.num_labels), jnp.float32) * 0.02).astype(
            dtype)
    return params


def params_from_hf_state_dict(cfg, get_tensor, dtype=jnp.bfloat16,
                              quant=None) -> dict:
    params = _base.params_from_hf_state_dict(cfg, get_tensor, dtype=dtype,
                                             quant=quant)
    params["score"] = jnp.asarray(
        np.asarray(get_tensor("score.weight")).T, dtype=dtype)
    return params


def partition_specs(cfg, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    specs = _base.partition_specs(cfg, quantized=quantized)
    specs["score"] = P(None, None)
    return specs
