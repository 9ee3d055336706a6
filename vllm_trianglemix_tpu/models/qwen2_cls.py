"""Qwen2 sequence-classification head (cross-encoder / reward models).

Reference: vllm/model_executor/models/qwen2.py
Qwen2ForSequenceClassification + layers/pooler.py classify pooling —
the decoder backbone plus a ``score`` linear [D, num_labels] applied to
the LAST token's hidden state, softmaxed by the pooler. Serves
`/classify`-style requests and score/rerank with a real cross-encoder
head instead of embedding cosine similarity.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import qwen2 as _base
from vllm_trianglemix_tpu.models.decoder import DecoderConfig

# backbone re-exports (registry protocol)
forward = _base.forward
compute_logits = _base.compute_logits
kv_cache_spec = _base.kv_cache_spec


@dataclass(frozen=True)
class Qwen2ClsConfig(DecoderConfig):
    use_qk_norm: bool = False
    use_qkv_bias: bool = True
    rope_theta: float = 1_000_000.0
    num_labels: int = 2
    # classification checkpoints carry no lm_head; tie so compute_logits
    # (unused for pooling requests) resolves against the embedding.
    tie_word_embeddings: bool = True

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Qwen2ClsConfig":
        base = DecoderConfig.from_hf_config.__func__(cls, cfg)
        object.__setattr__(base, "num_labels",
                           int(cfg.get("num_labels", 2)))
        object.__setattr__(base, "tie_word_embeddings", True)
        return base


def shape_tree(cfg: Qwen2ClsConfig) -> dict:
    tree = _base.shape_tree(cfg)
    tree["score"] = (cfg.hidden_size, cfg.num_labels)
    return tree


def init_random(cfg: Qwen2ClsConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    import jax

    params = _base.init_random(cfg, seed, dtype)
    params["score"] = (jax.random.normal(
        jax.random.PRNGKey(seed + 1),
        (cfg.hidden_size, cfg.num_labels), jnp.float32) * 0.02).astype(
            dtype)
    return params


def params_from_hf_state_dict(cfg: Qwen2ClsConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    params = _base.params_from_hf_state_dict(cfg, get_tensor, dtype=dtype,
                                             quant=quant)
    params["score"] = jnp.asarray(
        np.asarray(get_tensor("score.weight")).T, dtype=dtype)
    return params


def partition_specs(cfg: Qwen2ClsConfig, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    specs = _base.partition_specs(cfg, quantized=quantized)
    specs["score"] = P(None, None)
    return specs
