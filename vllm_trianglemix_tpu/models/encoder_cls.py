"""Encoder-only sequence classifiers: BERT / RoBERTa / XLM-RoBERTa
ForSequenceClassification (cross-encoder rerankers, NLI classifiers).

Reference: vllm/model_executor/models/bert.py
BertForSequenceClassification + roberta.py
RobertaForSequenceClassification (ClassifierPooler). The bidirectional
encoder backbone (models/bert_embed.py) plus a CLS-token head:

- BERT: ``bert.pooler.dense`` -> tanh -> ``classifier`` (both biased);
- RoBERTa: ``classifier.dense`` -> tanh -> ``classifier.out_proj``
  (RobertaClassificationHead — no pooler module).

Both are the same dense->tanh->linear shape, exposed as the runner's
``score_mlp`` host-side classify head over CLS pooling.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import bert_embed as _base
from vllm_trianglemix_tpu.models.bert_embed import (  # noqa: F401
    IS_ENCODER_ONLY,
    BertEmbedConfig,
    forward,
    kv_cache_layer_shape,
    kv_cache_spec,
)

DEFAULT_POOLING_TYPE = "cls"


def compute_logits(params, cfg, hidden):
    return _base.compute_logits(params, cfg, hidden)


@dataclass(frozen=True)
class EncoderClsConfig(BertEmbedConfig):
    num_labels: int = 2
    # "bert" (pooler.dense + classifier) or "roberta"
    # (classifier.dense + classifier.out_proj)
    head_style: str = "bert"

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "EncoderClsConfig":
        base = BertEmbedConfig.from_hf_config.__func__(cls, cfg)
        archs = cfg.get("architectures") or []
        roberta = (any("Roberta" in a for a in archs)
                   or cfg.get("model_type") in ("roberta", "xlm-roberta"))
        object.__setattr__(base, "num_labels",
                           int(cfg.get("num_labels", 2)))
        object.__setattr__(base, "head_style",
                           "roberta" if roberta else "bert")
        return base


def shape_tree(cfg: EncoderClsConfig) -> dict:
    tree = _base.shape_tree(cfg)
    D = cfg.hidden_size
    tree["score_mlp"] = {"w1": (D, D), "b1": (D,),
                         "w2": (D, cfg.num_labels),
                         "b2": (cfg.num_labels,)}
    return tree


def init_random(cfg: EncoderClsConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    import jax

    params = _base.init_random(cfg, seed, dtype)
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), 4)
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


def partition_specs(cfg: EncoderClsConfig, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    specs = _base.partition_specs(cfg, quantized=quantized)
    specs["score_mlp"] = {"w1": P(None, None), "b1": P(None),
                          "w2": P(None, None), "b2": P(None)}
    return specs


def params_from_hf_state_dict(cfg: EncoderClsConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    params = _base.params_from_hf_state_dict(cfg, get_tensor, dtype=dtype,
                                             quant=quant)
    if cfg.head_style == "roberta":
        w1, b1 = "classifier.dense", "classifier.dense"
        w2, b2 = "classifier.out_proj", "classifier.out_proj"
    else:
        w1 = b1 = "bert.pooler.dense"
        w2 = b2 = "classifier"
    params["score_mlp"] = {
        "w1": jnp.asarray(np.asarray(get_tensor(w1 + ".weight")).T,
                          dtype=dtype),
        "b1": jnp.asarray(np.asarray(get_tensor(b1 + ".bias")),
                          dtype=dtype),
        "w2": jnp.asarray(np.asarray(get_tensor(w2 + ".weight")).T,
                          dtype=dtype),
        "b2": jnp.asarray(np.asarray(get_tensor(b2 + ".bias")),
                          dtype=dtype),
    }
    return params
