"""BLOOM (BloomForCausalLM): ALiBi, embedding LayerNorm, per-head fused
query_key_value.

Reference: vllm/model_executor/models/bloom.py + HF
transformers/models/bloom/modeling_bloom.py. Structure over the shared
decoder:

- ALiBi score biases with the Press-et-al closest-power-of-two slopes
  (reference bloom.py:52-74) — XLA attention path, no rope;
- ``word_embeddings_layernorm`` applied to the token embedding (the
  decoder's ``embedding_layernorm`` knob);
- fused ``self_attention.query_key_value`` whose OUTPUT rows interleave
  per head as [q_h, k_h, v_h] triples of head_dim (HF BloomAttention
  reshapes to (..., n_heads, 3, head_dim) — unlike MPT's flat concat);
- LayerNorms and every linear carry biases; non-gated
  dense_h_to_4h -> tanh-approx GELU -> dense_4h_to_h MLP.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import decoder as _dec
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    alibi_slopes_closest_pow2,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class BloomConfig(DecoderConfig):
    use_rope: bool = False
    norm_type: str = "layernorm"
    gated_mlp: bool = False
    hidden_act: str = "gelu_tanh"
    use_qkv_bias: bool = True
    use_o_bias: bool = True
    use_mlp_bias: bool = True
    embedding_layernorm: bool = True
    tie_word_embeddings: bool = True
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "BloomConfig":
        d = cfg["hidden_size"]
        n = cfg.get("n_head") or cfg["num_attention_heads"]
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=d,
            intermediate_size=4 * d,
            num_hidden_layers=cfg.get("n_layer")
            or cfg["num_hidden_layers"],
            num_attention_heads=n,
            num_key_value_heads=n,
            head_dim=d // n,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            2048),
            alibi_slopes=alibi_slopes_closest_pow2(n),
            eos_token_id=cfg.get("eos_token_id", 2),
            bos_token_id=cfg.get("bos_token_id", 1),
        )


def _shim(cfg: BloomConfig, get_tensor):
    n, hd = cfg.num_attention_heads, cfg.head_dim

    def split_qkv(w, which: int):
        # fused rows -> (n_heads, 3, head_dim, ...) -> one of q/k/v
        w = np.asarray(w)
        return w.reshape((n, 3, hd) + w.shape[1:])[:, which].reshape(
            (n * hd,) + w.shape[1:])

    def shim(name: str):
        name = (name
                .replace("model.embed_tokens.weight",
                         "transformer.word_embeddings.weight")
                .replace("model.embed_layernorm.",
                         "transformer.word_embeddings_layernorm.")
                .replace("model.norm.", "transformer.ln_f."))
        if name.startswith("model.layers."):
            _, _, i, rest = name.split(".", 3)
            h = f"transformer.h.{i}"
            for j, key in enumerate(("self_attn.q_proj", "self_attn.k_proj",
                                     "self_attn.v_proj")):
                if rest.startswith(key + "."):
                    return split_qkv(get_tensor(
                        f"{h}.self_attention.query_key_value."
                        f"{rest[len(key) + 1:]}"), j)
            for key, hf in (("self_attn.o_proj", "self_attention.dense"),
                            ("mlp.up_proj", "mlp.dense_h_to_4h"),
                            ("mlp.down_proj", "mlp.dense_4h_to_h")):
                if rest.startswith(key + "."):
                    return get_tensor(f"{h}.{hf}.{rest[len(key) + 1:]}")
            return get_tensor(f"{h}.{rest}")
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: BloomConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized BLOOM checkpoints (fused "
                         "query_key_value layouts) are not supported yet")
    return _dec.params_from_hf_state_dict(cfg, _shim(cfg, get_tensor),
                                          dtype=dtype)
