"""fairseq2-trained Llama (Fairseq2LlamaForCausalLM), e.g. the
Llama-Guard releases exported from fairseq2.

Reference: vllm/model_executor/models/fairseq2_llama.py. A llama model
whose checkpoint differs in two ways:

- fairseq2 names: ``decoder_frontend.embed`` / ``decoder.layers.{i}``
  with ``self_attn_layer_norm`` / ``ffn.{gate,inner,output}_proj`` /
  ``self_attn.output_proj`` / ``decoder.layer_norm`` / ``final_proj``
  (fairseq2_llama.py:57-73);
- q/k projections stored in the INTERLEAVED (real) rope layout —
  re-permuted per head from (hd//2, 2) pairs to the [evens; odds]
  rotate-half layout llama serving expects (fairseq2_llama.py:106-129).

The torch-pickle container format ({"model_key": name, name: sd} in
``model.pt``) is handled by weights.SafetensorsReader's .pt fallback.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import decoder as _dec
from vllm_trianglemix_tpu.models.llama import (  # noqa: F401 (re-export)
    LlamaConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class Fairseq2LlamaConfig(LlamaConfig):
    pass


def _permute(w: np.ndarray, n_heads: int, head_dim: int) -> np.ndarray:
    """Interleaved (real) rope rows -> rotate-half rows, per head."""
    out = w.shape[-1]
    return w.reshape(n_heads, head_dim // 2, 2, out).transpose(
        0, 2, 1, 3).reshape(n_heads * head_dim, out)


_LAYER_RX = re.compile(r"model\.layers\.(\d+)\.(.+)")


def _shim(cfg: Fairseq2LlamaConfig, get_tensor):

    def shim(name: str):
        permute_heads = 0
        if ".self_attn.q_proj." in name:
            permute_heads = cfg.num_attention_heads
        elif ".self_attn.k_proj." in name:
            permute_heads = cfg.num_key_value_heads
        name = (name
                .replace("model.embed_tokens.", "decoder_frontend.embed.")
                .replace("model.norm.", "decoder.layer_norm.")
                .replace("lm_head.", "final_proj."))
        m = _LAYER_RX.fullmatch(name)
        if m:
            rest = (m.group(2)
                    .replace("input_layernorm.", "self_attn_layer_norm.")
                    .replace("post_attention_layernorm.",
                             "ffn_layer_norm.")
                    .replace("self_attn.o_proj.", "self_attn.output_proj.")
                    .replace("mlp.gate_proj.", "ffn.gate_proj.")
                    .replace("mlp.up_proj.", "ffn.inner_proj.")
                    .replace("mlp.down_proj.", "ffn.output_proj."))
            name = f"decoder.layers.{m.group(1)}.{rest}"
        w = np.asarray(get_tensor(name))
        if permute_heads:
            w = _permute(w, permute_heads, cfg.head_dim)
        return w

    return shim


def params_from_hf_state_dict(cfg: Fairseq2LlamaConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized fairseq2 checkpoints are not "
                         "supported")
    return _dec.params_from_hf_state_dict(cfg, _shim(cfg, get_tensor),
                                          dtype=dtype)
