"""Phi-3 / Phi-3.5 dense: Llama-shaped with fused checkpoint weights.

Reference: vllm/model_executor/models/phi3.py (a llama.py alias — the
architecture IS llama with fused qkv_proj / gate_up_proj tensors and
untied lm_head). The compute path is the shared decoder; only the
checkpoint ingest differs: ``self_attn.qkv_proj.weight`` splits into
q/k/v rows and ``mlp.gate_up_proj.weight`` into gate/up halves.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import decoder
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class Phi3Config(DecoderConfig):
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 32000
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg) -> "Phi3Config":
        rs = cfg.get("rope_scaling") or {}
        if rs.get("rope_type", rs.get("type")) in ("longrope", "su"):
            raise ValueError("Phi-3 longrope scaling is not supported yet")
        return super().from_hf_config(cfg)


_QKV_RX = re.compile(
    r"model\.layers\.(\d+)\.self_attn\.([qkv])_proj\.weight")
_GU_RX = re.compile(r"model\.layers\.(\d+)\.mlp\.(gate|up)_proj\.weight")


def _split_shim(cfg: Phi3Config, get_tensor):
    """get_tensor wrapper mapping the decoder's unfused names onto the
    checkpoint's fused qkv_proj / gate_up_proj tensors."""
    q_rows = cfg.num_attention_heads * cfg.head_dim
    kv_rows = cfg.num_key_value_heads * cfg.head_dim
    inter = cfg.intermediate_size

    def shim(name: str) -> np.ndarray:
        m = _QKV_RX.fullmatch(name)
        if m:
            fused = np.asarray(get_tensor(
                f"model.layers.{m.group(1)}.self_attn.qkv_proj.weight"))
            which = m.group(2)
            if which == "q":
                return fused[:q_rows]
            if which == "k":
                return fused[q_rows:q_rows + kv_rows]
            return fused[q_rows + kv_rows:q_rows + 2 * kv_rows]
        m = _GU_RX.fullmatch(name)
        if m:
            fused = np.asarray(get_tensor(
                f"model.layers.{m.group(1)}.mlp.gate_up_proj.weight"))
            return fused[:inter] if m.group(2) == "gate" else fused[inter:]
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: Phi3Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized Phi-3 checkpoints (fused layouts) "
                         "are not supported yet")
    return decoder.params_from_hf_state_dict(
        cfg, _split_shim(cfg, get_tensor), dtype=dtype, **kw)
