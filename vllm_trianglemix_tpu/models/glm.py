"""GLM-4 (glm-4-9b-chat HF-format): interleaved partial rotary + fused
gate_up checkpoints.

Reference: vllm/model_executor/models/glm.py + HF
transformers/models/glm/modeling_glm.py — Llama-shaped RMSNorm decoder
with qkv bias (no o bias), rotary over HALF of head_dim applied
GPT-J-interleaved (rotate-every-two), and a fused ``mlp.gate_up_proj``
checkpoint tensor split like Phi-3's.
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
class GlmConfig(DecoderConfig):
    partial_rotary_factor: float = 0.5
    rope_interleaved: bool = True
    use_qkv_bias: bool = True
    tie_word_embeddings: bool = False
    rope_theta: float = 10_000.0
    eos_token_id: int = 151329
    bos_token_id: int = 151329

    @classmethod
    def from_hf_config(cls, cfg) -> "GlmConfig":
        d = dict(cfg)
        heads = d["num_attention_heads"]
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=d.get("num_key_value_heads") or heads,
            head_dim=d.get("head_dim") or d["hidden_size"] // heads,
            rms_norm_eps=d.get("rms_norm_eps", 0.00000015625),
            rope_theta=d.get("rope_theta", 10_000.0),
            partial_rotary_factor=d.get("partial_rotary_factor", 0.5),
            use_qkv_bias=bool(d.get("attention_bias", True)),
            max_position_embeddings=d.get("max_position_embeddings",
                                          131072),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            eos_token_id=d.get("eos_token_id", 151329),
            bos_token_id=d.get("bos_token_id", 151329),
        )


_GU_RX = re.compile(r"model\.layers\.(\d+)\.mlp\.(gate|up)_proj\.weight")


def _shim(cfg: GlmConfig, get_tensor):
    inter = cfg.intermediate_size

    def shim(name: str):
        m = _GU_RX.fullmatch(name)
        if m:
            fused = np.asarray(get_tensor(
                f"model.layers.{m.group(1)}.mlp.gate_up_proj.weight"))
            return fused[:inter] if m.group(2) == "gate" else fused[inter:]
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: GlmConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized GLM checkpoints (fused gate_up "
                         "layouts) are not supported yet")
    return decoder.params_from_hf_state_dict(
        cfg, _shim(cfg, get_tensor), dtype=dtype, **kw)
