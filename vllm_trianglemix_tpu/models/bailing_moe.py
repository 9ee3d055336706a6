"""BailingMoe / Ling (BailingMoeForCausalLM, BailingMoeV2ForCausalLM —
Ant Group's Ling/Ring MoE family).

Reference: vllm/model_executor/models/bailing_moe.py. Structurally the
GLM-4.5-MoE two-stack shape (models/glm4_moe.py: dense prefix +
DeepSeek-style routed experts + shared experts) under Bailing's names
and fused layouts:

- fused ``attention.query_key_value`` ([q; k; v] rows, bias from
  ``use_qkv_bias | use_bias``) and ``attention.dense``
  (bailing_moe.py:92-116);
- fused ``mlp.gate_up_proj`` on dense layers AND on the shared experts
  (``mlp.shared_experts.gate_up_proj``, :182-200,287-297);
- embeddings at ``model.word_embeddings``;
- router ``mlp.gate.weight`` with scoring from ``score_function``
  (softmax, no bias — V1; sigmoid + ``mlp.gate.expert_bias``
  correction — V2, :226-266), optional grouped top-k
  (n_group/topk_group), routed_scaling_factor, norm_topk_prob;
- optional partial rotary (``partial_rotary_factor`` / ``rotary_dim``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, replace
from typing import Any

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import glm4_moe as _gm
from vllm_trianglemix_tpu.models.glm4_moe import (  # noqa: F401
    SUPPORTS_FUSED_DECODE,
    Glm4MoeConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class BailingMoeConfig(Glm4MoeConfig):
    partial_rotary_factor: float = 1.0
    use_o_bias: bool = False
    eos_token_id: int = 126081
    bos_token_id: int = 126080

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "BailingMoeConfig":
        d = dict(cfg)
        d.setdefault("n_routed_experts", d.get("num_experts", 0))
        d.setdefault("partial_rotary_factor", 1.0)
        score = d.get("score_function") or "softmax"
        if d.get("use_bias"):
            raise ValueError("BailingMoe use_bias=True checkpoints "
                             "(biased dense/o/mlp linears) are not "
                             "supported; published Ling models set "
                             "use_bias=false")
        base = super().from_hf_config(d)
        shared_width = (d.get("moe_shared_expert_intermediate_size")
                        or d.get("moe_intermediate_size", 0)) \
            * d.get("num_shared_experts", 0)
        n_group = d.get("n_group") or 1
        return replace(
            base,
            scoring_func=score,
            # V2 sigmoid routing carries the aux-free correction bias
            # (noaux_tc); V1 softmax routes greedily without one.
            topk_method="noaux_tc" if score == "sigmoid" else "greedy",
            has_gate_bias=score == "sigmoid",
            n_group=n_group,
            topk_group=d.get("topk_group") or 1,
            use_qkv_bias=bool(d.get("use_qkv_bias", False)),
            shared_expert_intermediate_size=shared_width,
            norm_topk_prob=d.get("norm_topk_prob", True),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            rope_theta=d.get("rope_theta", 600_000.0),
            first_k_dense_replace=d.get("first_k_dense_replace", 0),
            eos_token_id=d.get("eos_token_id") or 126081,
            bos_token_id=d.get("bos_token_id") or 126080,
        )


_QKV_RX = re.compile(
    r"model\.layers\.(\d+)\.self_attn\.([qkv])_proj\.(weight|bias)")
_GU_RX = re.compile(
    r"model\.layers\.(\d+)\.mlp\.(shared_experts\.)?"
    r"(gate|up)_proj\.(weight|bias)")


def _shim(cfg: BailingMoeConfig, get_tensor):
    nq = cfg.num_attention_heads * cfg.head_dim
    nk = cfg.num_key_value_heads * cfg.head_dim
    starts = {"q": 0, "k": nq, "v": nq + nk}
    sizes = {"q": nq, "k": nk, "v": nk}

    def shim(name: str):
        m = _QKV_RX.fullmatch(name)
        if m:
            i, which, leaf = m.group(1), m.group(2), m.group(3)
            fused = np.asarray(get_tensor(
                f"model.layers.{i}.attention.query_key_value.{leaf}"))
            return fused[starts[which]:starts[which] + sizes[which]]
        m = _GU_RX.fullmatch(name)
        if m:
            i, shared, which, leaf = m.groups()
            width = (cfg.shared_expert_intermediate_size if shared
                     else cfg.intermediate_size)
            fused = np.asarray(get_tensor(
                f"model.layers.{i}.mlp.{shared or ''}gate_up_proj"
                f".{leaf}"))
            return (fused[:width] if which == "gate"
                    else fused[width:])
        name = name.replace("model.embed_tokens.",
                            "model.word_embeddings.")
        m2 = re.fullmatch(r"model\.layers\.(\d+)\.(.+)", name)
        if m2:
            rest = (m2.group(2)
                    .replace("self_attn.o_proj.", "attention.dense.")
                    .replace("mlp.shared_experts.down_proj.",
                             "mlp.shared_experts.down_proj."))
            return get_tensor(f"model.layers.{m2.group(1)}.{rest}")
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: BailingMoeConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized BailingMoe checkpoints are not "
                         "supported")
    return _gm.params_from_hf_state_dict(
        cfg, _shim(cfg, get_tensor), dtype=dtype,
        gate_bias_fmt="model.layers.{i}.mlp.gate.expert_bias")
