"""Generic Llama-family decoder in functional JAX.

One implementation serves Llama / Qwen2(2.5) / Qwen3 — the reference keeps
three near-identical model files (vllm/model_executor/models/{llama,qwen2,
qwen3}.py, where Qwen3 subclasses Qwen2 layers with per-head q/k RMSNorm,
qwen3.py:61-130, and Qwen2 is Llama plus QKV biases). Here the differences
are two config flags:

- ``use_qk_norm``  — per-head RMSNorm on q/k over head_dim (Qwen3)
- ``use_qkv_bias`` — bias on q/k/v projections (Qwen2/2.5)

TPU-first design (NOT from the reference):
- all per-layer weights are stacked on a leading layer axis; the decoder
  runs as one ``lax.scan`` — one compiled layer body regardless of depth;
- the paged KV cache [L, blocks, page, 2*KH, D] is scanned alongside;
- TriangleMix enablement is a scanned bool vector applied inside the
  attention op (the reference computed masks but never used them,
  models/qwen3.py:176-189).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_trianglemix_tpu.attention.backend import (
    fused_decode_attention,
    ragged_paged_attention,
    write_kv,
)
from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata
from vllm_trianglemix_tpu.config import TriangleMixConfig
from vllm_trianglemix_tpu.layers.common import (
    apply_rope,
    mrope_cos_sin,
    rms_norm,
    rope_cos_sin,
    silu_and_mul,
)
from vllm_trianglemix_tpu.quantization.linear import (
    QuantLinear,
    apply_linear,
)


@dataclass(frozen=True)
class RopeScalingConfig:
    """Static rope-scaling parameters (HF config.json `rope_scaling`).

    Hashable so DecoderConfig stays a valid static jit argument. Covers
    the reference's rotary_embedding/ variants that apply on TPU: llama3,
    yarn, dynamic NTK, linear (vllm/model_executor/layers/rotary_embedding/).
    """
    rope_type: str = "default"
    factor: float = 1.0
    original_max_position_embeddings: int = 0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    attention_factor: float | None = None
    # yarn only: floor/ceil the correction range bounds (HF
    # modeling_rope_utils find_correction_range; GPT-OSS sets False).
    truncate: bool = True
    # dynamic-NTK only: the length the static table is evaluated at
    # (the engine's max_model_len; 0 = config max_position_embeddings).
    eval_len: int = 0

    @classmethod
    def from_hf(cls, rs: dict[str, Any] | None) -> "RopeScalingConfig | None":
        if not rs:
            return None
        rt = rs.get("rope_type", rs.get("type", "default"))
        if rt in ("default", "mrope"):
            return None
        return cls(
            rope_type=rt,
            factor=float(rs.get("factor", 1.0)),
            original_max_position_embeddings=int(
                rs.get("original_max_position_embeddings", 0)),
            low_freq_factor=float(rs.get("low_freq_factor", 1.0)),
            high_freq_factor=float(rs.get("high_freq_factor", 4.0)),
            beta_fast=float(rs.get("beta_fast", 32.0)),
            beta_slow=float(rs.get("beta_slow", 1.0)),
            attention_factor=rs.get("attention_factor"),
            truncate=bool(rs.get("truncate", True)),
        )


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 151936
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    rope_scaling: RopeScalingConfig | None = None
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 40960
    eos_token_id: int = 151645
    bos_token_id: int = 151643
    # family switches
    use_qk_norm: bool = False
    use_qkv_bias: bool = False
    # Sliding-window attention (Mistral): every token attends to at most
    # the last `sliding_window` positions. 0 = full attention. Unlike the
    # reference (which ignores the fork's mask AND bounds context by
    # max_model_len for Mistral), this is enforced inside the attention
    # kernels, and the scheduler reclaims out-of-window KV blocks
    # (core/single_type_kv_cache_manager.py:SlidingWindowManager).
    sliding_window: int = 0
    # Chunked-local attention (Llama-4 style; reference
    # ChunkedLocalAttentionSpec): token p attends within its aligned
    # chunk [floor(p/C)*C, p]. 0 = off. Mutually exclusive with
    # sliding_window.
    attention_chunk_size: int = 0
    # Mixture-of-experts (Qwen3-MoE): 0 experts = dense MLP
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    norm_topk_prob: bool = True
    # Shared expert alongside the routed ones (Qwen2-MoE): a dense MLP of
    # this width added to the routed output, optionally scaled by a
    # sigmoid gate (reference qwen2_moe.py Qwen2MoeSparseMoeBlock).
    shared_expert_intermediate_size: int = 0
    use_shared_expert_gate: bool = False
    # --- generic family knobs ---------------------------------------------
    # Gated-MLP activation: "silu" (SwiGLU), "gelu_tanh" (GeGLU,
    # gelu_pytorch_tanh), or "gelu" (exact).
    hidden_act: str = "silu"
    # Gemma RMSNorm: weight applied as (1 + w) in fp32 (zeros-init).
    gemma_norm: bool = False
    # Embedding scale (Gemma sqrt(hidden); Granite embedding_multiplier).
    embedding_multiplier: float = 1.0
    # Residual-branch scale (Granite residual_multiplier).
    residual_multiplier: float = 1.0
    # Attention scale override; None = head_dim ** -0.5
    # (Granite attention_multiplier, Gemma query_pre_attn_scalar role).
    attention_multiplier: float | None = None
    # Final-logits divisor (Granite logits_scaling).
    logits_scaling: float = 1.0
    # Norm family: "rmsnorm" or "layernorm" (StarCoder2/GPT-style; adds
    # bias weights to every norm).
    norm_type: str = "rmsnorm"
    # False = non-gated MLP: up_proj -> hidden_act -> down_proj
    # (StarCoder2 c_fc/c_proj).
    gated_mlp: bool = True
    # Bias on the attention OUTPUT projection / the MLP linears.
    use_o_bias: bool = False
    use_mlp_bias: bool = False
    # OLMo-2 post-norm: NO input norm; norms apply to the attention and
    # MLP OUTPUTS before their residual adds (post_feedforward norm).
    postnorm: bool = False
    # OLMo-2 q/k norm over the FLAT projection (HQ*Dh / KH*Dh) instead
    # of per-head head_dim.
    qk_norm_flat: bool = False
    # q/k norm family: "rmsnorm" (Qwen3/OLMo-2) or "layernorm"
    # (Persimmon qk_layernorm: per-head LayerNorm WITH bias before rope).
    qk_norm_type: str = "rmsnorm"
    # Multimodal rotary sections (Qwen2-VL mrope): three frequency-chunk
    # widths summing to head_dim/2; None = standard 1-D rope. Needs
    # AttentionMetadata.mrope_positions [3, T] from the runner.
    mrope_section: "tuple[int, ...] | None" = None
    # --- pre-rope-era / parallel-block family knobs -----------------------
    # False = no rotary at all (GPT-2/OPT: learned absolute positions).
    use_rope: bool = True
    # Learned absolute position embeddings added to the token embedding
    # (GPT-2 wpe, OPT embed_positions). Adds an ``embed_positions``
    # [max_position_embeddings + offset, D] parameter indexed by
    # md.positions + pos_embedding_offset (OPT stores rows 0-1 as pad).
    learned_pos_embeddings: bool = False
    pos_embedding_offset: int = 0
    # Fraction of head_dim that rotates (GPT-NeoX rotary_pct, Phi/GLM/
    # Nemotron partial_rotary_factor); the rest passes through.
    partial_rotary_factor: float = 1.0
    # GPT-J-style interleaved rotary (rotate_every_two: even/odd pairs)
    # instead of the Llama rotate_half layout (Cohere, GLM).
    rope_interleaved: bool = False
    # Parallel attention+MLP block: x + attn(norm(x)) + mlp(norm'(x))
    # (GPT-NeoX use_parallel_residual, Phi, Cohere, Falcon). With
    # ``parallel_block_shared_norm`` the MLP reads the SAME normed input
    # as attention (Phi/Cohere/Falcon-7B — no post_attention_layernorm
    # parameter exists); otherwise a second norm of x feeds the MLP
    # (GPT-NeoX's two-norm variant).
    parallel_block: bool = False
    parallel_block_shared_norm: bool = False
    # LayerNorm families: bias on the norms (Cohere's LayerNorm has no
    # bias; set False). Ignored for rmsnorm.
    norm_bias: bool = True
    # Bias on the lm_head projection (Phi).
    lm_head_bias: bool = False
    # Clamp q/k/v projections to [-clip, clip] (OLMo-1 clip_qkv); 0 = off.
    qkv_clip: float = 0.0
    # ALiBi position biases (MPT/Bloom/falcon-rw/Baichuan-13B): per-head
    # slopes (see alibi_slopes_mpt / alibi_slopes_closest_pow2), set by
    # the family module together with use_rope=False. Attention adds
    # slope * key_pos to the scores — softmax shift-invariance makes that
    # identical to the relative -slope * (q_pos - key_pos) form (HF
    # build_alibi_tensor). ALiBi models serve via the XLA attention path
    # (attention/backend.py dispatch routes on this kwarg).
    alibi_slopes: "tuple[float, ...] | None" = None
    # LayerNorm directly after the token embedding (Bloom
    # word_embeddings_layernorm).
    embedding_layernorm: bool = False
    # Per-layer rope enable (SmolLM3 NoPE: no_rope_layers, 1 = rotate);
    # None = rope on every layer.
    rope_layers: "tuple[int, ...] | None" = None
    # GLM-4 sandwich norms: IN ADDITION to the prenorm pair, norm the
    # attention and MLP branch OUTPUTS before their residual adds
    # (post_self_attn_layernorm / post_mlp_layernorm).
    sandwich_norm: bool = False
    # MoE router math: "softmax_topk" (Qwen/Mixtral: softmax -> top-k ->
    # optional renorm) or "sparsemixer" (Phi-3.5-MoE inference path:
    # iterative top-1 with threshold masking, modeling_phimoe.py).
    moe_routing: str = "softmax_topk"
    router_jitter_noise: float = 0.01  # sparsemixer threshold 2*eps
    # PaliGemma prefix LM: prompt tokens attend bidirectionally over the
    # whole prompt (XLA attention path; requests prefill in one shot).
    prefix_lm: bool = False
    # Attention-logit soft cap s*tanh(x/s) (Grok-1 attn_logit_softcapping
    # 30.0; Gemma-2 carries its own forward). 0 = off.
    attn_soft_cap: float = 0.0
    # Router-logit soft cap before softmax routing (Grok-1:
    # 30 * tanh(logits / 30), grok1.py:109). 0 = off.
    router_logit_softcapping: float = 0.0

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "DecoderConfig":
        head_dim = cfg.get("head_dim") or (
            cfg["hidden_size"] // cfg["num_attention_heads"])
        eos = cfg.get("eos_token_id", 151645)
        if isinstance(eos, list):
            eos = eos[0]
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get("num_key_value_heads",
                                        cfg["num_attention_heads"]),
            head_dim=head_dim,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 1e6),
            rope_scaling=RopeScalingConfig.from_hf(cfg.get("rope_scaling")),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            max_position_embeddings=cfg.get("max_position_embeddings", 40960),
            eos_token_id=eos,
            bos_token_id=cfg.get("bos_token_id", 151643),
            num_experts=cfg.get("num_experts", 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 0),
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
            norm_topk_prob=cfg.get("norm_topk_prob", True),
            # Qwen2-style configs carry sliding_window but gate it off with
            # use_sliding_window=False; Mistral may set it to null.
            sliding_window=(cfg.get("sliding_window") or 0
                            if cfg.get("use_sliding_window", True) else 0),
            attention_chunk_size=cfg.get("attention_chunk_size") or 0,
            # Only honored when the checkpoint states it (llama-family
            # attention_bias / InternLM qkv_bias); absent keys must not
            # clobber subclass defaults (Qwen2's bias-on default).
            **({"use_qkv_bias": bool(cfg.get("attention_bias")
                                     or cfg.get("qkv_bias"))}
               if ("attention_bias" in cfg or "qkv_bias" in cfg) else {}),
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "DecoderConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


# --- parameter tree -----------------------------------------------------------

def shape_tree(cfg: DecoderConfig) -> dict:
    """Shapes of every parameter (stacked layer axis first)."""
    L, D = cfg.num_hidden_layers, cfg.hidden_size
    HQ, KH, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    I, V = cfg.intermediate_size, cfg.vocab_size
    layers = {
        "input_layernorm": (L, D),
        "q_proj": (L, D, HQ * Dh),
        "k_proj": (L, D, KH * Dh),
        "v_proj": (L, D, KH * Dh),
        "o_proj": (L, HQ * Dh, D),
        "post_attention_layernorm": (L, D),
    }
    if cfg.num_experts > 0:
        E, Im = cfg.num_experts, cfg.moe_intermediate_size
        layers["moe_gate"] = (L, D, E)
        layers["gate_proj"] = (L, E, D, Im)
        layers["up_proj"] = (L, E, D, Im)
        layers["down_proj"] = (L, E, Im, D)
        if cfg.shared_expert_intermediate_size > 0:
            Is = cfg.shared_expert_intermediate_size
            layers["shared_gate_proj"] = (L, D, Is)
            layers["shared_up_proj"] = (L, D, Is)
            layers["shared_down_proj"] = (L, Is, D)
            if cfg.use_shared_expert_gate:
                layers["shared_expert_gate"] = (L, D, 1)
    elif cfg.gated_mlp:
        layers["gate_proj"] = (L, D, I)
        layers["up_proj"] = (L, D, I)
        layers["down_proj"] = (L, I, D)
    else:
        # non-gated MLP (StarCoder2 c_fc/c_proj)
        layers["up_proj"] = (L, D, I)
        layers["down_proj"] = (L, I, D)
        if cfg.hidden_act == "xielu":
            # Apertus: per-layer learnable xIELU alpha scalars
            layers["act_alpha_p"] = (L, 1)
            layers["act_alpha_n"] = (L, 1)
    if cfg.use_qk_norm:
        qn = HQ * Dh if cfg.qk_norm_flat else Dh
        kn = KH * Dh if cfg.qk_norm_flat else Dh
        layers["q_norm"] = (L, qn)
        layers["k_norm"] = (L, kn)
        if cfg.qk_norm_type == "layernorm":
            layers["q_norm_bias"] = (L, qn)
            layers["k_norm_bias"] = (L, kn)
    if cfg.use_qkv_bias:
        layers["q_bias"] = (L, HQ * Dh)
        layers["k_bias"] = (L, KH * Dh)
        layers["v_bias"] = (L, KH * Dh)
    if cfg.use_o_bias:
        layers["o_bias"] = (L, D)
    if cfg.use_mlp_bias:
        layers["up_bias"] = (L, I)
        layers["down_bias"] = (L, D)
        if cfg.gated_mlp and cfg.num_experts == 0:
            layers["gate_bias"] = (L, I)
    if cfg.postnorm:
        # OLMo-2: no input norm; an extra post-feedforward norm instead
        del layers["input_layernorm"]
        layers["post_feedforward_layernorm"] = (L, D)
    if cfg.sandwich_norm:
        layers["post_self_attn_layernorm"] = (L, D)
        layers["post_mlp_layernorm"] = (L, D)
    if cfg.parallel_block and cfg.parallel_block_shared_norm:
        # Phi/Cohere: the single input norm feeds both branches
        del layers["post_attention_layernorm"]
    if cfg.norm_type in ("layernorm", "layernorm1p") and cfg.norm_bias:
        for nk in ("input_layernorm", "post_attention_layernorm",
                   "post_feedforward_layernorm"):
            if nk in layers:
                layers[nk + "_bias"] = (L, D)
    tree = {"embed_tokens": (V, D), "layers": layers, "norm": (D,)}
    if cfg.learned_pos_embeddings:
        tree["embed_positions"] = (
            cfg.max_position_embeddings + cfg.pos_embedding_offset, D)
    if cfg.embedding_layernorm:
        tree["embed_layernorm"] = (D,)
        tree["embed_layernorm_bias"] = (D,)
    if cfg.norm_type in ("layernorm", "layernorm1p") and cfg.norm_bias:
        tree["norm_bias"] = (D,)
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = (D, V)
        if cfg.lm_head_bias:
            tree["lm_head_bias"] = (V,)
    return tree


def partition_specs(cfg: DecoderConfig, quantized: str | None = None) -> dict:
    """NamedSharding rules over a ("dp", "tp") mesh — Megatron-style:
    column-parallel QKV/gate/up (output-feature axis over tp), row-parallel
    o/down (input-feature axis), vocab-parallel embedding (semantics of
    reference linear.py:405,1197 / vocab_parallel_embedding.py, expressed
    declaratively for the XLA SPMD partitioner)."""
    layers = {
        "input_layernorm": P(None, None),
        "q_proj": P(None, None, "tp"),
        "k_proj": P(None, None, "tp"),
        "v_proj": P(None, None, "tp"),
        "o_proj": P(None, "tp", None),
        "post_attention_layernorm": P(None, None),
    }
    if cfg.num_experts > 0:
        # experts tensor-sharded on the ffn axis (true expert parallelism
        # = shard the E axis instead; both are one spec change here)
        layers["moe_gate"] = P(None, None, None)
        if cfg.shared_expert_intermediate_size > 0:
            layers["shared_gate_proj"] = P(None, None, "tp")
            layers["shared_up_proj"] = P(None, None, "tp")
            layers["shared_down_proj"] = P(None, "tp", None)
            if cfg.use_shared_expert_gate:
                layers["shared_expert_gate"] = P(None, None, None)
        layers["gate_proj"] = P(None, None, None, "tp")
        layers["up_proj"] = P(None, None, None, "tp")
        layers["down_proj"] = P(None, None, "tp", None)
    elif cfg.gated_mlp:
        layers["gate_proj"] = P(None, None, "tp")
        layers["up_proj"] = P(None, None, "tp")
        layers["down_proj"] = P(None, "tp", None)
    else:
        layers["up_proj"] = P(None, None, "tp")
        layers["down_proj"] = P(None, "tp", None)
        if cfg.hidden_act == "xielu":
            layers["act_alpha_p"] = P(None, None)
            layers["act_alpha_n"] = P(None, None)
    if cfg.use_qk_norm:
        layers["q_norm"] = P(None, None)
        layers["k_norm"] = P(None, None)
        if cfg.qk_norm_type == "layernorm":
            layers["q_norm_bias"] = P(None, None)
            layers["k_norm_bias"] = P(None, None)
    if cfg.use_qkv_bias:
        layers["q_bias"] = P(None, "tp")
        layers["k_bias"] = P(None, "tp")
        layers["v_bias"] = P(None, "tp")
    if cfg.use_o_bias:
        layers["o_bias"] = P(None, None)
    if cfg.use_mlp_bias:
        layers["up_bias"] = P(None, "tp")
        layers["down_bias"] = P(None, None)
        if cfg.gated_mlp and cfg.num_experts == 0:
            layers["gate_bias"] = P(None, "tp")
    if cfg.postnorm:
        del layers["input_layernorm"]
        layers["post_feedforward_layernorm"] = P(None, None)
    if cfg.sandwich_norm:
        layers["post_self_attn_layernorm"] = P(None, None)
        layers["post_mlp_layernorm"] = P(None, None)
    if cfg.parallel_block and cfg.parallel_block_shared_norm:
        del layers["post_attention_layernorm"]
    if cfg.norm_type in ("layernorm", "layernorm1p") and cfg.norm_bias:
        for nk in ("input_layernorm", "post_attention_layernorm",
                   "post_feedforward_layernorm"):
            if nk in layers:
                layers[nk + "_bias"] = P(None, None)
    if quantized:
        # QuantLinear leaves: qweight keeps the dense mat's spec; scale/
        # zero [L, G, Dout] follow the output axis for column-parallel
        # mats. For row-parallel mats the contracted (input) axis is
        # sharded, which for grouped methods means the group axis G; the
        # per-channel methods (G == 1) replicate their tiny scales.
        # W8A8 methods use the ActQuantLinear pytree type (same layout,
        # no zero) so the spec tree matches the param tree structurally.
        from vllm_trianglemix_tpu.quantization.linear import ActQuantLinear

        act_quant = quantized.endswith("_w8a8") or quantized == "w4a8"
        grouped = quantized in ("int4", "awq", "gptq", "w4a8")
        row_sz = P(None, "tp", None) if grouped else P(None, None, None)

        def col_spec():
            if act_quant:
                return ActQuantLinear(qweight=P(None, None, "tp"),
                                      scale=P(None, None, "tp"),
                                      zero=P(None, None, "tp"))
            return QuantLinear(qweight=P(None, None, "tp"),
                               scale=P(None, None, "tp"),
                               zero=P(None, None, "tp"))

        def row_spec():
            if act_quant:
                return ActQuantLinear(qweight=P(None, "tp", None),
                                      scale=row_sz, zero=row_sz)
            return QuantLinear(qweight=P(None, "tp", None),
                               scale=row_sz, zero=row_sz)

        for k in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
            layers[k] = col_spec()
        for k in ("o_proj", "down_proj"):
            layers[k] = row_spec()
    specs = {"embed_tokens": P("tp", None), "layers": layers, "norm": P(None)}
    if cfg.learned_pos_embeddings:
        specs["embed_positions"] = P(None, None)
    if cfg.embedding_layernorm:
        specs["embed_layernorm"] = P(None)
        specs["embed_layernorm_bias"] = P(None)
    if cfg.norm_type in ("layernorm", "layernorm1p") and cfg.norm_bias:
        specs["norm_bias"] = P(None)
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, "tp")
        if cfg.lm_head_bias:
            specs["lm_head_bias"] = P("tp")
    return specs


def init_random(cfg: DecoderConfig, seed: int = 0, dtype=jnp.bfloat16) -> dict:
    """Random init (shapes only matter — accuracy tests load real weights)."""
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))

    def init_one(key, shape):
        # norm weights -> ones; everything else small gaussian
        if len(shape) <= 2 and shape[-1] in (cfg.hidden_size, cfg.head_dim) \
                and shape[0] != cfg.vocab_size:
            return jnp.ones(shape, dtype)
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dtype)

    return jax.tree_util.tree_unflatten(
        treedef, [init_one(k, s) for k, s in zip(keys, leaves)])


def alibi_slopes_mpt(n_heads: int, bias_max: float = 8.0) -> tuple:
    """MPT-style ALiBi slopes (reference mpt.py:36-46 / HF
    build_mpt_alibi_tensor): spread bias_max over the NEXT power of two
    of n_heads, then interleave-slice for non-power-of-two counts."""
    import math

    next_p2 = 2 ** math.ceil(math.log2(n_heads))
    m = np.arange(1, next_p2 + 1, dtype=np.float64) * bias_max / next_p2
    slopes = 1.0 / np.exp2(m)
    if next_p2 != n_heads:
        slopes = np.concatenate([slopes[1::2], slopes[::2]])[:n_heads]
    return tuple(float(s) for s in slopes)


def alibi_slopes_closest_pow2(n_heads: int) -> tuple:
    """Press et al. ALiBi slopes as Bloom/Baichuan-13B build them
    (reference bloom.py:52-74, baichuan.py:57): geometric in the CLOSEST
    (floor) power of two, with interleaved extra slopes for the rest."""
    import math

    closest_p2 = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest_p2) - 3)))
    slopes = [base ** i for i in range(1, closest_p2 + 1)]
    if closest_p2 != n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest_p2) - 3)))
        slopes += [extra_base ** i
                   for i in range(1, 2 * (n_heads - closest_p2), 2)]
    return tuple(slopes)


_HF_LAYER_MAP = {
    "input_layernorm": "model.layers.{i}.input_layernorm.weight",
    "moe_gate": "model.layers.{i}.mlp.gate.weight",
    "shared_gate_proj": "model.layers.{i}.mlp.shared_expert.gate_proj.weight",
    "shared_up_proj": "model.layers.{i}.mlp.shared_expert.up_proj.weight",
    "shared_down_proj": "model.layers.{i}.mlp.shared_expert.down_proj.weight",
    "shared_expert_gate": "model.layers.{i}.mlp.shared_expert_gate.weight",
    "o_bias": "model.layers.{i}.self_attn.o_proj.bias",
    "up_bias": "model.layers.{i}.mlp.up_proj.bias",
    "down_bias": "model.layers.{i}.mlp.down_proj.bias",
    "input_layernorm_bias": "model.layers.{i}.input_layernorm.bias",
    "post_attention_layernorm_bias":
        "model.layers.{i}.post_attention_layernorm.bias",
    "post_feedforward_layernorm":
        "model.layers.{i}.post_feedforward_layernorm.weight",
    "post_self_attn_layernorm":
        "model.layers.{i}.post_self_attn_layernorm.weight",
    "post_mlp_layernorm": "model.layers.{i}.post_mlp_layernorm.weight",
    "q_proj": "model.layers.{i}.self_attn.q_proj.weight",
    "k_proj": "model.layers.{i}.self_attn.k_proj.weight",
    "v_proj": "model.layers.{i}.self_attn.v_proj.weight",
    "q_norm": "model.layers.{i}.self_attn.q_norm.weight",
    "k_norm": "model.layers.{i}.self_attn.k_norm.weight",
    "q_norm_bias": "model.layers.{i}.self_attn.q_norm.bias",
    "k_norm_bias": "model.layers.{i}.self_attn.k_norm.bias",
    "q_bias": "model.layers.{i}.self_attn.q_proj.bias",
    "k_bias": "model.layers.{i}.self_attn.k_proj.bias",
    "v_bias": "model.layers.{i}.self_attn.v_proj.bias",
    "o_proj": "model.layers.{i}.self_attn.o_proj.weight",
    "post_attention_layernorm":
        "model.layers.{i}.post_attention_layernorm.weight",
    "gate_proj": "model.layers.{i}.mlp.gate_proj.weight",
    "up_proj": "model.layers.{i}.mlp.up_proj.weight",
    "down_proj": "model.layers.{i}.mlp.down_proj.weight",
    "gate_bias": "model.layers.{i}.mlp.gate_proj.bias",
    # Apertus per-layer xIELU activation scalars (shape [1])
    "act_alpha_p": "model.layers.{i}.mlp.act_fn.alpha_p",
    "act_alpha_n": "model.layers.{i}.mlp.act_fn.alpha_n",
}
# HF nn.Linear stores [out_features, in_features]; we store [in, out].
_TRANSPOSED = {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
               "shared_gate_proj", "shared_up_proj", "shared_down_proj",
               "shared_expert_gate",
               "up_proj", "down_proj", "moe_gate"}


def params_from_hf_state_dict(cfg: DecoderConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None,
                              layer_map: dict | None = None,
                              expert_map: dict | None = None) -> dict:
    """Build the stacked param tree from a HF checkpoint.

    ``get_tensor(name) -> np.ndarray`` abstracts safetensors shards vs torch
    state_dicts (see models/weights.py). ``quant`` (from
    quantization.detect_checkpoint_quantization) switches the projection
    matrices to AWQ/GPTQ ingest. ``layer_map`` overrides entries of
    ``_HF_LAYER_MAP`` and ``expert_map`` maps expert keys to name formats
    with ``{i}``/``{e}`` holes, for families with non-Qwen naming
    (e.g. Mixtral's ``block_sparse_moe.experts.{e}.w1``).
    """
    from vllm_trianglemix_tpu.quantization.ingest import (
        load_awq_linear,
        load_gptq_linear,
    )
    from vllm_trianglemix_tpu.quantization.linear import (
        QUANTIZED_KEYS,
        QuantLinear,
    )

    L = cfg.num_hidden_layers
    name_map = dict(_HF_LAYER_MAP)
    if layer_map:
        name_map.update(layer_map)

    # Bare-backbone dumps (reference registry.py "Qwen2Model" /
    # "LlamaModel" / "Gemma2Model" embedder rows): names lack the
    # "model." prefix and there is no lm_head — fall back to the
    # stripped name, and resolve a missing lm_head against the
    # embedding (tied-weights semantics).
    inner_get = get_tensor

    def get_tensor(name):  # noqa: F811 (deliberate shadow)
        try:
            return inner_get(name)
        except KeyError:
            if name.startswith("model."):
                return inner_get(name[len("model."):])
            if name == "lm_head.weight":
                return np.asarray(
                    get_tensor("model.embed_tokens.weight"))
            raise

    def stack(key: str) -> jnp.ndarray:
        mats = []
        for i in range(L):
            w = np.asarray(get_tensor(name_map[key].format(i=i)))
            if key in _TRANSPOSED:
                w = w.T
            mats.append(w)
        return jnp.asarray(np.stack(mats), dtype=dtype)

    def stack_experts(key: str) -> jnp.ndarray:
        # [L, E, Din, Dout] from per-expert HF linears
        fmt = (expert_map or {}).get(
            key, f"model.layers.{{i}}.mlp.experts.{{e}}.{key}.weight")
        mats = []
        for i in range(L):
            per_e = []
            for e in range(cfg.num_experts):
                per_e.append(np.asarray(get_tensor(
                    fmt.format(i=i, e=e))).T)
            mats.append(np.stack(per_e))
        return jnp.asarray(np.stack(mats), dtype=dtype)

    def stack_quant(key: str):
        prefix = name_map[key].rsplit(".", 1)[0]  # drop ".weight"
        if quant["method"].endswith("_w8a8"):
            from vllm_trianglemix_tpu.quantization.ingest import (
                load_w8a8_linear,
            )
            from vllm_trianglemix_tpu.quantization.linear import (
                ActQuantLinear,
            )

            qs, ss = [], []
            for i in range(L):
                q, s = load_w8a8_linear(get_tensor, prefix.format(i=i))
                qs.append(q)
                ss.append(s)
            qw = jnp.asarray(np.stack(qs))
            if quant["method"] == "fp8_w8a8" \
                    and qw.dtype != jnp.float8_e4m3fn:
                qw = qw.view(jnp.float8_e4m3fn) \
                    if qw.dtype == jnp.uint8 else qw
            return ActQuantLinear(
                qweight=qw,
                scale=jnp.asarray(np.stack(ss), jnp.float32),
            )
        loader = (load_awq_linear if quant["method"] == "awq"
                  else load_gptq_linear)
        qs, ss, zs = [], [], []
        for i in range(L):
            q, s, z = loader(get_tensor, prefix.format(i=i))
            qs.append(q)
            ss.append(s)
            zs.append(z)
        return QuantLinear(
            qweight=jnp.asarray(np.stack(qs)),
            scale=jnp.asarray(np.stack(ss), jnp.float32),
            zero=jnp.asarray(np.stack(zs), jnp.float32),
        )

    layer_keys = set(shape_tree(cfg)["layers"])
    layers = {}
    for k in layer_keys:
        if (cfg.num_experts > 0
                and k in ("gate_proj", "up_proj", "down_proj")):
            layers[k] = stack_experts(k)
        elif quant is not None and k in QUANTIZED_KEYS:
            layers[k] = stack_quant(k)
        else:
            layers[k] = stack(k)
    params = {
        "embed_tokens": jnp.asarray(
            np.asarray(get_tensor("model.embed_tokens.weight")), dtype=dtype),
        "layers": layers,
        "norm": jnp.asarray(np.asarray(get_tensor("model.norm.weight")),
                            dtype=dtype),
    }
    if cfg.learned_pos_embeddings:
        params["embed_positions"] = jnp.asarray(
            np.asarray(get_tensor("model.embed_positions.weight")),
            dtype=dtype)
    if cfg.embedding_layernorm:
        # Canonical names; family shims (Bloom word_embeddings_layernorm)
        # rename to these.
        params["embed_layernorm"] = jnp.asarray(
            np.asarray(get_tensor("model.embed_layernorm.weight")),
            dtype=dtype)
        params["embed_layernorm_bias"] = jnp.asarray(
            np.asarray(get_tensor("model.embed_layernorm.bias")),
            dtype=dtype)
    if cfg.norm_type in ("layernorm", "layernorm1p") and cfg.norm_bias:
        params["norm_bias"] = jnp.asarray(
            np.asarray(get_tensor("model.norm.bias")), dtype=dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(
            np.asarray(get_tensor("lm_head.weight")).T, dtype=dtype)
        if cfg.lm_head_bias:
            params["lm_head_bias"] = jnp.asarray(
                np.asarray(get_tensor("lm_head.bias")), dtype=dtype)
    return params


# --- forward ------------------------------------------------------------------

def decoder_norm(x: jnp.ndarray, w: jnp.ndarray,
                 cfg: DecoderConfig, b=None) -> jnp.ndarray:
    """Family-selected norm: RMSNorm (default), Gemma's (1 + w) RMSNorm
    with the weight multiply kept in fp32, LayerNorm with bias
    (StarCoder2), or Nemotron's zero-centered LayerNorm1P ((1 + w)
    weight)."""
    if cfg.norm_type in ("layernorm", "layernorm1p"):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + cfg.rms_norm_eps)
        wf = w.astype(jnp.float32)
        y = y * (1.0 + wf if cfg.norm_type == "layernorm1p" else wf)
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(x.dtype)
    if not cfg.gemma_norm:
        return rms_norm(x, w, cfg.rms_norm_eps)
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + cfg.rms_norm_eps)
    return (xf * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def _act_only(cfg: DecoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.hidden_act == "silu":
        return jax.nn.silu(x)
    if cfg.hidden_act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if cfg.hidden_act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if cfg.hidden_act == "relu":
        return jax.nn.relu(x)
    if cfg.hidden_act == "relu2":
        # Nemotron relu^2 (reference nemotron.py ReLUSquaredActivation)
        return jnp.square(jax.nn.relu(x))
    raise ValueError(f"unsupported hidden_act {cfg.hidden_act!r}")


def _xielu(x: jnp.ndarray, alpha_p: jnp.ndarray,
           alpha_n: jnp.ndarray) -> jnp.ndarray:
    """Apertus xIELU (HF activations.py XIELUActivation._xielu_python,
    arXiv:2411.13010) with PER-LAYER learnable alpha scalars and the HF
    constant beta=0.5 / eps=-1e-6 buffers: quadratic a_p x^2 + b x for
    x > 0, saturating (expm1(min(x, eps)) - x) a_n + b x below."""
    beta, eps = 0.5, -1e-6
    xf = x.astype(jnp.float32)
    ap = jax.nn.softplus(alpha_p.astype(jnp.float32).reshape(()))
    an = beta + jax.nn.softplus(alpha_n.astype(jnp.float32).reshape(()))
    pos = ap * jnp.square(xf) + beta * xf
    neg = (jnp.expm1(jnp.minimum(xf, eps)) - xf) * an + beta * xf
    return jnp.where(xf > 0, pos, neg).astype(x.dtype)


def act_and_mul(cfg: DecoderConfig, gate: jnp.ndarray,
                up: jnp.ndarray) -> jnp.ndarray:
    """Gated-MLP activation by family (reference activation.py registry)."""
    if cfg.hidden_act == "silu":
        return silu_and_mul(gate, up)
    return _act_only(cfg, gate) * up


def _sparsemixer_route(logits: jnp.ndarray, k: int, jitter_eps: float):
    """Phi-3.5-MoE sparsemixer routing, inference path (HF
    modeling_phimoe.py sparsemixer(..., training=False)): per round,
    experts within a relative threshold of the max stay unmasked, the
    weight is the masked softmax at the argmax, and the chosen expert is
    knocked out for the next round."""
    T = logits.shape[0]
    sels, ws = [], []
    scores = logits
    for _ in range(k):
        mx = scores.max(axis=-1, keepdims=True)
        factor = jnp.maximum(jnp.abs(scores), jnp.abs(mx))
        mask = (mx - scores) / factor > 2 * jitter_eps
        masked = jnp.where(mask, -jnp.inf, scores)
        sel = jnp.argmax(scores, axis=-1)
        gates = jax.nn.softmax(masked, axis=-1)
        ws.append(jnp.take_along_axis(gates, sel[:, None], -1)[:, 0])
        sels.append(sel)
        scores = jnp.where(
            jax.nn.one_hot(sel, scores.shape[-1], dtype=bool),
            -jnp.inf, scores)
    return jnp.stack(ws, axis=-1), jnp.stack(sels, axis=-1).astype(jnp.int32)


def _moe_mlp(h: jnp.ndarray, lp: dict, cfg: DecoderConfig) -> jnp.ndarray:
    """Sparse-MoE MLP via routed grouped GEMM (reference
    fused_moe/moe_pallas.py role, megablox-style): flatten
    (token, expert-slot) pairs, stable-sort by expert id, run the expert
    matmuls as ``lax.ragged_dot`` over contiguous expert groups — XLA
    lowers this to the TPU grouped-matmul path, so only the k routed
    rows per token cost FLOPs (vs E× dense for an expert scan) — then
    unsort and combine with routing weights. Routing matches HF
    Qwen3MoeSparseMoeBlock: softmax over all experts, top-k, optional
    renorm."""
    T, D = h.shape
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    logits = (h @ lp["moe_gate"]).astype(jnp.float32)       # [T, E]
    if cfg.router_logit_softcapping:
        # Grok-1: 30 * tanh(logits / 30) before softmax (grok1.py:109)
        c = cfg.router_logit_softcapping
        logits = c * jnp.tanh(logits / c)
    if cfg.moe_routing == "sparsemixer":
        topv, topi = _sparsemixer_route(logits, K,
                                        cfg.router_jitter_noise)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
        topv, topi = jax.lax.top_k(probs, K)                # [T, K]
        if cfg.norm_topk_prob:
            topv = topv / jnp.maximum(topv.sum(-1, keepdims=True), 1e-20)

    flat_e = topi.reshape(-1)                               # [T*K]
    order = jnp.argsort(flat_e, stable=True)                # group-major
    token_of = order // K                                   # source token
    xs = h[token_of]                                        # [T*K, D]
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)
    gated = jax.lax.ragged_dot(xs, lp["gate_proj"], group_sizes)
    up = jax.lax.ragged_dot(xs, lp["up_proj"], group_sizes)
    ys = jax.lax.ragged_dot(silu_and_mul(gated, up), lp["down_proj"],
                            group_sizes)                    # [T*K, D]
    w = topv.reshape(-1)[order]                             # [T*K]
    acc = jax.ops.segment_sum(ys.astype(jnp.float32) * w[:, None],
                              token_of, num_segments=T)
    out = acc.astype(h.dtype)
    if cfg.shared_expert_intermediate_size > 0:
        # Qwen2-MoE shared expert: a dense SwiGLU MLP added to the
        # routed output, sigmoid-gated per token when configured
        # (reference qwen2_moe.py:Qwen2MoeSparseMoeBlock.forward).
        shared = apply_linear(
            act_and_mul(cfg, apply_linear(h, lp["shared_gate_proj"]),
                        apply_linear(h, lp["shared_up_proj"])),
            lp["shared_down_proj"])
        if cfg.use_shared_expert_gate:
            g = jax.nn.sigmoid(
                (h @ lp["shared_expert_gate"]).astype(jnp.float32))
            shared = (shared.astype(jnp.float32) * g).astype(h.dtype)
        out = out + shared
    return out


def forward(
    params: dict,
    cfg: DecoderConfig,
    tri_cfg: TriangleMixConfig,
    token_ids: jnp.ndarray,        # int32[T]
    kv_caches: jnp.ndarray,        # [L, blocks, page, 2*KH, D]
    md: AttentionMetadata,
    tri_flags: jnp.ndarray,        # bool[L] triangle layer selector
    lora=None,                     # {"stacks": {mod: (A[L,S,.,r], B)},
                                   #  "idx": int32[T]} or None
    kv_quant=None,                 # (k_scale, v_scale) static floats when
                                   # the cache dtype is fp8/int8
    moe_fn=None,                   # override for the MoE MLP, e.g. the
                                   # expert-parallel parallel/ep.py path
    cp_ctx=None,                   # (mesh, axis_name): decode context
                                   # parallelism — KV pages sharded over
                                   # the axis, write+attention+LSE-merge
                                   # run under shard_map
                                   # (parallel/dcp.py:dcp_write_and_attention)
    fused_decode: bool = False,    # decode-only fast path: attention
                                   # merges the current token's K/V from
                                   # registers, cache writes are deferred
                                   # to ONE batched all-layer launch by
                                   # the caller (attention/backend.py:
                                   # fused_decode_attention /
                                   # write_kv_all_layers). md.seq_lens
                                   # must exclude the current token.
    mm_scatter=None,               # (positions int32[M], vecs [M, D]):
                                   # multimodal embedding rows replacing
                                   # the placeholder-token embeddings at
                                   # the given padded-token positions
                                   # (pad entries point out of bounds and
                                   # drop; models/llava.py)
    spec_tree: bool = False,       # tree speculative verification: tree
                                   # draft rows (md.spec_flags > 0, slot
                                   # -1) attend through the tree-masked
                                   # in-step block of
                                   # attention/backend.py:
                                   # spec_tree_attention
    tap_layers=None,               # EAGLE-3 feature taps: static layer
                                   # ids whose output hidden states are
                                   # captured; forward then returns
                                   # (hidden, new_kv, taps [k, T, D])
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One step over a ragged token batch. Returns (hidden[T, D], new_kv) —
    with ``fused_decode``, new_kv is instead the stacked per-layer
    (k, v) rows [L, T, KH, D] for the deferred cache write."""
    Dh = cfg.head_dim
    HQ, KH = cfg.num_attention_heads, cfg.num_key_value_heads
    scale = Dh ** -0.5
    eps = cfg.rms_norm_eps

    x = params["embed_tokens"][token_ids]
    if cfg.embedding_multiplier != 1.0:
        # Gemma sqrt(hidden) / Granite embedding_multiplier, applied in
        # the model dtype (HF casts the scale to the embedding dtype).
        x = x * jnp.asarray(cfg.embedding_multiplier, x.dtype)
    if mm_scatter is not None:
        mm_pos, mm_vecs = mm_scatter
        # Pad rows carry an out-of-bounds position; mode="drop" skips them.
        x = x.at[mm_pos].set(mm_vecs.astype(x.dtype), mode="drop")
    if cfg.learned_pos_embeddings:
        # GPT-2 wpe / OPT embed_positions (+2 pad offset); JAX gather
        # clamps padded out-of-range positions to the last row.
        x = x + params["embed_positions"][
            md.positions + cfg.pos_embedding_offset].astype(x.dtype)
    if cfg.embedding_layernorm:
        x = decoder_norm(x, params["embed_layernorm"], cfg,
                         params.get("embed_layernorm_bias"))
    if not cfg.use_rope:
        cos = sin = None
    elif cfg.mrope_section is not None and md.mrope_positions is not None:
        cos, sin = mrope_cos_sin(md.mrope_positions, Dh, cfg.rope_theta,
                                 cfg.mrope_section, dtype=x.dtype)
    else:
        # Partial rotary (GPT-NeoX rotary_pct / Phi partial_rotary_factor):
        # inv_freq runs over rotary_dim, not head_dim; apply_rope leaves
        # the trailing head_dim - rotary_dim slice unrotated.
        rot_dim = int(Dh * cfg.partial_rotary_factor) // 2 * 2
        cos, sin = rope_cos_sin(
            md.positions, rot_dim, cfg.rope_theta, dtype=x.dtype,
            scaling=cfg.rope_scaling,
            max_position_embeddings=cfg.max_position_embeddings)

    attn_kwargs = build_attn_kwargs(cfg, tri_cfg, kv_quant)

    lora_stacks = lora["stacks"] if lora is not None else {}
    onehot = None
    if lora is not None:
        from vllm_trianglemix_tpu.lora.layers import slot_onehot

        n_slots = next(iter(lora_stacks.values()))[0].shape[1]
        onehot = slot_onehot(lora["idx"], n_slots)

    # TPU-first cache layout: keep the paged KV pool OUT of the lax.scan.
    # Scanning it as xs/ys makes XLA dynamic-slice a full per-layer cache
    # copy in (and stack another out) every step — ~2x the whole cache in
    # HBM traffic per forward (measured ~0.4 ms/layer at the 8k-token
    # bench prefill, scripts/profile_kv_write.py). Instead all layers
    # share ONE flat page pool [L*blocks, page, 2KH, D]; each layer
    # addresses its own pages via block tables offset by layer_id*blocks,
    # the write kernel updates the pool in place (input_output_aliases),
    # and for prefill the pool rides the scan carry so no copies happen.
    L = cfg.num_hidden_layers
    num_blocks = kv_caches.shape[1]

    if fused_decode:
        flat_kv = kv_caches.reshape((L * num_blocks,) + kv_caches.shape[2:])
        layer_ids = jnp.arange(L, dtype=jnp.int32)

        rope_flags = (jnp.asarray(cfg.rope_layers, bool)
                      if cfg.rope_layers is not None else None)

        def layer_fn(x, scanned):
            lp, tri, lmods, lid = scanned
            kept = {}
            md_l = offset_md(md, lid, num_blocks, kv_caches.shape[2])

            def attn_of(q, k, v):
                kept["kv"] = (k, v)
                return fused_decode_attention(q, k, v, flat_kv, md_l, tri,
                                              **attn_kwargs)

            x = _layer_compute(x, lp, lmods, onehot, cfg, cos, sin,
                               attn_of, moe_fn,
                               rope_on=(None if rope_flags is None
                                        else rope_flags[lid]))
            return x, kept["kv"]

        x, new_kv = jax.lax.scan(
            layer_fn, x,
            (params["layers"], tri_flags, lora_stacks, layer_ids))
    elif cp_ctx is not None:
        from vllm_trianglemix_tpu.parallel.dcp import (
            dcp_write_and_attention,
        )

        rope_flags = (jnp.asarray(cfg.rope_layers, bool)
                      if cfg.rope_layers is not None else None)

        def layer_fn(x, scanned):
            lp, kv, tri, lmods, lid = scanned
            kept = {}

            def attn_of(q, k, v):
                attn, kept["kv"] = dcp_write_and_attention(
                    q, k, v, kv, md, cp_ctx[0], scale=scale,
                    cp_axis=cp_ctx[1])
                return attn

            x = _layer_compute(x, lp, lmods, onehot, cfg, cos, sin,
                               attn_of, moe_fn,
                               rope_on=(None if rope_flags is None
                                        else rope_flags[lid]))
            return x, kept["kv"]

        x, new_kv = jax.lax.scan(
            layer_fn, x,
            (params["layers"], kv_caches, tri_flags, lora_stacks,
             jnp.arange(L, dtype=jnp.int32)))
    else:
        flat_kv = kv_caches.reshape((L * num_blocks,) + kv_caches.shape[2:])
        out = scan_layers(
            params["layers"], cfg, x, flat_kv, md, tri_flags,
            cos=cos, sin=sin, attn_kwargs=attn_kwargs, kv_quant=kv_quant,
            moe_fn=moe_fn, lora_stacks=lora_stacks, onehot=onehot,
            spec_tree=spec_tree, tap_layers=tap_layers)
        if tap_layers:
            x, flat_kv, taps = out
            new_kv = flat_kv.reshape(kv_caches.shape)
            x = decoder_norm(x, params["norm"], cfg,
                             params.get("norm_bias"))
            return x, new_kv, taps
        x, flat_kv = out
        new_kv = flat_kv.reshape(kv_caches.shape)
    x = decoder_norm(x, params["norm"], cfg, params.get("norm_bias"))
    return x, new_kv


def build_attn_kwargs(cfg: DecoderConfig, tri_cfg: TriangleMixConfig,
                      kv_quant=None) -> dict:
    """Static attention-kernel arguments shared by forward() and the
    pipeline-parallel path (parallel/pp.py)."""
    kw = dict(
        scale=(cfg.attention_multiplier
               if cfg.attention_multiplier is not None
               else cfg.head_dim ** -0.5),
        sink=tri_cfg.num_sink_tokens,
        window=tri_cfg.sliding_window_size,
        last=tri_cfg.num_last_tokens,
        dense_threshold=tri_cfg.dense_threshold,
        attn_window=cfg.sliding_window,
        attn_chunk=cfg.attention_chunk_size,
        # Static: a dense engine compiles the TriangleMix predicates out
        # of the attention kernels entirely (3 [rows, cols] VPU compares
        # per KV tile otherwise spent on an always-false traced flag).
        tri_enabled=bool(tri_cfg.enabled),
    )
    if cfg.alibi_slopes:
        # Routes attention to the XLA path (backend.py dispatch).
        kw["alibi_slopes"] = tuple(cfg.alibi_slopes)
    if cfg.prefix_lm:
        # PaliGemma bidirectional prefix (XLA path).
        kw["prefix_lm"] = True
    if cfg.attn_soft_cap:
        kw["soft_cap"] = cfg.attn_soft_cap
    if kv_quant is not None:
        kw["k_scale"] = kv_quant[0]
        kw["v_scale"] = kv_quant[1]
    return kw


def offset_md(md: AttentionMetadata, lid, num_blocks: int,
              page: int) -> AttentionMetadata:
    """Rebase block tables / slots / update slices onto layer ``lid``'s
    region of the flat shared page pool."""
    off_slots = lid * (num_blocks * page)
    kw = dict(
        block_tables=md.block_tables + lid * num_blocks,
        slot_mapping=jnp.where(md.slot_mapping >= 0,
                               md.slot_mapping + off_slots,
                               md.slot_mapping),
    )
    if md.kv_slices is not None:
        kw["kv_slices"] = md.kv_slices.at[0].add(off_slots)
    if md.shared_block_tables is not None:
        kw["shared_block_tables"] = jnp.where(
            md.shared_block_tables >= 0,
            md.shared_block_tables + lid * num_blocks,
            md.shared_block_tables)
    return md._replace(**kw)


def _layer_compute(x, lp, lmods, onehot, cfg: DecoderConfig, cos, sin,
                   attn_of, moe_fn, rope_on=None):
    """One decoder layer given ``attn_of(q, k, v) -> attention output``:
    norm -> qkv(+bias/qk-norm/rope) -> attention -> o_proj -> MLP/MoE."""
    T = x.shape[0]
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    eps = cfg.rms_norm_eps

    def proj(h, key):
        y = apply_linear(h, lp[key])
        if key in lmods:
            from vllm_trianglemix_tpu.lora.layers import apply_lora

            A, B = lmods[key]
            y = apply_lora(h, y, A, B, onehot)
        return y

    rmul = cfg.residual_multiplier

    if cfg.postnorm:
        h = x                     # OLMo-2: attention reads the raw input
    else:
        h = decoder_norm(x, lp["input_layernorm"], cfg,
                         lp.get("input_layernorm_bias"))
    q = proj(h, "q_proj")
    k = proj(h, "k_proj")
    v = proj(h, "v_proj")
    if cfg.use_qkv_bias:
        q = q + lp["q_bias"]
        k = k + lp["k_bias"]
        v = v + lp["v_bias"]
    if cfg.qkv_clip:
        c = cfg.qkv_clip
        q, k, v = (jnp.clip(t, -c, c) for t in (q, k, v))
    if cfg.use_qk_norm and cfg.qk_norm_flat:
        # OLMo-2: RMSNorm over the flat projection before head split
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
    q = q.reshape(T, HQ, Dh)
    k = k.reshape(T, KH, Dh)
    v = v.reshape(T, KH, Dh)
    if cfg.use_qk_norm and not cfg.qk_norm_flat:
        if cfg.qk_norm_type == "layernorm":
            # Persimmon qk_layernorm: per-head LayerNorm with bias.
            def _ln(t, w, b):
                tf = t.astype(jnp.float32)
                mu = tf.mean(-1, keepdims=True)
                var = ((tf - mu) ** 2).mean(-1, keepdims=True)
                y = (tf - mu) * jax.lax.rsqrt(var + eps)
                return (y * w.astype(jnp.float32)
                        + b.astype(jnp.float32)).astype(t.dtype)

            q = _ln(q, lp["q_norm"], lp["q_norm_bias"])
            k = _ln(k, lp["k_norm"], lp["k_norm_bias"])
        else:
            q = rms_norm(q, lp["q_norm"], eps)
            k = rms_norm(k, lp["k_norm"], eps)
    if cos is not None:
        qr, kr = apply_rope(q, k, cos, sin,
                            interleaved=cfg.rope_interleaved)
        if rope_on is not None:
            # SmolLM3 NoPE layers: scanned per-layer flag selects the
            # unrotated projections (both branches computed; one select)
            q = jnp.where(rope_on, qr, q)
            k = jnp.where(rope_on, kr, k)
        else:
            q, k = qr, kr
    attn = attn_of(q, k, v)
    attn_out = proj(attn.reshape(T, HQ * Dh), "o_proj")
    if cfg.use_o_bias:
        attn_out = attn_out + lp["o_bias"]
    if cfg.postnorm:
        attn_out = decoder_norm(attn_out, lp["post_attention_layernorm"],
                                cfg)
    if cfg.sandwich_norm:
        attn_out = decoder_norm(attn_out, lp["post_self_attn_layernorm"],
                                cfg)
    if cfg.parallel_block:
        # x + attn(norm(x)) + mlp(norm'(x)); the MLP reads either the
        # same normed input (Phi/Cohere) or a second norm of x (GPT-NeoX)
        h2 = (h if cfg.parallel_block_shared_norm
              else decoder_norm(x, lp["post_attention_layernorm"], cfg,
                                lp.get("post_attention_layernorm_bias")))
    else:
        x = x + rmul * attn_out
        h2 = (x if cfg.postnorm
              else decoder_norm(x, lp["post_attention_layernorm"], cfg,
                                lp.get("post_attention_layernorm_bias")))
    if cfg.num_experts > 0:
        mlp_out = (moe_fn or _moe_mlp)(h2, lp, cfg)
    elif not cfg.gated_mlp:
        up = proj(h2, "up_proj")
        if cfg.use_mlp_bias:
            up = up + lp["up_bias"]
        if cfg.hidden_act == "xielu":
            act = _xielu(up, lp["act_alpha_p"], lp["act_alpha_n"])
        else:
            act = _act_only(cfg, up)
        mlp_out = proj(act, "down_proj")
        if cfg.use_mlp_bias:
            mlp_out = mlp_out + lp["down_bias"]
    else:
        gate = proj(h2, "gate_proj")
        up = proj(h2, "up_proj")
        if cfg.use_mlp_bias:
            gate = gate + lp["gate_bias"]
            up = up + lp["up_bias"]
        mlp_out = proj(act_and_mul(cfg, gate, up), "down_proj")
        if cfg.use_mlp_bias:
            mlp_out = mlp_out + lp["down_bias"]
    if cfg.postnorm:
        mlp_out = decoder_norm(mlp_out, lp["post_feedforward_layernorm"],
                               cfg)
    if cfg.sandwich_norm:
        mlp_out = decoder_norm(mlp_out, lp["post_mlp_layernorm"], cfg)
    if cfg.parallel_block:
        x = x + rmul * (attn_out + mlp_out)
    else:
        x = x + rmul * mlp_out
    return x


def scan_layers(layers_params, cfg: DecoderConfig, x, flat_kv, md,
                tri_flags, *, cos, sin, attn_kwargs, kv_quant=None,
                moe_fn=None, lora_stacks=None, onehot=None,
                spec_tree: bool = False, tap_layers=None):
    """Scan a stack of decoder layers over a shared flat KV page pool.

    The core of forward()'s standard path, reused by parallel/pp.py for
    per-stage layer ranges: ``layers_params`` leaves are [Ls, ...],
    ``flat_kv`` is [Ls * num_blocks, page, 2KH, D] (this stack's pages),
    and block tables address it via layer-local offsets.
    """
    Ls = tri_flags.shape[0]
    num_blocks = flat_kv.shape[0] // Ls
    layer_ids = jnp.arange(Ls, dtype=jnp.int32)
    lora_stacks = lora_stacks or {}

    rope_flags = (jnp.asarray(cfg.rope_layers, bool)
                  if getattr(cfg, "rope_layers", None) is not None
                  else None)

    taps0 = (jnp.zeros((len(tap_layers),) + x.shape, x.dtype)
             if tap_layers else None)

    def layer_fn(carry, scanned):
        if tap_layers:
            x, flat, taps = carry
        else:
            x, flat = carry
        lp, tri, lmods, lid = scanned
        md_l = offset_md(md, lid, num_blocks, flat_kv.shape[1])
        kept = {}

        if spec_tree:
            from vllm_trianglemix_tpu.attention.backend import (
                spec_tree_attention,
            )

            def attn_of(q, k, v):
                # tree draft rows carry slot -1 (no write); real rows
                # land in the cache first, then every row attends the
                # real prefix + the tree-masked in-step block
                kept["kv"] = write_kv(flat, k, v, md_l, kv_quant=kv_quant)
                return spec_tree_attention(q, k, v, kept["kv"], md_l, tri,
                                           **attn_kwargs)
        else:
            def attn_of(q, k, v):
                kept["kv"] = write_kv(flat, k, v, md_l, kv_quant=kv_quant)
                return ragged_paged_attention(q, kept["kv"], md_l, tri,
                                              **attn_kwargs)

        x = _layer_compute(x, lp, lmods, onehot, cfg, cos, sin,
                           attn_of, moe_fn,
                           rope_on=(None if rope_flags is None
                                    else rope_flags[lid]))
        if tap_layers:
            # EAGLE-3 feature taps (reference eagle.py multi-layer
            # hidden input): capture this layer's OUTPUT hidden state
            # when its id matches a tap (static list, traced layer id).
            for ti, tl in enumerate(tap_layers):
                taps = taps.at[ti].set(jnp.where(lid == tl, x, taps[ti]))
            return (x, kept["kv"], taps), None
        return (x, kept["kv"]), None

    if tap_layers:
        (x, flat_kv, taps), _ = jax.lax.scan(
            layer_fn, (x, flat_kv, taps0),
            (layers_params, tri_flags, lora_stacks, layer_ids))
        return x, flat_kv, taps
    (x, flat_kv), _ = jax.lax.scan(
        layer_fn, (x, flat_kv),
        (layers_params, tri_flags, lora_stacks, layer_ids))
    return x, flat_kv


def compute_logits(params: dict, cfg: DecoderConfig,
                   hidden: jnp.ndarray) -> jnp.ndarray:
    """hidden[R, D] -> logits[R, V] (fp32, like the reference LogitsProcessor)."""
    if cfg.tie_word_embeddings:
        w = params["embed_tokens"].T
    else:
        w = params["lm_head"]
    logits = jnp.dot(hidden, w, preferred_element_type=jnp.float32)
    if cfg.lm_head_bias:
        logits = logits + params["lm_head_bias"].astype(jnp.float32)
    if cfg.logits_scaling != 1.0:
        logits = logits / cfg.logits_scaling
    return logits


def kv_cache_spec(cfg: DecoderConfig, block_size: int, dtype_bytes: int = 2):
    from vllm_trianglemix_tpu.attention.backend import padded_head_dim
    from vllm_trianglemix_tpu.core.kv_cache_interface import (
        ChunkedLocalAttentionSpec,
        FullAttentionSpec,
        SlidingWindowSpec,
    )
    if cfg.attention_chunk_size > 0:
        return ChunkedLocalAttentionSpec(
            block_size=block_size,
            num_kv_heads=cfg.num_key_value_heads,
            head_size=padded_head_dim(cfg.head_dim),
            dtype_bytes=dtype_bytes,
            attention_chunk_size=cfg.attention_chunk_size,
        )
    if cfg.sliding_window > 0:
        # Scheduler side: SlidingWindowManager reclaims out-of-window
        # blocks (reference single_type_kv_cache_manager.py:304).
        return SlidingWindowSpec(
            block_size=block_size,
            num_kv_heads=cfg.num_key_value_heads,
            head_size=padded_head_dim(cfg.head_dim),
            dtype_bytes=dtype_bytes,
            sliding_window=cfg.sliding_window,
        )
    return FullAttentionSpec(
        block_size=block_size,
        num_kv_heads=cfg.num_key_value_heads,
        head_size=padded_head_dim(cfg.head_dim),
        dtype_bytes=dtype_bytes,
    )
