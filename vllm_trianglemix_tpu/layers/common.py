"""Core model-executor layer math (functional, XLA-native).

Equivalents of the reference's CUDA-backed layers (csrc/layernorm_kernels.cu,
activation_kernels.cu, pos_encoding_kernels.cu) — on TPU these are
XLA-native: the compiler fuses them into surrounding matmuls, so no Pallas
is needed (SURVEY.md §2.5 dispositions).

All functions are pure; weights are plain jnp arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray,
             eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with float32 accumulation then cast back — matches HF
    Qwen3RMSNorm numerics (variance in fp32, weight applied after cast)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return weight * xf.astype(dtype)


def rms_norm_residual(x: jnp.ndarray, residual: jnp.ndarray,
                      weight: jnp.ndarray,
                      eps: float = 1e-6) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused add + RMSNorm (reference RMSNorm fused-residual variant,
    layernorm.py:134): returns (normed(x+residual), x+residual)."""
    added = x + residual
    return rms_norm(added, weight, eps), added


def silu_and_mul(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU activation (reference SiluAndMul, activation.py:59)."""
    return jax.nn.silu(gate) * up


def gelu_and_mul(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(gate, approximate=False) * up


# --- rotary position embeddings ---------------------------------------------

def scaled_inv_freq(head_dim: int, theta: float, scaling=None,
                    max_position_embeddings: int = 0):
    """(inv_freq[np head_dim//2], attention_factor) for a rope-scaling
    config (reference vllm/model_executor/layers/rotary_embedding/:
    llama3, yarn, dynamic-ntk, linear variants; numerics follow HF
    transformers modeling_rope_utils.py so scaled checkpoints match).

    ``scaling`` is any object with rope_type/factor/... attributes (see
    models.decoder.RopeScalingConfig) or None for plain RoPE. Computed
    host-side in numpy from static config — constant-folded under jit.
    """
    import math

    import numpy as np

    inv_freq = 1.0 / (theta ** (
        np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    attn_factor = 1.0
    if scaling is None or scaling.rope_type in ("default", "mrope"):
        return inv_freq.astype(np.float32), attn_factor

    rt = scaling.rope_type
    factor = float(scaling.factor)
    orig = int(scaling.original_max_position_embeddings
               or max_position_embeddings)
    if rt == "linear":
        inv_freq = inv_freq / factor
    elif rt == "dynamic":
        # Dynamic NTK. HF semantics (modeling_rope_utils.
        # _compute_dynamic_ntk_parameters): the reference length is
        # config.max_position_embeddings (NOT original_max_...), and
        # frequencies stay UNSCALED until the evaluated length exceeds
        # it. HF grows the table on demand; serving evaluates ONE
        # static table at the engine's max length (scaling.eval_len,
        # set by the model runner from max_model_len) — the reference's
        # DynamicNTKScalingRotaryEmbedding does the same.
        ref_len = int(max_position_embeddings)
        seq_len = max(int(getattr(scaling, "eval_len", 0) or 0), ref_len)
        base = theta * ((factor * seq_len / ref_len) - (factor - 1)) ** (
            head_dim / (head_dim - 2))
        inv_freq = 1.0 / (base ** (
            np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    elif rt == "yarn":
        beta_fast = float(getattr(scaling, "beta_fast", 32.0) or 32.0)
        beta_slow = float(getattr(scaling, "beta_slow", 1.0) or 1.0)

        def find_dim(num_rot):
            return (head_dim * math.log(orig / (num_rot * 2 * math.pi))
                    ) / (2 * math.log(theta))

        low, high = find_dim(beta_fast), find_dim(beta_slow)
        if bool(getattr(scaling, "truncate", True)):
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, head_dim - 1)
        ramp = np.clip(
            (np.arange(head_dim // 2, dtype=np.float64) - low)
            / max(high - low, 1e-3), 0, 1)
        extrapolation_mask = 1.0 - ramp
        inv_freq = (inv_freq / factor * ramp
                    + inv_freq * extrapolation_mask)
        af = getattr(scaling, "attention_factor", None)
        if af is None:
            af = 0.1 * math.log(factor) + 1.0
        attn_factor = float(af)
    elif rt == "llama3":
        low_f = float(scaling.low_freq_factor)
        high_f = float(scaling.high_freq_factor)
        low_wavelen = orig / low_f
        high_wavelen = orig / high_f
        wavelen = 2 * math.pi / inv_freq
        scaled = np.where(wavelen > low_wavelen, inv_freq / factor,
                          inv_freq)
        smooth = (orig / wavelen - low_f) / (high_f - low_f)
        smoothed = ((1 - smooth) * inv_freq / factor + smooth * inv_freq)
        is_medium = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
        inv_freq = np.where(is_medium, smoothed, scaled)
    else:
        raise ValueError(f"unsupported rope_scaling type: {rt}")
    return inv_freq.astype(np.float32), attn_factor


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float,
                 dtype=jnp.float32, scaling=None,
                 max_position_embeddings: int = 0
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for the given positions, HF "rotate_half" layout:
    freqs duplicated as cat(freqs, freqs) over the head dim. ``scaling``
    selects a rope-scaling variant (see scaled_inv_freq)."""
    inv, attn_factor = scaled_inv_freq(head_dim, theta, scaling,
                                       max_position_embeddings)
    inv_freq = jnp.asarray(inv)
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return (jnp.cos(emb).astype(dtype) * attn_factor,
            jnp.sin(emb).astype(dtype) * attn_factor)


def mrope_cos_sin(positions_3d: jnp.ndarray, head_dim: int, theta: float,
                  mrope_section: tuple, dtype=jnp.float32
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multimodal rotary (Qwen2-VL mrope; reference
    rotary_embedding/mrope.py + HF Qwen2VLRotaryEmbedding numerics).

    ``positions_3d`` int32[3, T] carries (temporal, height, width)
    position ids; ``mrope_section`` splits the head_dim/2 frequency axis
    into three chunks, each reading its own position axis. Text tokens
    set all three axes equal, which makes mrope identical to standard
    rope for pure-text content."""
    assert sum(mrope_section) * 2 == head_dim, (mrope_section, head_dim)
    inv_freq = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    # freqs[a, t, i] = pos[a, t] * inv_freq[i]
    freqs = positions_3d.astype(jnp.float32)[:, :, None] * inv_freq[None,
                                                                    None, :]
    sel = jnp.asarray(np.repeat(np.arange(3), mrope_section), jnp.int32)
    half = jnp.take_along_axis(
        freqs, jnp.broadcast_to(sel[None, None, :], (1,) + freqs.shape[1:]),
        axis=0)[0]                                   # [T, head_dim/2]
    emb = jnp.concatenate([half, half], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray, interleaved: bool = False
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply rotary embedding; q/k are [..., tokens, heads, head_dim],
    cos/sin [tokens, rotary_dim] broadcast over heads. When
    rotary_dim < head_dim (GPT-NeoX rotary_pct / Phi
    partial_rotary_factor) the trailing slice passes through unrotated.
    ``interleaved`` selects the GPT-J/Cohere rotate-every-two pairing
    (even/odd lanes) instead of the Llama rotate-half layout."""
    rd = cos.shape[-1]
    Dh = q.shape[-1]
    if rd < Dh:
        q, q_pass = q[..., :rd], q[..., rd:]
        k, k_pass = k[..., :rd], k[..., rd:]
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    if interleaved:
        # pairs are (x[2i], x[2i+1]); cos/sin first half carries the
        # per-frequency tables (concat([f, f]) layout)
        ch, sh = cos[..., :rd // 2], sin[..., :rd // 2]

        def rot(x):
            x1, x2 = x[..., 0::2], x[..., 1::2]
            even = x1 * ch - x2 * sh
            odd = x2 * ch + x1 * sh
            return jnp.stack([even, odd], axis=-1).reshape(x.shape)

        q_rot, k_rot = rot(q), rot(k)
    else:
        q_rot = q * cos + _rotate_half(q) * sin
        k_rot = k * cos + _rotate_half(k) * sin
    if rd < Dh:
        q_rot = jnp.concatenate([q_rot, q_pass], axis=-1)
        k_rot = jnp.concatenate([k_rot, k_pass], axis=-1)
    return q_rot.astype(q.dtype), k_rot.astype(k.dtype)
