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

def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float,
                 dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for the given positions, HF "rotate_half" layout:
    freqs duplicated as cat(freqs, freqs) over the head dim."""
    inv_freq = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply rotary embedding; q/k are [..., tokens, heads, head_dim],
    cos/sin [tokens, head_dim] broadcast over heads."""
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    q_rot = q * cos + _rotate_half(q) * sin
    k_rot = k * cos + _rotate_half(k) * sin
    return q_rot.astype(q.dtype), k_rot.astype(k.dtype)
