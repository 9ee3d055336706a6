"""Batched multi-LoRA application (the Punica SGMV/BGMV role, XLA-native).

Every token carries a slot index; the delta for all slots is computed as
two small einsums with a one-hot slot selector contracted away — XLA
lowers it to [T, S*r] @ [S*r, D_out] matmuls, so no per-token weight
gathers and one static shape for any adapter mix (reference
vllm/lora/ops/ + punica wrappers, incl. punica_tpu.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_lora(h: jnp.ndarray, base_out: jnp.ndarray, A: jnp.ndarray,
               B: jnp.ndarray, slot_onehot: jnp.ndarray) -> jnp.ndarray:
    """base_out [T, D_out] += lora delta for h [T, D_in].

    A [S, D_in, r], B [S, r, D_out] (slot 0 zero), slot_onehot [T, S].
    """
    u = jnp.einsum("td,sdr->tsr", h, A)
    u = u * slot_onehot[:, :, None]
    delta = jnp.einsum("tsr,sro->to", u, B)
    return base_out + delta.astype(base_out.dtype)


def slot_onehot(lora_idx: jnp.ndarray, n_slots: int) -> jnp.ndarray:
    """int32[T] -> f32[T, S]; index 0 (and out-of-range) contributes the
    zero slot."""
    return jax.nn.one_hot(lora_idx, n_slots, dtype=jnp.float32)
