"""Quantized linear algebra (XLA-native dequant-fused matmuls).

A ``QuantLinear`` replaces a dense [.., Din, Dout] weight in the param
pytree. Convention:

- ``qweight`` int8 [.., Din, Dout]          — int8 values, or int4 values
  stored in int8 when ``scale`` has >1 group and dtype-packing isn't used
- ``qweight`` uint8 [.., Din // 2, Dout]    — two int4 nibbles per byte
  (row-major: byte b holds rows 2b (low) and 2b+1 (high))
- ``scale``  f32 [.., G, Dout]              — per-group scales (G == 1 =>
  per-output-channel)
- ``zero``   f32 [.., G, Dout] or None      — asymmetric zero points
  (AWQ/GPTQ); w = (q - zero) * scale. None => symmetric, w = q * scale.

Dequantization is expressed as elementwise ops feeding the dot; XLA fuses
the int->float convert and scale into the matmul operand read, so HBM
traffic is the quantized bytes (the goal of the reference's cutlass/marlin
kernels, csrc/quantization/ — on TPU the compiler does the fusion).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class QuantLinear(NamedTuple):
    qweight: jnp.ndarray
    scale: jnp.ndarray
    zero: Optional[jnp.ndarray] = None


class ActQuantLinear(NamedTuple):
    """W8A8: quantized weight AND on-the-fly quantized activations.

    The distinct pytree type (vs QuantLinear) is what selects the
    activation-quantized matmul in apply_linear — no non-array flags in
    the tree. qweight int8 (INT8 W8A8, reference tpu_int8.py:19-117 +
    compressed-tensors int8) or f8e4m3 (FP8 W8A8, reference
    fp8.py:71-1092); scale f32 [.., 1, Dout] per-output-channel.
    Activations get dynamic per-token symmetric scales — the TPU-native
    equivalent of the reference's fused act-quant CUDA kernels: XLA fuses
    the absmax/divide/round chain into the surrounding elementwise work,
    and the int8 dot rides the MXU's native int8 path.
    """

    qweight: jnp.ndarray
    scale: jnp.ndarray


def _unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """uint8 [.., Din//2, Dout] -> int8-valued [.., Din, Dout] (0..15)."""
    low = (packed & 0x0F).astype(jnp.int8)
    high = (packed >> 4).astype(jnp.int8)
    stacked = jnp.stack([low, high], axis=-2)  # [.., Din//2, 2, Dout]
    new_shape = (*packed.shape[:-2], packed.shape[-2] * 2, packed.shape[-1])
    return stacked.reshape(new_shape)


def dequantize(w: QuantLinear, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Materialize the full-precision weight [.., Din, Dout]."""
    q = w.qweight
    if q.dtype == jnp.uint8:
        q = _unpack_int4(q)
    qf = q.astype(jnp.float32)
    G = w.scale.shape[-2]
    din, dout = qf.shape[-2], qf.shape[-1]
    lead = qf.shape[:-2]
    qf = qf.reshape(*lead, G, din // G, dout)
    if w.zero is not None:
        qf = qf - w.zero[..., :, None, :]
    qf = qf * w.scale[..., :, None, :]
    return qf.reshape(*lead, din, dout).astype(dtype)


def apply_linear(x: jnp.ndarray, w) -> jnp.ndarray:
    """x [.., Din] @ w -> [.., Dout]; w is dense, QuantLinear (weight-only)
    or ActQuantLinear (W8A8)."""
    if isinstance(w, ActQuantLinear):
        w_scale = w.scale[..., 0, :]
        if w.qweight.dtype == jnp.int8:
            # Dynamic per-token symmetric int8 activations; int8xint8 dot
            # accumulates in int32 on the MXU's native int8 path.
            absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                             keepdims=True)
            x_scale = jnp.maximum(absmax / 127.0, 1e-8)
            xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, w.qweight, (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * x_scale * w_scale).astype(x.dtype)
        # FP8 e4m3 activations (per-token dynamic scale to the e4m3 range).
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                         keepdims=True)
        x_scale = jnp.maximum(absmax / 448.0, 1e-8)
        xq = (x / x_scale).astype(jnp.float8_e4m3fn)
        y = jax.lax.dot_general(
            xq, w.qweight, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y * x_scale * w_scale).astype(x.dtype)
    if isinstance(w, QuantLinear):
        per_channel_sym = w.zero is None and w.scale.shape[-2] == 1 \
            and w.qweight.dtype == jnp.int8
        if per_channel_sym:
            # scale commutes with the contraction: (x @ q) * s
            y = jnp.dot(x, w.qweight.astype(x.dtype),
                        preferred_element_type=jnp.float32)
            return (y * w.scale[..., 0, :]).astype(x.dtype)
        if w.qweight.dtype == jnp.float8_e4m3fn:
            y = jnp.dot(x, w.qweight.astype(x.dtype),
                        preferred_element_type=jnp.float32)
            return (y * w.scale[..., 0, :]).astype(x.dtype)
        return x @ dequantize(w, x.dtype)
    return x @ w


# --- quantize-at-load ---------------------------------------------------------

def quantize_int8(w: jnp.ndarray) -> QuantLinear:
    """Symmetric per-output-channel int8 (reference tpu_int8.py:19-117
    semantics: scale = absmax / 127 over the input axis)."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [.., 1, Dout]
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantLinear(qweight=q, scale=scale)


def quantize_int4(w: jnp.ndarray, group_size: int = 128) -> QuantLinear:
    """Symmetric grouped int4, nibble-packed along the input axis."""
    wf = w.astype(jnp.float32)
    din, dout = wf.shape[-2], wf.shape[-1]
    lead = wf.shape[:-2]
    G = max(1, din // group_size)
    grouped = wf.reshape(*lead, G, din // G, dout)
    absmax = jnp.max(jnp.abs(grouped), axis=-2)            # [.., G, Dout]
    scale = jnp.maximum(absmax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(grouped / scale[..., :, None, :]), -8, 7)
    q = q.reshape(*lead, din, dout).astype(jnp.int8)
    # offset to unsigned nibbles with zero-point 8
    qu = (q + 8).astype(jnp.uint8)
    low = qu[..., 0::2, :]
    high = qu[..., 1::2, :]
    packed = (low | (high << 4)).astype(jnp.uint8)
    zero = jnp.full((*lead, G, dout), 8.0, jnp.float32)
    return QuantLinear(qweight=packed, scale=scale, zero=zero)


def quantize_fp8(w: jnp.ndarray) -> QuantLinear:
    """Weight-only e4m3 with per-output-channel scales (reference fp8.py
    per-channel path). e4m3 max normal = 448."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax / 448.0, 1e-8)
    q = (wf / scale).astype(jnp.float8_e4m3fn)
    return QuantLinear(qweight=q, scale=scale)


def quantize_int8_w8a8(w: jnp.ndarray) -> ActQuantLinear:
    """INT8 W8A8 (reference compressed-tensors int8 / tpu_int8.py):
    symmetric per-output-channel weights; activations quantize per token
    at run time inside apply_linear."""
    q = quantize_int8(w)
    return ActQuantLinear(qweight=q.qweight, scale=q.scale)


def quantize_fp8_w8a8(w: jnp.ndarray) -> ActQuantLinear:
    """FP8 W8A8 (reference fp8.py dynamic-activation path)."""
    q = quantize_fp8(w)
    return ActQuantLinear(qweight=q.qweight, scale=q.scale)


_QUANTIZERS = {
    "int8": quantize_int8,
    "int4": quantize_int4,
    "fp8": quantize_fp8,
    "int8_w8a8": quantize_int8_w8a8,
    "fp8_w8a8": quantize_fp8_w8a8,
}

# Projection matrices quantized in a decoder layer; norms/embeddings stay
# full precision (matches reference behavior: quant methods wrap Linear
# layers only).
QUANTIZED_KEYS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                 "up_proj", "down_proj")


def quantize_params(params: dict, method: str) -> dict:
    """Quantize a loaded dense param tree in place (weight-only)."""
    if method not in _QUANTIZERS:
        raise ValueError(
            f"unsupported quantization {method!r}; have {sorted(_QUANTIZERS)}")
    fn = _QUANTIZERS[method]
    out = dict(params)
    out["layers"] = dict(params["layers"])
    for key in QUANTIZED_KEYS:
        w = out["layers"].get(key)
        # MoE expert stacks [L, E, Din, Dout] keep full precision for now
        # (the dense-eval MoE path consumes raw arrays).
        if w is not None and not isinstance(w, QuantLinear) \
                and w.ndim <= 3:
            out["layers"][key] = fn(w)
    return out
