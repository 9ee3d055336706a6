"""Quantized linear algebra (Pallas dequant-GEMM + XLA-native fallbacks).

A ``QuantLinear`` replaces a dense [.., Din, Dout] weight in the param
pytree. Convention:

- ``qweight`` int8 [.., Din, Dout]           — int8 values
- ``qweight`` f8e4m3 [.., Din, Dout]         — fp8 values
- ``qweight`` uint8 [.., Din // 2, Dout]     — packed SIGNED int4 in the
  TPU tile-halves layout (ops/quantized_matmul.py: packed byte row r of
  a 256-row tile holds unpacked row r low-nibble / row r+128
  high-nibble, low nibble excess-8, high nibble two's complement)
- ``scale``  f32 [.., G, Dout]               — per-group scales (G == 1
  => per-output-channel)
- ``zero``   f32 [.., G, Dout] or None       — asymmetric zero points
  (AWQ/GPTQ); w = (q - zero) * scale with q the logical SIGNED value.
  None => symmetric, w = q * scale.

Execution paths, chosen per static shape at trace time:
- int8 / fp8 weight-only: XLA fuses the convert+scale into the matmul
  operand read and streams the quantized bytes (measured 1.8x bf16 at
  the decode shape on v5e) — no kernel needed.
- packed int4: XLA does NOT stream sub-byte weights (measured slower
  than bf16), so decode-sized GEMMs dispatch to the Pallas
  dequant-GEMM (ops/quantized_matmul.py, the marlin/machete role,
  reference csrc/quantization/gptq_marlin/gptq_marlin.cu).
- W4A8 (``ActQuantLinear`` with packed qweight): per-token dynamic int8
  activations x int4 weights on the MXU's native int8 path — 2.1x bf16
  measured; the XLA fallback emulates the same arithmetic exactly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vllm_trianglemix_tpu.ops.quantized_matmul import (
    kernel_supported,
    pack_int4,
    quantized_matmul,
    quantized_matmul_a8,
    unpack_int4,
)


class QuantLinear(NamedTuple):
    qweight: jnp.ndarray
    scale: jnp.ndarray
    zero: Optional[jnp.ndarray] = None


class ActQuantLinear(NamedTuple):
    """Quantized weight AND on-the-fly quantized activations.

    The distinct pytree type (vs QuantLinear) is what selects the
    activation-quantized matmul in apply_linear — no non-array flags in
    the tree. qweight int8 (INT8 W8A8, reference tpu_int8.py:19-117 +
    compressed-tensors int8), f8e4m3 (FP8 W8A8, reference
    fp8.py:71-1092), or packed uint8 int4 (W4A8, marlin_qqq role);
    scale f32 [.., G, Dout]. Activations get dynamic per-token symmetric
    int8/fp8 scales — the TPU-native equivalent of the reference's fused
    act-quant CUDA kernels.
    """

    qweight: jnp.ndarray
    scale: jnp.ndarray
    zero: Optional[jnp.ndarray] = None


# Pallas-kernel dispatch mode: "auto" uses the kernels on the TPU backend
# for single-device execution; the worker switches to "off" on multi-
# device meshes (a pallas_call can't be partitioned by the auto-SPMD
# pass; the XLA paths shard fine).
_KERNEL_MODE = "auto"


def set_kernel_mode(mode: str) -> None:
    global _KERNEL_MODE
    assert mode in ("auto", "on", "off"), mode
    _KERNEL_MODE = mode


def _kernels_on() -> bool:
    if _KERNEL_MODE == "on":
        return True
    if _KERNEL_MODE == "off":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001 (no backend yet)
        return False


def dequantize(w: QuantLinear, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Materialize the full-precision weight [.., Din, Dout]."""
    q = w.qweight
    if q.dtype == jnp.uint8:
        q = unpack_int4(q)
    qf = q.astype(jnp.float32)
    G = w.scale.shape[-2]
    din, dout = qf.shape[-2], qf.shape[-1]
    lead = qf.shape[:-2]
    qf = qf.reshape(*lead, G, din // G, dout)
    if w.zero is not None:
        qf = qf - w.zero[..., :, None, :]
    qf = qf * w.scale[..., :, None, :]
    return qf.reshape(*lead, din, dout).astype(dtype)


def _grouped_shapes(w) -> tuple[int, int, int]:
    packed = w.qweight.dtype == jnp.uint8
    din = w.qweight.shape[-2] * (2 if packed else 1)
    dout = w.qweight.shape[-1]
    return din, dout, din // w.scale.shape[-2]


def _rows(x: jnp.ndarray) -> int:
    n = 1
    for d in x.shape[:-1]:
        n *= d
    return n


def apply_linear(x: jnp.ndarray, w) -> jnp.ndarray:
    """x [.., Din] @ w -> [.., Dout]; w is dense, QuantLinear (weight-only)
    or ActQuantLinear (W8A8 / W4A8)."""
    if isinstance(w, ActQuantLinear):
        if w.qweight.dtype == jnp.uint8:
            return _apply_w4a8(x, w)
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
        if w.qweight.dtype == jnp.uint8 and w.qweight.ndim == 2 \
                and _kernels_on():
            din, dout, gs = _grouped_shapes(w)
            rows = _rows(x)
            if kernel_supported(rows, din, dout, gs, packed=True):
                y = quantized_matmul(x.reshape(rows, din), w.qweight,
                                     w.scale, w.zero)
                return y.reshape(*x.shape[:-1], dout)
        per_channel_sym = w.zero is None and w.scale.shape[-2] == 1 \
            and w.qweight.dtype == jnp.int8
        if per_channel_sym:
            # scale commutes with the contraction: (x @ q) * s. XLA
            # streams the int8 bytes here (measured 1.8x bf16 decode).
            y = jnp.dot(x, w.qweight.astype(x.dtype),
                        preferred_element_type=jnp.float32)
            return (y * w.scale[..., 0, :]).astype(x.dtype)
        if w.qweight.dtype == jnp.float8_e4m3fn:
            y = jnp.dot(x, w.qweight.astype(x.dtype),
                        preferred_element_type=jnp.float32)
            return (y * w.scale[..., 0, :]).astype(x.dtype)
        return x @ dequantize(w, x.dtype)
    return x @ w


def _apply_w4a8(x: jnp.ndarray, w: ActQuantLinear) -> jnp.ndarray:
    din, dout, gs = _grouped_shapes(w)
    rows = _rows(x)
    if (w.qweight.ndim == 2 and _kernels_on() and gs <= 128
            and kernel_supported(rows, din, dout, gs, packed=True)):
        y = quantized_matmul_a8(x.reshape(rows, din), w.qweight, w.scale,
                                w.zero)
        return y.reshape(*x.shape[:-1], dout)
    if rows > 256:
        # Prefill-sized GEMMs are MXU-bound: int8 activation quantization
        # buys nothing there (the weight stream is amortized over
        # thousands of rows), so run the plain bf16 dequant path — it is
        # also slightly MORE accurate than the decode path's int8
        # activations.
        return x @ dequantize(QuantLinear(w.qweight, w.scale, w.zero),
                              x.dtype)
    # XLA fallback (CPU tests, sharded meshes) emulating the kernel's
    # arithmetic: per-token int8 activations against the dequantized
    # weight in x.dtype (f32 test runs match the kernel's exact int math
    # ~1e-6).
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.maximum(absmax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(x.dtype)
    wd = dequantize(QuantLinear(w.qweight, w.scale, w.zero), x.dtype)
    y = jnp.dot(xq, wd, preferred_element_type=jnp.float32)
    return (y * x_scale).astype(x.dtype)


# --- quantize-at-load ---------------------------------------------------------

def quantize_int8(w: jnp.ndarray) -> QuantLinear:
    """Symmetric per-output-channel int8 (reference tpu_int8.py:19-117
    semantics: scale = absmax / 127 over the input axis)."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [.., 1, Dout]
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantLinear(qweight=q, scale=scale)


def _grouped_int4(w: jnp.ndarray, group_size: int):
    """Symmetric grouped signed-int4 values + scales (no zero point)."""
    wf = w.astype(jnp.float32)
    din, dout = wf.shape[-2], wf.shape[-1]
    lead = wf.shape[:-2]
    G = max(1, din // group_size)
    grouped = wf.reshape(*lead, G, din // G, dout)
    absmax = jnp.max(jnp.abs(grouped), axis=-2)            # [.., G, Dout]
    scale = jnp.maximum(absmax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(grouped / scale[..., :, None, :]), -8, 7)
    q = q.reshape(*lead, din, dout).astype(jnp.int8)
    return q, scale


def quantize_int4(w: jnp.ndarray, group_size: int = 128) -> QuantLinear:
    """Symmetric grouped signed int4, packed in the tile-halves layout."""
    q, scale = _grouped_int4(w, group_size)
    return QuantLinear(qweight=pack_int4(q), scale=scale)


def quantize_w4a8(w: jnp.ndarray, group_size: int = 128) -> ActQuantLinear:
    """W4A8: grouped signed-int4 weights + per-token dynamic int8
    activations (reference marlin_qqq / W4A8 compressed-tensors role).
    The fastest decode-GEMM mode on TPU: packed bytes stream while the
    MXU runs its native int8 path (2.1x bf16 measured at the headline
    decode shape)."""
    q, scale = _grouped_int4(w, group_size)
    return ActQuantLinear(qweight=pack_int4(q), scale=scale)


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
    "w4a8": quantize_w4a8,
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
