"""Pallas weight-dequantizing matmuls (the marlin/machete role on TPU).

Reference: vllm csrc/quantization/gptq_marlin/gptq_marlin.cu and
csrc/quantization/machete/ stream PACKED int4/int8 weights from global
memory and dequantize in registers so a memory-bound (decode) GEMM's
latency scales with the stored bytes, not the bf16 bytes. XLA already
does this for int8 on TPU (measured 1.7-1.8x bf16 at the decode shape
once the tunnel's ~25 ms dispatch cost is differenced out), but NOT for
packed int4 — sub-byte unpacking through the XLA path runs slower than
bf16. These kernels close that gap:

- ``quantized_matmul``  — W4A16/W8A16: bf16 activations, packed int4 /
  int8 / fp8 weights, per-group scales + optional zero points. The
  decode-shape ceiling is the VPU int8->bf16 weight convert (~14 us for
  a 13.8M-element weight), giving ~1.8x bf16.
- ``quantized_matmul_a8`` — W4A8: per-token dynamic int8 activations,
  packed int4 weights. Unpacking is pure i8 bit-ops (no converts) and
  the dots ride the MXU's native int8 path, so latency approaches the
  packed-byte DMA floor (~3x bf16 at the decode shape).

Int4 packing ("tile-halves", mixed encoding): K rows are cut into tiles
of TILE_K=256; packed byte row r of a tile holds unpacked row r in its
LOW nibble and row r+128 in its HIGH nibble, so unpacking never needs a
sublane interleave — each nibble plane is a contiguous 128-row block.
Mosaic legalizes only and/xor on i8 vectors (no shift/sub/mul), which
dictates the per-nibble encoding:

- low nibble stores q+8 (excess-8): ``bits & 0xF`` yields q+8 >= 0
  directly; the constant +8 bias is hoisted out of the kernel as
  ``8 * rowgroupsum(x) @ scale``.
- high nibble stores q as 4-bit two's complement: ``bits & 0xF0``
  reinterpreted as int8 is exactly 16*q; the 1/16 folds into the
  activation tile (A16) or the per-group scale epilogue (A8).

Group scales: w = (q - zero) * scale with scale/zero [G, N]. Each
128-row half-plane must not straddle a group boundary, so supported
group sizes are divisors of 128 and multiples of 256 (which includes
per-channel, group_size == K). Zero points are handled entirely outside
the kernel: x @ ((q-z)*s) = kernel_sym(x,q,s) - rowgroupsum(x) @ (z*s).

When K % 256 != 0 the whole matrix is one tile (pack/unpack only; the
kernels require K % 256 == 0 and callers fall back to the XLA path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_K = 256  # unpacked K rows per packed tile (two 128-row nibble planes)
HALF = TILE_K // 2


def _tile_k_for(total_k: int) -> int:
    return TILE_K if total_k % TILE_K == 0 else total_k


def pack_int4(q, xp=jnp):
    """SIGNED int4 values [.., K, N] (-8..7, int8) -> uint8 [.., K//2, N]
    in the tile-halves layout (low nibble excess-8, high nibble two's
    complement — see module docstring)."""
    k, n = q.shape[-2], q.shape[-1]
    assert k % 2 == 0, k
    tk = _tile_k_for(k)
    lead = q.shape[:-2]
    q8 = q.astype(xp.int8)
    qt = q8.reshape(*lead, k // tk, 2, tk // 2, n)
    lo = ((qt[..., 0, :, :] + 8) & 0xF).astype(xp.uint8)   # excess-8
    hi = (qt[..., 1, :, :] & 0xF).astype(xp.uint8)         # two's compl.
    return (lo | (hi << 4)).reshape(*lead, k // 2, n)


def unpack_int4(packed, xp=jnp):
    """Inverse of pack_int4: uint8 [.., K//2, N] -> int8 values [.., K, N]
    in -8..7."""
    kp, n = packed.shape[-2], packed.shape[-1]
    k = kp * 2
    tk = _tile_k_for(k)
    lead = packed.shape[:-2]
    pt = packed.reshape(*lead, k // tk, tk // 2, n)
    lo = (pt & 0xF).astype(xp.int8) - 8                    # excess-8
    hb = (pt >> 4).astype(xp.int8)
    hi = ((hb ^ 8) - 8).astype(xp.int8)                    # sign-extend
    planes = xp.stack([lo, hi], axis=-3)  # [.., k//tk, 2, tk//2, n]
    return planes.reshape(*lead, k, n).astype(xp.int8)


def _plane_schedule(group_size: int):
    """Static (plane_offset, plane_rows, scale_row) triples for one
    256-row tile. Planes are the contiguous nibble half-planes (or
    sub-slices of them when group_size < 128)."""
    if group_size <= 128:
        assert 128 % group_size == 0, group_size
        per_half = 128 // group_size
        return [(h * HALF + g * group_size, group_size, h * per_half + g)
                for h in (0, 1) for g in range(per_half)]
    assert group_size % TILE_K == 0, group_size
    # one scale row serves the whole tile (shared across tiles when the
    # group spans several); both half-planes read row offset 0.
    return [(0, HALF, 0), (HALF, HALF, 0)]


def _scale_row_base(k, group_size: int):
    if group_size <= 128:
        return k * (TILE_K // group_size)
    return k // (group_size // TILE_K)


def _unpack_planes_bf16(qw_ref):
    """Nibble planes as bf16: lo = (bits & 0xF) - 8; hi = 16*q (callers
    fold the 1/16 into the activation operand)."""
    r8 = pltpu.bitcast(qw_ref[...], jnp.int8)
    return {
        0: (r8 & 0xF).astype(jnp.bfloat16) - jnp.bfloat16(8),
        1: (r8 & -16).astype(jnp.bfloat16),
    }


def _qmm_kernel(x_ref, qw_ref, scale_ref, out_ref, acc_ref, *,
                packed: bool, group_size: int, per_channel: bool,
                out_dtype):
    """W4A16/W8A16 inner kernel: symmetric-scaled accumulation only (the
    zero-point and excess-8 bias terms are hoisted to the wrapper), one
    f32 multiply-add of [TB, TN] per plane."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    base = pl.multiple_of(k * TILE_K, TILE_K)
    scale_base = _scale_row_base(k, group_size)

    if not packed and group_size >= TILE_K:
        # int8/fp8 with the whole tile in one group: one [TB, 256] dot.
        qg = qw_ref[...].astype(jnp.bfloat16)
        xg = x_ref[:, pl.ds(base, TILE_K)]
        part = jnp.dot(xg, qg, preferred_element_type=jnp.float32)
        if per_channel:
            acc_ref[...] += part
        else:
            acc_ref[...] += part * scale_ref[pl.ds(scale_base, 1), :]
    else:
        planes = _unpack_planes_bf16(qw_ref) if packed else None
        acc = acc_ref[...]
        for offset, rows, srow in _plane_schedule(group_size):
            half = offset // HALF
            if packed:
                local = offset - half * HALF
                qg = planes[half][local:local + rows, :]
            else:
                qg = qw_ref[offset:offset + rows, :].astype(jnp.bfloat16)
            xg = x_ref[:, pl.ds(base + offset, rows)]
            # the hi plane carries 16*q; 1/16 rides on the tiny x tile
            xd = xg * jnp.bfloat16(0.0625) if (packed and half) else xg
            part = jnp.dot(xd, qg, preferred_element_type=jnp.float32)
            if per_channel:
                acc = acc + part
            else:
                acc = acc + part * scale_ref[pl.ds(scale_base + srow, 1), :]
        acc_ref[...] = acc

    @pl.when(k == nk - 1)
    def _():
        acc = acc_ref[...]
        if per_channel:
            acc = acc * scale_ref[0:1, :]
        out_ref[...] = acc.astype(out_dtype)


def _qmm_a8_kernel(x_ref, qw_ref, scale_ref, out_ref, acc_ref, *,
                   group_size: int):
    """W4A8 inner kernel: int8 activations x packed int4 weights. Nibble
    planes are pure i8 bit-ops (no VPU converts of the weight), dots run
    int8 x int8 -> int32 on the MXU's native int8 path. The low plane
    carries the +8 excess bias (hoisted by the wrapper); the high plane
    carries 16*q (1/16 folded into the scale here)."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    base = pl.multiple_of(k * TILE_K, TILE_K)
    scale_base = _scale_row_base(k, group_size)
    r8 = pltpu.bitcast(qw_ref[...], jnp.int8)
    planes = {0: r8 & 0xF, 1: r8 & -16}

    acc = acc_ref[...]
    for offset, rows, srow in _plane_schedule(group_size):
        half = offset // HALF
        local = offset - half * HALF
        qg = planes[half][local:local + rows, :]
        xg = x_ref[:, pl.ds(base + offset, rows)]
        part = jax.lax.dot_general(
            xg, qg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        s = scale_ref[pl.ds(scale_base + srow, 1), :]
        if half:
            s = s * jnp.float32(0.0625)
        acc = acc + part.astype(jnp.float32) * s
    acc_ref[...] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[...] = acc_ref[...]


_VMEM_BUDGET = 11 * 2**20


def _pick_tile_n(batch: int, din: int, dout: int, packed: bool) -> int:
    """Widest TN that fits the VMEM budget. TN == N keeps each weight
    block CONTIGUOUS in HBM — measured 574 GiB/s vs ~300 GiB/s for
    512-lane column tiles (strided 512 B DMA segments) at the decode
    shape, so prefer the full width and only split when VMEM forces it."""
    tb = min(256, -(-batch // 32) * 32)
    x_bytes = tb * din * 2
    wrow = (HALF if packed else TILE_K)
    for div in range(1, 33):
        if dout % div:
            continue
        tn = dout // div
        if tn % 128:
            continue
        use = 2 * wrow * tn + x_bytes + tb * tn * 4 + tb * tn * 2
        if use <= _VMEM_BUDGET:
            return tn
    return 0


def kernel_supported(batch: int, din: int, dout: int, group_size: int,
                     packed: bool = True, max_batch: int = 256) -> bool:
    """Static predicate: can the Pallas kernels serve this GEMM? Callers
    fall back to the XLA dequant path (compute-bound regime or awkward
    shapes) when False."""
    if batch > max_batch:
        return False
    if din % TILE_K != 0 or _pick_tile_n(batch, din, dout, packed) == 0:
        return False
    if group_size <= 128:
        return 128 % group_size == 0
    return group_size % TILE_K == 0


def _pallas_qmm(x, qweight, scale, kern_builder, out_dtype,
                interpret: bool):
    b, din = x.shape
    packed = qweight.dtype == jnp.uint8
    n = qweight.shape[1]
    groups = scale.shape[0]
    tn = _pick_tile_n(b, din, n, packed)
    tb = min(256, ((b + 31) // 32) * 32)
    pad_b = (-b) % tb
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0)))
    nb, nn, nk = (b + pad_b) // tb, n // tn, din // TILE_K

    in_specs = [
        # x row-block stays VMEM-resident across the whole (nn, nk) sweep
        # (index map ignores i/ki) so activations are fetched once while
        # the packed weight streams through.
        pl.BlockSpec((tb, din), lambda bi, i, ki: (bi, 0)),
        pl.BlockSpec((HALF if packed else TILE_K, tn),
                     lambda bi, i, ki: (ki, i)),
        # Scale rides as a full-row [G, TN] block (G is small); per-plane
        # rows are indexed dynamically in-kernel, sidestepping the
        # (8, 128) min-block constraint sub-8-row blocks would violate.
        pl.BlockSpec((groups, tn), lambda bi, i, ki: (0, i)),
    ]
    qbytes = qweight.size * qweight.dtype.itemsize
    out = pl.pallas_call(
        kern_builder,
        grid=(nb, nn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, tn), lambda bi, i, ki: (bi, i)),
        out_shape=jax.ShapeDtypeStruct((b + pad_b, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tb, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * din * n,
            bytes_accessed=qbytes + x.size * x.dtype.itemsize
            + b * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qweight, scale.astype(jnp.float32))
    return out[:b] if pad_b else out


def _group_rowsums(x, groups: int, group_size: int):
    b = x.shape[0]
    xs = x.astype(jnp.float32).reshape(b, groups, group_size)
    return xs.sum(axis=2)  # [B, G]


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantized_matmul(x: jnp.ndarray, qweight: jnp.ndarray,
                     scale: jnp.ndarray, zero: Optional[jnp.ndarray] = None,
                     *, interpret: bool = False) -> jnp.ndarray:
    """W4A16/W8A16: x [B, K] bf16/f32 @ dequant(qweight) -> [B, N].

    qweight: uint8 [K//2, N] tile-halves int4, or int8 / f8e4m3 [K, N].
    scale: f32 [G, N]; zero: f32 [G, N] or None (w = (q - zero) * scale,
    q the logical signed value).
    """
    b, k = x.shape
    packed = qweight.dtype == jnp.uint8
    din = qweight.shape[0] * 2 if packed else qweight.shape[0]
    n = qweight.shape[1]
    assert k == din, (x.shape, qweight.shape)
    groups = scale.shape[0]
    group_size = din // groups
    assert kernel_supported(b, din, n, group_size, packed,
                            max_batch=1 << 30), (b, din, n, group_size)

    kern = functools.partial(_qmm_kernel, packed=packed,
                             group_size=group_size,
                             per_channel=(groups == 1), out_dtype=x.dtype)
    y = _pallas_qmm(x, qweight, scale, kern, x.dtype, interpret)
    if zero is not None:
        # Asymmetric zero-point term, hoisted out of the kernel:
        # x @ ((q-z)*s) = kernel_sym(x, q, s) - rowgroupsum(x) @ (z*s).
        # (The packed low plane's excess-8 bias is already subtracted
        # in-kernel after the bf16 convert.)
        xs = _group_rowsums(x[:b], groups, group_size)
        zs = zero.astype(jnp.float32) * scale.astype(jnp.float32)
        y = y - jnp.dot(xs, zs,
                        preferred_element_type=jnp.float32).astype(y.dtype)
    return y


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantized_matmul_a8(x: jnp.ndarray, qweight: jnp.ndarray,
                        scale: jnp.ndarray,
                        zero: Optional[jnp.ndarray] = None,
                        *, interpret: bool = False) -> jnp.ndarray:
    """W4A8: per-token dynamic int8 activations x packed int4 weights.
    ~2x less VPU work than the A16 kernel (no weight converts) and int8
    MXU dots; use when W8A8-class activation quantization is acceptable
    (the engine's int8_w8a8 mode already embraces it)."""
    b, k = x.shape
    assert qweight.dtype == jnp.uint8, qweight.dtype
    din, n = qweight.shape[0] * 2, qweight.shape[1]
    assert k == din, (x.shape, qweight.shape)
    groups = scale.shape[0]
    group_size = din // groups
    assert kernel_supported(b, din, n, group_size, True,
                            max_batch=1 << 30), (b, din, n, group_size)
    assert group_size <= 128, \
        "W4A8 kernel supports group_size <= 128 (AWQ/GPTQ standard)"

    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    xsc = jnp.maximum(absmax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x / xsc), -127, 127).astype(jnp.int8)

    kern = functools.partial(_qmm_a8_kernel, group_size=group_size)
    y = _pallas_qmm(xq, qweight, scale, kern, jnp.float32, interpret)

    # Hoisted corrections in the int8 domain: +8 excess bias on low-plane
    # groups, and zero*scale for asymmetric quant.
    rows = np.arange(groups) * group_size
    lo_mask = (rows % TILE_K) < HALF
    sc = scale.astype(jnp.float32)
    coeff = jnp.where(jnp.asarray(lo_mask)[:, None], 8.0, 0.0) * sc
    if zero is not None:
        coeff = coeff + zero.astype(jnp.float32) * sc
    xs = _group_rowsums(xq, groups, group_size)
    y = y - jnp.dot(xs, coeff, preferred_element_type=jnp.float32)
    return (y * xsc).astype(x.dtype)
