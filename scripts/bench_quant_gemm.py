#!/usr/bin/env python
"""Quantized-GEMM bandwidth benchmark (VERDICT r3 weak #4 / next #6).

Question: does XLA really fuse dequantization into the matmul operand
read so a weight-only int8/int4 matmul streams the QUANTIZED bytes from
HBM (the job of the reference's marlin/machete CUDA kernels,
csrc/quantization/), or does it materialize the dequantized matrix?

Method: time apply_linear at the headline-bench decode shape (batch 32,
memory-bound — latency tracks HBM bytes) and prefill shape (batch 8192,
MXU-bound) for bf16 dense vs int8 / packed-int4 weight-only vs int8
W8A8, on the real chip. Inputs vary per iteration and a scalar is
force-fetched (TPU result caching). If dequant fuses, decode latency
should scale with the stored bytes: int8 ~2x faster than bf16, int4
~4x.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.quantization.linear import (
    ActQuantLinear,
    QuantLinear,
    apply_linear,
)

# Qwen2.5-1.5B down_proj shape (the headline bench model): the wide-in
# narrow-out direction keeps the per-iteration feedback pass (O(B*DOUT))
# tiny relative to the weight stream (O(DIN*DOUT)), so decode latency
# actually tracks HBM weight bytes.
DIN, DOUT = 8960, 1536
ITERS = 100


def make_weights(rng):
    wf = rng.standard_normal((DIN, DOUT)).astype(np.float32) * 0.02
    dense = jnp.asarray(wf, jnp.bfloat16)
    s8 = np.abs(wf).max(axis=0, keepdims=True) / 127.0
    q8 = np.clip(np.round(wf / s8), -127, 127).astype(np.int8)
    int8 = QuantLinear(jnp.asarray(q8),
                       jnp.asarray(s8.reshape(1, DOUT), jnp.float32))
    # int4: group-of-128 asymmetric, packed two nibbles per byte
    G = DIN // 128
    wg = wf.reshape(G, 128, DOUT)
    lo, hi = wg.min(axis=1), wg.max(axis=1)
    s4 = np.maximum((hi - lo) / 15.0, 1e-8)
    z4 = -lo / s4
    q4 = np.clip(np.round(wg / s4[:, None, :] + z4[:, None, :]), 0,
                 15).astype(np.uint8).reshape(DIN, DOUT)
    packed = (q4[0::2] | (q4[1::2] << 4)).astype(np.uint8)
    # interleave back: byte b holds rows 2b (low), 2b+1 (high)
    int4 = QuantLinear(jnp.asarray(packed),
                       jnp.asarray(s4, jnp.float32),
                       jnp.asarray(z4, jnp.float32))
    w8a8 = ActQuantLinear(jnp.asarray(q8),
                          jnp.asarray(s8.reshape(1, DOUT), jnp.float32))
    return {"bf16": dense, "int8": int8, "int4": int4, "w8a8": w8a8}


def bench(name, w, batch):
    """One dispatch: a lax.scan chain of ITERS dependent matmuls, so the
    per-call tunnel/dispatch overhead of the remote TPU doesn't pollute
    the device-time measurement."""

    @jax.jit
    def loop(x, w):
        def body(c, _):
            y = apply_linear(c, w)
            # Chain through a nonlinear reduction of the FULL output:
            # a linear feedback lets XLA slice/fold the weight (it
            # computed only the fed-back columns in an earlier version
            # of this script — 10 TB/s "bandwidth").
            # abs-max is cheap on the VPU but can't be folded through
            # the matmul, so the full output (and weight read) stays.
            fb = jnp.max(jnp.abs(y.astype(jnp.float32)), -1,
                         keepdims=True)
            return c + (fb * 1e-6).astype(c.dtype), None

        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, DIN)),
        jnp.bfloat16)
    float(loop(x, w)[0, 0])                  # compile + settle
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        # A scalar FETCH is the only reliable completion barrier over
        # the remote-TPU tunnel (block_until_ready returns early); the
        # tunnel round-trip amortizes over ITERS chained matmuls.
        float(loop(x, w)[0, 0])
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def stored_bytes(w):
    if isinstance(w, (QuantLinear, ActQuantLinear)):
        return sum(np.prod(a.shape) * a.dtype.itemsize
                   for a in w if a is not None)
    return np.prod(w.shape) * w.dtype.itemsize


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    weights = make_weights(rng)
    for batch, label in ((32, "decode (memory-bound)"),
                         (8192, "prefill (MXU-bound)")):
        print(f"\n== batch {batch} — {label} ==")
        base = None
        for name, w in weights.items():
            dt = bench(name, w, batch)
            mb = stored_bytes(w) / 2**20
            if base is None:
                base = dt
            gbps = stored_bytes(w) / dt / 2**30
            print(f"{name:5s}: {dt * 1e6:8.1f} us  stored {mb:6.1f} MiB  "
                  f"{gbps:6.1f} GiB/s weight-stream  "
                  f"speedup vs bf16 {base / dt:4.2f}x")


if __name__ == "__main__":
    main()
