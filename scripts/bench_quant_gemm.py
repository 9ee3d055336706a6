#!/usr/bin/env python
"""Quantized-GEMM bandwidth benchmark (VERDICT r4 next #1).

Measures the decode-shape (memory-bound) GEMM latency of every weight
format at the headline-bench down_proj shape, plus the prefill shape for
context. The Pallas dequant-GEMM kernels (ops/quantized_matmul.py, the
marlin/machete role) are compared against the XLA paths and bf16.

MEASUREMENT METHOD (round-5 correction): a single dispatch over the
axon tunnel costs ~25 ms regardless of device work, so timing one
N-iteration chain measures `fixed + N*dt` — at N=100 the fixed cost
dominates and every format reads ~280 us/iter (this polluted the round-4
conclusion that "int8 is ~1.0x bf16"; it is actually ~1.8x). The harness
therefore times chains of N1 and N2 iterations and reports
(T(N2) - T(N1)) / (N2 - N1), best-of-5, which cancels the fixed cost.

Round-5 v5e results at the decode shape (B=32, 8960x1536):
  bf16      ~39 us  (654 GiB/s — at the HBM roofline)
  int8-xla  ~22 us  1.8x  (XLA streams int8 fine; no kernel needed)
  int4-a16  ~23 us  1.7x  (Pallas kernel; VPU i8->bf16 convert bound)
  w4a8      ~19 us  2.1x  (Pallas kernel; int8 MXU, no weight converts)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.ops.quantized_matmul import (
    pack_int4,
    quantized_matmul,
    quantized_matmul_a8,
)
from vllm_trianglemix_tpu.quantization.linear import (
    ActQuantLinear,
    QuantLinear,
    apply_linear,
)

# Qwen2.5-1.5B down_proj shape (the headline bench model): the wide-in
# narrow-out direction keeps the per-iteration feedback pass (O(B*DOUT))
# tiny relative to the weight stream (O(DIN*DOUT)).
DIN, DOUT = 8960, 1536
N1, N2 = 200, 1000


def make_weights(rng):
    wf = rng.standard_normal((DIN, DOUT)).astype(np.float32) * 0.02
    dense = jnp.asarray(wf, jnp.bfloat16)
    s8 = np.abs(wf).max(axis=0, keepdims=True) / 127.0
    q8 = np.clip(np.round(wf / s8), -127, 127).astype(np.int8)
    int8 = QuantLinear(jnp.asarray(q8),
                       jnp.asarray(s8.reshape(1, DOUT), jnp.float32))
    # int4: group-of-128 asymmetric (AWQ-style), signed storage
    G = DIN // 128
    wg = wf.reshape(G, 128, DOUT)
    lo, hi = wg.min(axis=1), wg.max(axis=1)
    s4 = np.maximum((hi - lo) / 15.0, 1e-8)
    z4 = -lo / s4 - 8.0                          # signed zero point
    q4 = np.clip(np.round(wg / s4[:, None, :] + (z4 + 8.0)[:, None, :]),
                 0, 15).astype(np.int16) - 8     # signed values
    packed = pack_int4(jnp.asarray(q4.reshape(DIN, DOUT).astype(np.int8)))
    s4j, z4j = jnp.asarray(s4), jnp.asarray(z4)
    w8a8 = ActQuantLinear(jnp.asarray(q8),
                          jnp.asarray(s8.reshape(1, DOUT), jnp.float32))
    return {
        "bf16": (lambda c: jnp.dot(
            c, dense, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16), 2.0),
        "int8-xla": (lambda c: apply_linear(c, int8), 1.0),
        "int4-a16": (lambda c: quantized_matmul(c, packed, s4j, z4j), 0.5),
        "w4a8": (lambda c: quantized_matmul_a8(c, packed, s4j, z4j), 0.5),
        "w8a8": (lambda c: apply_linear(c, w8a8), 1.0),
    }


def chain(apply, iters):
    """One dispatch: a lax.scan chain of dependent matmuls. The feedback
    is a nonlinear reduction of the FULL output so XLA can't slice/fold
    the weight."""

    @jax.jit
    def loop(x):
        def body(c, _):
            y = apply(c)
            fb = jnp.max(jnp.abs(y.astype(jnp.float32)), -1, keepdims=True)
            return c + (fb * 1e-6).astype(c.dtype), None

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    return loop


def bench(apply, batch):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, DIN)),
        jnp.bfloat16)

    def t(loop):
        float(loop(x)[0, 0])                 # compile + settle
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            # A scalar FETCH is the only reliable completion barrier over
            # the remote-TPU tunnel (block_until_ready returns early).
            float(loop(x)[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(chain(apply, N2)) - t(chain(apply, N1))) / (N2 - N1)


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    weights = make_weights(rng)
    for batch, label in ((32, "decode (memory-bound)"),
                         (1024, "prefill chunk (MXU-bound)")):
        print(f"\n== batch {batch} — {label} ==")
        base = None
        for name, (apply, bpw) in weights.items():
            try:
                dt = bench(apply, batch)
            except Exception as e:  # noqa: BLE001 (kernel shape limits)
                print(f"{name:9s}: skipped ({str(e)[:60]})")
                continue
            nbytes = DIN * DOUT * bpw
            if base is None:
                base = dt
            print(f"{name:9s}: {dt * 1e6:7.1f} us  "
                  f"{nbytes / dt / 2**30:7.1f} GiB/s weight-stream  "
                  f"speedup vs bf16 {base / dt:4.2f}x")


if __name__ == "__main__":
    main()
