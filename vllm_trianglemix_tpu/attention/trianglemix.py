"""TriangleMix structured-sparse attention masks — the real implementation.

Semantics are an exact, vectorized re-derivation of the reference fork's
prototype (reference vllm/attention/trianglemix_attention.py:53-219, which
builds the same masks with O(N²) Python loops on CPU):

For causal attention over N tokens, sink size ``si``, window ``sl``, last
region ``last`` (query index i, key index j, both 0-based, i >= j):

- streaming[i,j] = (j <= si) or (i - j <= sl)            # sink + window
  (note: ``j <= si`` keeps si+1 sink tokens — reference quirk kept as-is,
   trianglemix_attention.py:84-89)
- last[i,j]      = (N - i < last) and (j > si) and (i - j > sl)
- middle[i,j]    = (N - i >= last) and (j > si) and (i - j > sl)
- triangle       = streaming | last        (middle Q-K is dropped)

Unlike the reference — where the mask is computed but never reaches the
attention backend (models/qwen3.py:176-189) — these rules are fused into the
paged-attention Pallas kernel at *block* granularity: whole KV blocks in the
middle region are skipped (never read from HBM), blocks on the boundary get
an exact per-token mask. See ops/ragged_paged_attention.py.

Chunked-prefill/decode semantics: the triangle pattern is defined over the
prompt of length N. Decode tokens (i >= N) land in the last-region
(N_total - i < last for any growing N_total), i.e. decode is always dense —
matching the reference, which only masks prefill.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.config import TriangleMixConfig

NEG_INF = float("-inf")
# NPU/TPU-safe large-negative replacement for -inf in additive masks
# (reference ascend_trianglemix.py:114-141 uses -1e6/-1e9 because hardware
# softmax misbehaves on -inf; XLA handles -inf fine, but fp-safe masking in
# bf16 kernels uses this value).
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


# --- exact token-level masks (bool, True = attend) --------------------------

def streaming_mask(seq_len: int, cfg: TriangleMixConfig) -> jnp.ndarray:
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    causal = i >= j
    return causal & ((j <= cfg.num_sink_tokens)
                     | (i - j <= cfg.sliding_window_size))


def last_mask(seq_len: int, cfg: TriangleMixConfig) -> jnp.ndarray:
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    causal = i >= j
    return (causal & (seq_len - i < cfg.num_last_tokens)
            & (j > cfg.num_sink_tokens)
            & (i - j > cfg.sliding_window_size))


def middle_mask(seq_len: int, cfg: TriangleMixConfig) -> jnp.ndarray:
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    causal = i >= j
    return (causal & (seq_len - i >= cfg.num_last_tokens)
            & (j > cfg.num_sink_tokens)
            & (i - j > cfg.sliding_window_size))


def triangle_mask(seq_len: int, cfg: TriangleMixConfig) -> jnp.ndarray:
    return streaming_mask(seq_len, cfg) | last_mask(seq_len, cfg)


def dense_causal_mask(seq_len: int) -> jnp.ndarray:
    return jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool))


def to_additive(mask: jnp.ndarray, dtype=jnp.float32,
                mask_value: float = NEG_INF) -> jnp.ndarray:
    """bool mask → additive (0 / -inf) form (reference :242-261)."""
    return jnp.where(mask, jnp.zeros((), dtype), jnp.full((), mask_value, dtype))


def get_layer_mask(seq_len: int, layer_idx: int,
                   cfg: TriangleMixConfig) -> jnp.ndarray | None:
    """Per-layer mask policy (reference TriangleMixAttention.get_attn_mask):
    None => dense attention (short sequences or non-triangle layers)."""
    if seq_len <= cfg.dense_threshold:
        return None
    if not cfg.layer_uses_triangle(layer_idx):
        return None
    return triangle_mask(seq_len, cfg)


def attention_density(seq_len: int, cfg: TriangleMixConfig) -> float:
    """Fraction of causal score entries kept by the triangle pattern
    (the reference claims ~4x reduction at N=4096,
    TRIANGLEMIX_QUICK_REFERENCE.md:260-276)."""
    tri = int(np.asarray(triangle_mask(seq_len, cfg)).sum())
    dense = seq_len * (seq_len + 1) // 2
    return tri / dense


# --- block-level classification for the Pallas kernel -----------------------

class BlockKind(IntEnum):
    SKIP = 0      # fully masked: never load the KV block
    PARTIAL = 1   # boundary: load + apply exact per-token mask
    FULL = 2      # fully visible and strictly causal: no mask math


def classify_block(q_start: int, q_end: int, k_start: int, k_end: int,
                   prompt_len: int, cfg: TriangleMixConfig,
                   triangle: bool = True) -> BlockKind:
    """Classify one (query rows [q_start,q_end) × key cols [k_start,k_end))
    tile of the attention matrix under the triangle (or plain causal) rule.

    Exact skip test; the FULL test uses sufficient conditions only (a
    mixed-coverage tile is conservatively PARTIAL — correct, just not the
    fast path).
    """
    si, sl, last = (cfg.num_sink_tokens, cfg.sliding_window_size,
                    cfg.num_last_tokens)
    q_hi, k_hi = q_end - 1, k_end - 1

    # Entirely above the diagonal → nothing visible.
    if k_start > q_hi:
        return BlockKind.SKIP

    if triangle:
        # any-visible: some causal (i, j) with (j<=si) | (i-j<=sl) | (N-i<last)
        any_sink = k_start <= si
        any_window = q_start - k_hi <= sl  # closest causal pair within window
        any_last = q_hi >= prompt_len - last  # some query row in last region
        if not (any_sink or any_window or any_last):
            return BlockKind.SKIP

    fully_causal = q_start >= k_hi
    if not fully_causal:
        return BlockKind.PARTIAL

    if not triangle:
        return BlockKind.FULL

    # all-visible sufficient conditions:
    all_sink = k_hi <= si
    all_window = (q_hi - k_start) <= sl
    all_last = q_start > prompt_len - last  # N - i < last for every row
    if all_sink or all_window or all_last:
        return BlockKind.FULL
    return BlockKind.PARTIAL


def build_block_map(prompt_len: int, block_q: int, block_k: int,
                    cfg: TriangleMixConfig,
                    triangle: bool = True) -> np.ndarray:
    """Dense (num_q_blocks, num_k_blocks) int8 map of BlockKind — the
    host-side input to the sparse prefill kernel. O((N/B)²) tiny ints,
    analogous to the reference's Ascend block mask
    (ascend_npu_trianglemix.py:80-124) but derived from the *exact*
    token-level rule instead of dividing parameters by the block size."""
    nq = -(-prompt_len // block_q)
    nk = -(-prompt_len // block_k)
    out = np.empty((nq, nk), dtype=np.int8)
    for qi in range(nq):
        qs, qe = qi * block_q, min((qi + 1) * block_q, prompt_len)
        for ki in range(nk):
            ks, ke = ki * block_k, min((ki + 1) * block_k, prompt_len)
            out[qi, ki] = classify_block(qs, qe, ks, ke, prompt_len, cfg,
                                         triangle)
    return out


def token_mask_for_tile(q_start: int, k_start: int, block_q: int,
                        block_k: int, prompt_len: int,
                        cfg: TriangleMixConfig,
                        triangle: bool = True) -> jnp.ndarray:
    """Exact per-token bool mask for a PARTIAL tile (used inside kernels;
    shapes are static, positions passed as traced scalars are fine)."""
    i = q_start + jnp.arange(block_q)[:, None]
    j = k_start + jnp.arange(block_k)[None, :]
    causal = i >= j
    if not triangle:
        return causal
    si, sl, last = (cfg.num_sink_tokens, cfg.sliding_window_size,
                    cfg.num_last_tokens)
    visible = ((j <= si) | (i - j <= sl) | (prompt_len - i < last))
    return causal & visible


# --- offline layer selection (reference TriangleMixAnalyzer :344-409) -------

@dataclass
class _LayerStats:
    grads: list[float]


class TriangleMixAnalyzer:
    """Gradient-based triangle-layer selection.

    Record the mean |gradient| (or any contribution score) of the middle-Q-K
    score region per layer over calibration batches; the layers with the
    lowest mean middle contribution are the safest to sparsify
    (reference trianglemix_attention.py:344-409; the docs note these are
    usually the upper layers, TRIANGLEMIX_INTEGRATION.md).
    """

    def __init__(self, num_layers: int) -> None:
        self.num_layers = num_layers
        self._stats = [_LayerStats([]) for _ in range(num_layers)]

    def record_middle_qk_gradient(self, layer_idx: int, value) -> None:
        if 0 <= layer_idx < self.num_layers:
            self._stats[layer_idx].grads.append(float(jnp.mean(value)))

    def record_from_scores(self, layer_idx: int, scores: jnp.ndarray,
                           cfg: TriangleMixConfig) -> None:
        """Convenience: record mean |score| over the middle region from a raw
        (..., N, N) pre-softmax score tensor."""
        n = scores.shape[-1]
        region = middle_mask(n, cfg)
        denom = jnp.maximum(region.sum(), 1)
        val = jnp.where(region, jnp.abs(scores), 0.0).sum(axis=(-2, -1)) / denom
        self.record_middle_qk_gradient(layer_idx, jnp.mean(val))

    def get_triangle_layers(self, num_triangle_layers: int) -> list[int]:
        avgs = []
        for idx, st in enumerate(self._stats):
            avg = (sum(st.grads) / len(st.grads)) if st.grads else float("inf")
            avgs.append((idx, avg))
        avgs.sort(key=lambda x: x[1])
        return sorted(idx for idx, _ in avgs[:num_triangle_layers])

    def reset(self) -> None:
        self._stats = [_LayerStats([]) for _ in range(self.num_layers)]
