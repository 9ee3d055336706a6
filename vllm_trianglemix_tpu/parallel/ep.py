"""Expert parallelism: MoE expert stacks sharded on the expert axis.

Role of the reference's expert-parallel FusedMoE path
(vllm/model_executor/layers/fused_moe, ``enable_expert_parallel`` in
config/parallel.py): place each device's subset of experts locally and
route tokens to the owning device. TPU-native design: the expert
weight stacks are sharded on the E axis over a mesh axis; inside a
``shard_map`` each shard computes routing (replicated — it is tiny),
takes its contiguous slice of the expert-sorted token rows (GShard-style
static per-shard capacity keeps shapes compile-time constant), runs the
local experts as a grouped GEMM (``lax.ragged_dot``), and the partial
token outputs merge with one ``psum`` over ICI.

Capacity: per-shard row budget C = ceil(capacity_factor * T * K / ep).
Tokens routed to a shard beyond its budget are dropped (standard
GShard/Switch behavior; routing is near-balanced in trained models).
``capacity_factor=None`` sets C = T*K — no drops, exact equivalence with
the single-device grouped GEMM (models/decoder.py:_moe_mlp) — the right
setting for verification and small meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from vllm_trianglemix_tpu.layers.common import silu_and_mul


def ep_partition_specs(ep_axis: str = "tp") -> dict:
    """PartitionSpecs for layer-stacked expert weights [L, E, ...]:
    shard the E axis (true expert placement) instead of the ffn axis."""
    return {
        "moe_gate": P(None, None, None),
        "gate_proj": P(None, ep_axis, None, None),
        "up_proj": P(None, ep_axis, None, None),
        "down_proj": P(None, ep_axis, None, None),
    }


def ep_moe_mlp(h: jnp.ndarray, lp: dict, cfg, mesh, *,
               ep_axis: str = "tp",
               capacity_factor: float | None = None,
               return_counts: bool = False):
    """Expert-parallel sparse-MoE MLP. Same contract as
    ``models/decoder.py:_moe_mlp`` (h [T, D] -> [T, D]); expert stacks in
    ``lp`` must be sharded on their E axis over ``ep_axis``.

    EPLB (parallel/eplb.py): when ``lp["eplb_map"]`` is present
    (int32[E], logical expert -> physical slot), routed expert ids pass
    through it before placement — the physical slot axis is what the
    shards own, so rebalancing is a weight permutation plus this map.
    ``return_counts=True`` additionally returns the LOGICAL per-expert
    token counts int32[E] for the balancer.

    Routing runs once, replicated, outside the shard_map (it is tiny);
    each shard only slices its contiguous capacity window of the
    expert-sorted rows and runs the local grouped GEMM.
    """
    ep = mesh.shape[ep_axis]
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    if E % ep != 0:
        raise ValueError(f"num_experts={E} not divisible by ep={ep}")
    El = E // ep
    T, D = h.shape
    TK = T * K
    if capacity_factor is None:
        C = TK
    else:
        C = min(TK, -(-int(capacity_factor * TK) // ep))
        C = -(-C // 8) * 8  # pad to sublane multiple

    # --- routing (replicated) -------------------------------------------------
    logits = (h @ lp["moe_gate"]).astype(jnp.float32)    # [T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, K)                 # [T, K]
    if cfg.norm_topk_prob:
        topv = topv / jnp.maximum(topv.sum(-1, keepdims=True), 1e-20)
    counts = jnp.bincount(topi.reshape(-1), length=E).astype(jnp.int32)
    emap = lp.get("eplb_map")
    if emap is not None:
        topi = emap[topi]                                # logical -> slot

    flat_e = topi.reshape(-1)                            # [TK]
    order = jnp.argsort(flat_e, stable=True)             # slot-major
    token_of = (order // K).astype(jnp.int32)
    w_sorted = topv.reshape(-1)[order]
    sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)
    csum = jnp.cumsum(sizes)

    def local_moe(h, token_of, w_sorted, sizes, csum, wg, wu, wd):
        # wg/wu/wd are the local expert slices [El, D, F] / [El, F, D].
        my = jax.lax.axis_index(ep_axis)
        lo = my * El                                     # first local expert
        start = jnp.where(lo == 0, 0, csum[jnp.maximum(lo - 1, 0)])
        n_local = csum[lo + El - 1] - start

        # Local group sizes, capped so their sum fits the capacity C;
        # rows past a group's cap are dropped (never with
        # capacity_factor=None, where C = TK >= n_local always).
        ls = jax.lax.dynamic_slice(sizes, (lo,), (El,))
        lcum = jnp.minimum(jnp.cumsum(ls), C)
        ls_capped = jnp.diff(lcum, prepend=0).astype(jnp.int32)

        # Slice my C rows out of the globally sorted row list; pad by C
        # so the dynamic_slice never clamps near the end.
        pad = jnp.zeros(C, jnp.int32)
        tok_loc = jax.lax.dynamic_slice(
            jnp.concatenate([token_of, pad]), (start,), (C,))
        w_loc = jax.lax.dynamic_slice(
            jnp.concatenate([w_sorted, pad.astype(jnp.float32)]),
            (start,), (C,))
        valid = jnp.arange(C) < jnp.minimum(n_local, C)

        xs = h[tok_loc]                                  # [C, D]
        gated = jax.lax.ragged_dot(xs, wg, ls_capped)
        up = jax.lax.ragged_dot(xs, wu, ls_capped)
        ys = jax.lax.ragged_dot(silu_and_mul(gated, up), wd, ls_capped)
        contrib = ys.astype(jnp.float32) * jnp.where(valid, w_loc, 0.0)[:, None]
        acc = jax.ops.segment_sum(contrib, tok_loc, num_segments=T)
        return jax.lax.psum(acc, ep_axis)                # [T, D] f32

    fn = shard_map(
        local_moe,
        mesh=mesh,
        in_specs=(P(None, None), P(None), P(None), P(None), P(None),
                  P(ep_axis, None, None), P(ep_axis, None, None),
                  P(ep_axis, None, None)),
        out_specs=P(None, None),
        check_vma=False,
    )
    out = fn(h, token_of, w_sorted, sizes, csum, lp["gate_proj"],
             lp["up_proj"], lp["down_proj"])
    out = out.astype(h.dtype)
    if return_counts:
        return out, counts
    return out
