"""EPLB: expert-parallel load balancing.

Role of the reference's EPLB subsystem (vllm/distributed/eplb/
eplb_state.py, rebalance_algo.py, rebalance_execute.py): track how many
tokens route to each expert, periodically compute a better
expert→device placement, and physically shuffle the expert weights to
match.

TPU-native shape: the EP path (parallel/ep.py) shards the PHYSICAL slot
axis of the expert stacks contiguously over the mesh; a placement is a
permutation ``P`` (slot j holds logical expert P[j]) and routing passes
logical ids through ``eplb_map = inv(P)`` stored alongside the layer
weights. Rebalancing is therefore:

1. greedy LPT packing of logical experts into equal-size shard bins by
   measured load (``balanced_placement``);
2. ONE jitted gather on the E axis of each expert stack
   (``w[:, mapping]``) — on a sharded array XLA lowers this to the
   all-to-all weight exchange the reference implements by hand with
   point-to-point NCCL;
3. rewriting the per-layer eplb_map.

Counts use LOGICAL expert ids, so accumulated stats stay valid across
rebalances.
"""

from __future__ import annotations

import numpy as np

from vllm_trianglemix_tpu.logger import init_logger

logger = init_logger(__name__)


def balanced_placement(loads: np.ndarray, ep: int) -> np.ndarray:
    """Greedy longest-processing-time packing of E logical experts into
    ``ep`` bins of exactly E/ep slots each (reference
    rebalance_algo.py:rebalance_experts role, replication factor 1).

    Returns placement P int32[E]: slot j (shard j // (E/ep)) holds
    logical expert P[j]. Heaviest experts are spread across shards
    first; within a shard, slots fill in load order (keeps each shard's
    groups contiguous for the grouped GEMM)."""
    E = len(loads)
    assert E % ep == 0
    per = E // ep
    order = np.argsort(-np.asarray(loads, np.float64), kind="stable")
    bin_load = np.zeros(ep, np.float64)
    bin_fill = np.zeros(ep, np.int64)
    placement = np.empty(E, np.int32)
    for e in order:
        # least-loaded bin with a free slot
        open_bins = np.flatnonzero(bin_fill < per)
        b = open_bins[np.argmin(bin_load[open_bins])]
        placement[b * per + bin_fill[b]] = e
        bin_fill[b] += 1
        bin_load[b] += loads[e]
    return placement


def inverse_permutation(p: np.ndarray) -> np.ndarray:
    inv = np.empty_like(p)
    inv[p] = np.arange(len(p), dtype=p.dtype)
    return inv


def shuffle_mapping(old_placement: np.ndarray,
                    new_placement: np.ndarray) -> np.ndarray:
    """Gather indices m so that w_new[:, j] = w_old[:, m[j]] realizes the
    new placement from weights stored under the old one."""
    return inverse_permutation(old_placement)[new_placement]


class EplbState:
    """Host-side load accumulator + rebalance trigger (reference
    eplb_state.py). Counts arrive per MoE layer per step (logical ids);
    shard load = sum over its slots."""

    def __init__(self, num_experts: int, ep: int,
                 interval: int = 256) -> None:
        self.E = num_experts
        self.ep = ep
        self.interval = interval
        self.counts = np.zeros(num_experts, np.int64)
        self.placement = np.arange(num_experts, dtype=np.int32)
        self.steps_since = 0
        self.num_rebalances = 0

    def accumulate(self, counts) -> None:
        self.counts += np.asarray(counts, np.int64)

    def shard_loads(self, placement: np.ndarray | None = None) -> np.ndarray:
        p = self.placement if placement is None else placement
        per = self.E // self.ep
        return self.counts[p].reshape(self.ep, per).sum(axis=1)

    def step(self) -> bool:
        """Advance the step counter; True when a rebalance is due."""
        self.steps_since += 1
        return (self.steps_since >= self.interval
                and int(self.counts.sum()) > 0)

    def rebalance(self) -> tuple[np.ndarray, np.ndarray] | None:
        """Compute (new_placement, weight gather mapping), or None if the
        current placement is already balanced. Decays history so the
        balancer tracks shifting traffic."""
        new_p = balanced_placement(self.counts, self.ep)
        old_max = float(self.shard_loads().max())
        new_max = float(self.shard_loads(new_p).max())
        self.steps_since = 0
        self.counts //= 2  # exponential decay of history
        if new_max >= old_max * 0.999:
            return None
        mapping = shuffle_mapping(self.placement, new_p)
        self.placement = new_p
        self.num_rebalances += 1
        logger.info("EPLB rebalance #%d: max shard load %.0f -> %.0f",
                    self.num_rebalances, old_max, new_max)
        return new_p, mapping
