"""KV connectors: external KV-cache transfer / reuse.

Role of the reference's KVConnectorBase_V1 + SharedStorageConnector
(vllm/distributed/kv_transfer/kv_connector/v1/base.py; scheduler hooks at
sched/scheduler.py:81-93,343-407): a connector lets one engine reuse KV
computed elsewhere — prefill/decode disaggregation, cross-engine prefix
reuse, restarts. Split exactly like the reference:

- scheduler role: given a request's content-addressed block hashes, how
  many leading tokens exist externally? (``get_num_new_matched_tokens``)
- worker role: move the actual pages device<->store (``load_blocks`` /
  ``save_blocks``), carried per step as ops in SchedulerOutput.

``SharedStorageConnector`` stores one file per (block_hash) with the
block's KV for all layers — the simplest useful backend and the test
vehicle for the interface.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from vllm_trianglemix_tpu.logger import init_logger

logger = init_logger(__name__)


class KVConnectorBase:
    """Interface; scheduler-side methods are host-only and cheap."""

    # --- scheduler role -----------------------------------------------------
    def get_num_new_matched_tokens(self, block_hashes: list,
                                   num_computed_tokens: int,
                                   block_size: int) -> int:
        """Extra leading tokens available externally beyond the local
        prefix-cache hit."""
        return 0

    # --- worker role --------------------------------------------------------
    def load_block(self, block_hash_hex: str) -> Optional[np.ndarray]:
        """Fetch one block's KV [L, page, 2*KH, D] or None."""
        return None

    def save_block(self, block_hash_hex: str, kv: np.ndarray) -> None:
        pass

    def exists(self, block_hash_hex: str) -> bool:
        return False


class SharedStorageConnector(KVConnectorBase):
    """Filesystem-backed block store (reference SharedStorageConnector)."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)
        self.stats_loaded = 0
        self.stats_saved = 0

    def _file(self, h: str) -> str:
        return os.path.join(self.path, f"{h}.npy")

    def exists(self, h: str) -> bool:
        return os.path.exists(self._file(h))

    def get_num_new_matched_tokens(self, block_hashes, num_computed_tokens,
                                   block_size) -> int:
        start_block = num_computed_tokens // block_size
        n = 0
        for bh in block_hashes[start_block:]:
            if not self.exists(bh.hash_value.hex()):
                break
            n += 1
        return n * block_size

    def load_block(self, h: str) -> Optional[np.ndarray]:
        try:
            kv = np.load(self._file(h))
            self.stats_loaded += 1
            return kv
        except (OSError, ValueError):
            return None

    def save_block(self, h: str, kv: np.ndarray) -> None:
        f = self._file(h)
        if os.path.exists(f):
            return
        tmp = f[:-4] + ".tmp.npy"  # np.save keeps names ending in .npy
        np.save(tmp, kv)
        os.replace(tmp, f)
        self.stats_saved += 1


class CPUOffloadConnector(KVConnectorBase):
    """Host-RAM KV tier with an LRU byte budget.

    Role of the reference's CPU KV offloading (kv_offload /
    OffloadingConnector): evicted device blocks spill to host memory and
    flow back on prefix re-hit instead of being recomputed. TPU framing:
    the device->host hop rides the same per-block save/load ops the
    scheduler already emits for connectors; an LRU bound keeps the tier
    inside ``max_bytes`` of host RAM.
    """

    def __init__(self, max_bytes: int = 4 << 30) -> None:
        from collections import OrderedDict

        self.max_bytes = max_bytes
        self._store: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._bytes = 0
        self.stats_loaded = 0
        self.stats_saved = 0
        self.stats_evicted = 0

    def exists(self, h: str) -> bool:
        return h in self._store

    def get_num_new_matched_tokens(self, block_hashes, num_computed_tokens,
                                   block_size) -> int:
        start_block = num_computed_tokens // block_size
        n = 0
        for bh in block_hashes[start_block:]:
            if bh.hash_value.hex() not in self._store:
                break
            n += 1
        return n * block_size

    def load_block(self, h: str) -> Optional[np.ndarray]:
        kv = self._store.get(h)
        if kv is not None:
            self._store.move_to_end(h)  # LRU touch
            self.stats_loaded += 1
        return kv

    def save_block(self, h: str, kv: np.ndarray) -> None:
        if h in self._store:
            self._store.move_to_end(h)
            return
        self._store[h] = kv
        self._bytes += kv.nbytes
        self.stats_saved += 1
        while self._bytes > self.max_bytes and len(self._store) > 1:
            _, old = self._store.popitem(last=False)
            self._bytes -= old.nbytes
            self.stats_evicted += 1


_CPU_OFFLOAD_INSTANCES: dict = {}


def create_connector(config: Optional[dict]) -> Optional[KVConnectorBase]:
    if not config:
        return None
    kind = config.get("type")
    if kind == "shared_storage":
        return SharedStorageConnector(config["path"])
    if kind == "cpu_offload":
        # The store is host memory: the scheduler-side and worker-side
        # connector instances of one process must share it (the
        # filesystem plays that role for shared_storage).
        key = int(config.get("max_bytes", 4 << 30))
        if key not in _CPU_OFFLOAD_INSTANCES:
            _CPU_OFFLOAD_INSTANCES[key] = CPUOffloadConnector(key)
        return _CPU_OFFLOAD_INSTANCES[key]
    raise ValueError(f"unknown kv connector type {kind!r}")
