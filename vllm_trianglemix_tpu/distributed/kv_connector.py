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


def create_connector(config: Optional[dict]) -> Optional[KVConnectorBase]:
    if not config:
        return None
    kind = config.get("type")
    if kind == "shared_storage":
        return SharedStorageConnector(config["path"])
    raise ValueError(f"unknown kv connector type {kind!r}")
