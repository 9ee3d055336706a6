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


class P2PProducerConnector(CPUOffloadConnector):
    """Prefill-side of engine-to-engine KV transfer (reference
    NixlConnector / P2P connector role, kv_transfer/kv_connector/v1/
    nixl_connector.py — RDMA replaced by ZMQ over DCN/host network).

    Blocks the prefill engine fills are kept in a host-RAM LRU (the
    CPUOffloadConnector store) and served to decode engines from a ZMQ
    ROUTER: ("has", [hashes]) -> [bool], ("get", hash) -> block bytes.
    """

    def __init__(self, address: str, max_bytes: int = 4 << 30) -> None:
        super().__init__(max_bytes)
        import threading

        import zmq

        self.address = address
        self._ctx = zmq.Context()
        self._sock = self._ctx.socket(zmq.ROUTER)
        self._sock.bind(address)
        self._lock = threading.Lock()
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True,
                                        name="kv-p2p-server")
        self._thread.start()
        logger.info("P2P KV producer serving at %s", address)

    # LRU mutations come from the engine thread; serving from the server
    # thread — guard the shared store.
    def save_block(self, h: str, kv: np.ndarray) -> None:
        with self._lock:
            super().save_block(h, kv)

    def load_block(self, h: str):
        with self._lock:
            return super().load_block(h)

    def _serve(self) -> None:
        import pickle

        import zmq

        while not self._stop:
            try:
                if not self._sock.poll(200):
                    continue
                ident, _, raw = self._sock.recv_multipart()
                kind, payload = pickle.loads(raw)
                if kind == "has":
                    with self._lock:
                        reply = [h in self._store for h in payload]
                elif kind == "get":
                    with self._lock:
                        kv = self._store.get(payload)
                        if kv is not None:
                            self._store.move_to_end(payload)
                    reply = kv
                else:
                    reply = None
                self._sock.send_multipart(
                    [ident, b"", pickle.dumps(reply, protocol=5)])
            except zmq.ZMQError:
                if self._stop:
                    return
            except Exception:  # noqa: BLE001
                logger.exception("P2P KV server error")

    def close(self) -> None:
        self._stop = True
        self._thread.join(timeout=2)
        self._sock.close(0)
        self._ctx.term()


class P2PConsumerConnector(KVConnectorBase):
    """Decode-side: pull KV blocks from a prefill engine's producer over
    ZMQ. Misses and timeouts degrade to recompute (return 0 / None) —
    a dead producer must never wedge the decode engine."""

    def __init__(self, address: str, timeout_ms: int = 5000) -> None:
        import threading

        import zmq

        self.address = address
        self.timeout_ms = timeout_ms
        self._ctx = zmq.Context()
        self._lock = threading.Lock()
        self._sock = None
        self.stats_loaded = 0

    def _request(self, kind: str, payload):
        import pickle

        import zmq

        with self._lock:
            if self._sock is None:
                self._sock = self._ctx.socket(zmq.REQ)
                self._sock.connect(self.address)
            try:
                self._sock.send(pickle.dumps((kind, payload), protocol=5))
                if not self._sock.poll(self.timeout_ms):
                    # REQ is now stuck mid-conversation; replace it.
                    self._sock.close(0)
                    self._sock = None
                    logger.warning("P2P KV producer timeout (%s)", kind)
                    return None
                return pickle.loads(self._sock.recv())
            except zmq.ZMQError as e:
                logger.warning("P2P KV producer error: %s", e)
                self._sock.close(0)
                self._sock = None
                return None

    def get_num_new_matched_tokens(self, block_hashes, num_computed_tokens,
                                   block_size) -> int:
        start_block = num_computed_tokens // block_size
        hashes = [bh.hash_value.hex() for bh in block_hashes[start_block:]]
        if not hashes:
            return 0
        have = self._request("has", hashes)
        if not have:
            return 0
        n = 0
        for ok in have:
            if not ok:
                break
            n += 1
        return n * block_size

    def exists(self, h: str) -> bool:
        have = self._request("has", [h])
        return bool(have and have[0])

    def load_block(self, h: str):
        kv = self._request("get", h)
        if kv is not None:
            self.stats_loaded += 1
        return kv

    def save_block(self, h: str, kv: np.ndarray) -> None:
        # Decode-side blocks stay local; producers own the store.
        pass


_CPU_OFFLOAD_INSTANCES: dict = {}
_P2P_PRODUCER_INSTANCES: dict = {}


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
    if kind == "p2p":
        # Prefill/decode disaggregation (reference nixl/p2p connectors):
        # role "producer" serves filled blocks over ZMQ; role "consumer"
        # pulls them instead of recomputing the prefill.
        role = config.get("role")
        addr = config["address"]
        if role == "producer":
            # One server per address per process (scheduler- and
            # worker-side instances share the store, like cpu_offload).
            if addr not in _P2P_PRODUCER_INSTANCES:
                _P2P_PRODUCER_INSTANCES[addr] = P2PProducerConnector(
                    addr, int(config.get("max_bytes", 4 << 30)))
            return _P2P_PRODUCER_INSTANCES[addr]
        if role == "consumer":
            return P2PConsumerConnector(
                addr, int(config.get("timeout_ms", 5000)))
        raise ValueError(f"p2p connector role must be producer/consumer, "
                         f"got {role!r}")
    raise ValueError(f"unknown kv connector type {kind!r}")
