"""KV cache event publishing.

Role of the reference's vllm/distributed/kv_events.py: a ZMQ PUB socket
broadcasts block-stored / block-removed events so external routers
(prefix-cache-aware load balancers) can steer requests to engines that
already hold their prefixes. Events carry the content hash chain, so
subscribers never see raw tokens.
"""

from __future__ import annotations

import json
import time
from typing import Optional

from vllm_trianglemix_tpu.logger import init_logger

logger = init_logger(__name__)


class KVEventPublisher:

    def __init__(self, endpoint: str = "tcp://127.0.0.1:5557",
                 topic: str = "kv-events") -> None:
        import zmq

        self.topic = topic.encode()
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.PUB)
        if endpoint.endswith(":0"):
            base = endpoint[:-2]
            port = self.sock.bind_to_random_port(base)
            endpoint = f"{base}:{port}"
        else:
            self.sock.bind(endpoint)
        self.endpoint = endpoint
        self._seq = 0
        logger.info("KV event publisher on %s", endpoint)

    def _publish(self, payload: dict) -> None:
        self._seq += 1
        payload["seq"] = self._seq
        payload["ts"] = time.time()
        self.sock.send_multipart([self.topic,
                                  json.dumps(payload).encode()])

    def blocks_stored(self, block_hashes: list[str],
                      parent_hash: Optional[str] = None) -> None:
        self._publish({"type": "block_stored",
                       "block_hashes": block_hashes,
                       "parent_block_hash": parent_hash})

    def blocks_removed(self, block_hashes: list[str]) -> None:
        self._publish({"type": "block_removed",
                       "block_hashes": block_hashes})

    def all_blocks_cleared(self) -> None:
        self._publish({"type": "all_blocks_cleared"})

    def close(self) -> None:
        self.sock.close(0)
