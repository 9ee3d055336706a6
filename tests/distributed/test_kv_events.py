"""KV event publisher: ZMQ pub/sub roundtrip."""

import json
import time

import zmq

from vllm_trianglemix_tpu.distributed.kv_events import KVEventPublisher


def test_publish_and_subscribe():
    pub = KVEventPublisher(endpoint="tcp://127.0.0.1:0")
    ctx = zmq.Context.instance()
    sub = ctx.socket(zmq.SUB)
    sub.connect(pub.endpoint)
    sub.setsockopt(zmq.SUBSCRIBE, b"kv-events")
    time.sleep(0.3)  # pub/sub join

    pub.blocks_stored(["aa", "bb"], parent_hash=None)
    pub.blocks_removed(["aa"])
    pub.all_blocks_cleared()

    msgs = []
    for _ in range(3):
        assert sub.poll(2000)
        topic, payload = sub.recv_multipart()
        assert topic == b"kv-events"
        msgs.append(json.loads(payload))
    assert msgs[0]["type"] == "block_stored"
    assert msgs[0]["block_hashes"] == ["aa", "bb"]
    assert msgs[1]["type"] == "block_removed"
    assert msgs[2]["type"] == "all_blocks_cleared"
    assert msgs[1]["seq"] == msgs[0]["seq"] + 1
    pub.close()
    sub.close(0)
