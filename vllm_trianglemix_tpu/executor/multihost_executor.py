"""Multi-host executor: one engine, N host processes, one global mesh.

Reference analogue: MultiprocExecutor's per-rank worker processes
(vllm/v1/executor/multiproc_executor.py:49) + the TPU PJRT multiprocess
bring-up (vllm/distributed/device_communicators/tpu_communicator.py:35-120).

TPU-native shape: every host process joins ``jax.distributed`` and builds
the SAME ``Worker`` over the global mesh (weights/KV sharded across all
hosts' chips). Host 0 additionally runs the scheduler + frontend. Each
engine step, host 0 broadcasts the pickled ``SchedulerOutput`` over a ZMQ
PUB socket; every host feeds it to its local ``Worker.execute_model``.
Because the worker's host-side input assembly is a pure function of the
SchedulerOutput stream (and the sampling PRNG is seeded from config), all
hosts enqueue the SAME sequence of jitted programs with the SAME shapes —
XLA's requirement for multi-host collectives — and each host materializes
only its addressable shards. Sampled tokens come back fully replicated, so
host 0 reads them locally with no extra collective.

Control plane: ``control_address`` (tcp) is the PUB broadcast; port+1 is a
PULL channel for worker ready-acks and fatal errors (reference: the
worker-death monitor, multiproc_executor.py:138-166).
"""

from __future__ import annotations

import pickle

import zmq

from vllm_trianglemix_tpu.config import EngineConfig
from vllm_trianglemix_tpu.core.sched_output import (
    ModelRunnerOutput,
    SchedulerOutput,
)
from vllm_trianglemix_tpu.executor.abstract import Executor
from vllm_trianglemix_tpu.logger import init_logger
from vllm_trianglemix_tpu.worker.worker import Worker

logger = init_logger(__name__)


def _split_address(control_address: str) -> tuple[str, str]:
    """PUB address and its +1-port ack address."""
    base, port = control_address.rsplit(":", 1)
    return control_address, f"{base}:{int(port) + 1}"


def _check_multihost_config(engine_config: EngineConfig) -> None:
    p = engine_config.parallel
    if not p.control_address:
        raise ValueError("multi-host serving needs parallel.control_address")
    if engine_config.kv_connector:
        # Connectors device_get non-addressable KV shards; a multi-host
        # connector needs per-host shard IO (not built yet).
        raise ValueError("kv_connector is unsupported with num_hosts > 1")
    if engine_config.multiprocess_engine:
        # The engine must stay in the process that joined jax.distributed
        # — a spawned EngineCoreProc would not be part of the global mesh.
        raise ValueError(
            "multiprocess_engine is unsupported with num_hosts > 1 "
            "(the multi-host engine already isolates peers per host)")


class MultiHostExecutor(Executor):
    """Host 0's executor: local Worker + step broadcast to peer hosts."""

    def __init__(self, engine_config: EngineConfig) -> None:
        p = engine_config.parallel
        assert p.host_id == 0, "MultiHostExecutor runs on host 0 only"
        _check_multihost_config(engine_config)
        pub_addr, ack_addr = _split_address(p.control_address)
        self.ctx = zmq.Context()
        self.pub = self.ctx.socket(zmq.PUB)
        self.pub.bind(pub_addr)
        self.ack = self.ctx.socket(zmq.PULL)
        self.ack.bind(ack_addr)

        # Worker construction device_puts weights/KV to the global mesh —
        # per-host local shards only, no cross-host collectives — so host 0
        # and the peers may build at their own pace.
        self.worker = Worker(engine_config)
        self._sync_workers(p.num_hosts)

    def _sync_workers(self, num_hosts: int) -> None:
        """Ping until every peer host reports ready (defeats the PUB/SUB
        slow-joiner race) and cross-check KV geometry."""
        ready: set[int] = set()
        while len(ready) < num_hosts - 1:
            self.pub.send(pickle.dumps(("ping", None)))
            if not self.ack.poll(200):
                continue
            kind, host_id, info = pickle.loads(self.ack.recv())
            if kind == "error":
                raise RuntimeError(f"host {host_id} failed: {info}")
            if kind != "ready" or host_id in ready:
                continue
            if info["num_kv_blocks"] != self.worker.num_kv_blocks:
                raise RuntimeError(
                    f"host {host_id} probed {info['num_kv_blocks']} KV "
                    f"blocks, host 0 {self.worker.num_kv_blocks} — "
                    "heterogeneous hosts are unsupported")
            ready.add(host_id)
            logger.info("host %d ready (%d/%d)", host_id, len(ready),
                        num_hosts - 1)

    def _bcast(self, method: str, payload=None) -> None:
        # Opportunistic death check: a peer that hit a fatal error pushes
        # it here; surfacing it beats a silent collective hang.
        if self.ack.poll(0):
            kind, host_id, info = pickle.loads(self.ack.recv())
            if kind == "error":
                raise RuntimeError(f"host {host_id} died: {info}")
        self.pub.send(pickle.dumps((method, payload)))

    # --- Executor surface --------------------------------------------------
    def execute_model(self, scheduler_output: SchedulerOutput
                      ) -> ModelRunnerOutput:
        self._bcast("execute_model", scheduler_output)
        return self.worker.execute_model(scheduler_output)

    def execute_model_async(self, scheduler_output: SchedulerOutput):
        self._bcast("execute_model", scheduler_output)
        return self.worker.execute_model_async(scheduler_output)

    @property
    def num_kv_blocks(self) -> int:
        return self.worker.num_kv_blocks

    def compile_or_warm_up_model(self) -> None:
        self._bcast("warmup")
        self.worker.compile_or_warm_up_model()

    def reload_weights(self, path=None) -> None:
        self._bcast("reload_weights", path)
        self.worker.reload_weights(path)

    def save_state(self, path: str) -> None:
        raise NotImplementedError(
            "save_state under multi-host needs per-host shard IO; "
            "use single-host save or the HF checkpoint")

    def profile_start(self, trace_dir: str) -> None:
        # jax.profiler is per-process; host 0's trace covers its chips.
        self.worker.profile_start(trace_dir)

    def profile_stop(self) -> None:
        self.worker.profile_stop()

    def load_lora_adapter(self, name: str, path: str) -> None:
        # Every host updates its shard of the slot stacks in lockstep
        # (the path must be visible on all hosts, like the checkpoint).
        self._bcast("load_lora", (name, path))
        self.worker.load_lora_adapter(name, path)

    def unload_lora_adapter(self, name: str) -> None:
        self._bcast("unload_lora", name)
        self.worker.unload_lora_adapter(name)

    def list_lora_adapters(self) -> list:
        return self.worker.list_lora_adapters()

    def shutdown(self) -> None:
        try:
            self.pub.send(pickle.dumps(("shutdown", None)))
        except Exception:  # noqa: BLE001 - already torn down
            pass
        self.pub.close(0)
        self.ack.close(0)
        self.ctx.term()


def run_worker_loop(engine_config: EngineConfig) -> None:
    """Peer-host main (host_id > 0): execute host 0's broadcast stream.

    The caller must have joined jax.distributed already (the launcher
    does). Blocks until host 0 sends shutdown or the socket dies.
    """
    p = engine_config.parallel
    assert p.host_id > 0
    _check_multihost_config(engine_config)
    pub_addr, ack_addr = _split_address(p.control_address)
    ctx = zmq.Context()
    sub = ctx.socket(zmq.SUB)
    sub.connect(pub_addr)
    sub.setsockopt(zmq.SUBSCRIBE, b"")
    push = ctx.socket(zmq.PUSH)
    push.connect(ack_addr)

    try:
        worker = Worker(engine_config)
    except Exception as e:  # noqa: BLE001 - report, then die
        push.send(pickle.dumps(("error", p.host_id, repr(e))))
        raise

    announced = False
    while True:
        kind, payload = pickle.loads(sub.recv())
        try:
            if kind == "ping":
                if not announced:
                    push.send(pickle.dumps(("ready", p.host_id, {
                        "num_kv_blocks": worker.num_kv_blocks,
                    })))
                    announced = True
            elif kind == "execute_model":
                # Sync execution replays host 0's exact program-launch
                # order (finalize() launches nothing — device_get only).
                worker.execute_model(payload)
            elif kind == "warmup":
                worker.compile_or_warm_up_model()
            elif kind == "reload_weights":
                worker.reload_weights(payload)
            elif kind == "load_lora":
                worker.load_lora_adapter(*payload)
            elif kind == "unload_lora":
                worker.unload_lora_adapter(payload)
            elif kind == "shutdown":
                logger.info("host %d: shutdown", p.host_id)
                return
            else:
                raise ValueError(f"unknown control message {kind!r}")
        except Exception as e:  # noqa: BLE001 - report, then die
            push.send(pickle.dumps(("error", p.host_id, repr(e))))
            raise
