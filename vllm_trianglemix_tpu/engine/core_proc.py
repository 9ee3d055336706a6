"""Background-process engine core over ZMQ.

Role of the reference's EngineCoreProc / EngineCoreClient
(vllm/v1/engine/core.py:453-943, core_client.py:49): the engine core —
scheduler, executor, device — runs in its own process with a busy loop;
the frontend process talks to it over two ZMQ pipes (PUSH requests in,
PULL outputs back). This isolates device work from the API server's
event loop and is the seam for data-parallel engine replicas.

Serialization is pickle (msgspec isn't in the environment); messages are
(kind, payload) tuples. The handshake returns engine facts (KV block
count) so the frontend never touches the device.
"""

from __future__ import annotations

import multiprocessing as mp
import pickle
import queue
import threading
import time
from typing import Optional

import zmq

from vllm_trianglemix_tpu.config import EngineConfig
from vllm_trianglemix_tpu.logger import init_logger

logger = init_logger(__name__)

READY = b"VTT_READY"


def _engine_core_main(engine_config: EngineConfig, input_addr: str,
                      output_addr: str, jax_platforms: Optional[str]) -> None:
    """Subprocess entry: build the engine core and run the busy loop
    (reference core.py:720 run_busy_loop)."""
    if jax_platforms:
        # Inherit the parent's platform choice — site customizations may
        # force a different default in the fresh interpreter.
        import jax

        jax.config.update("jax_platforms", jax_platforms)

    from vllm_trianglemix_tpu.engine.core import EngineCore

    ctx = zmq.Context()
    input_sock = ctx.socket(zmq.PULL)
    input_sock.connect(input_addr)
    output_sock = ctx.socket(zmq.PUSH)
    output_sock.connect(output_addr)

    engine_core = EngineCore(engine_config)
    output_sock.send(pickle.dumps(("ready", {
        "num_kv_blocks": engine_core.executor.num_kv_blocks,
    })))

    running = True
    while running:
        # Drain all pending control messages; block only when idle.
        while True:
            try:
                flags = (0 if not engine_core.has_unfinished_requests()
                         else zmq.NOBLOCK)
                msg = input_sock.recv(flags=flags)
            except zmq.Again:
                break
            kind, payload = pickle.loads(msg)
            if kind == "add":
                engine_core.add_request(payload)
            elif kind == "abort":
                engine_core.abort_requests(payload)
            elif kind == "warmup":
                engine_core.warm_up()
                output_sock.send(pickle.dumps(("warmed", None)))
            elif kind == "save_state":
                engine_core.executor.save_state(payload)
                output_sock.send(pickle.dumps(("saved", None)))
            elif kind == "reset_prefix_cache":
                ok = engine_core.scheduler.kv_cache_manager \
                    .reset_prefix_cache()
                output_sock.send(pickle.dumps(("reset", bool(ok))))
            elif kind == "profile_start":
                engine_core.executor.profile_start(payload)
                output_sock.send(pickle.dumps(("profiling", None)))
            elif kind == "profile_stop":
                engine_core.executor.profile_stop()
                output_sock.send(pickle.dumps(("profiled", None)))
            elif kind == "reload_weights":
                engine_core.executor.reload_weights(payload)
                output_sock.send(pickle.dumps(("reloaded", None)))
            elif kind == "sleep":
                try:
                    engine_core.scheduler.kv_cache_manager \
                        .reset_prefix_cache()
                    engine_core.executor.sleep(payload)
                    output_sock.send(pickle.dumps(("slept", None)))
                except Exception as e:  # noqa: BLE001
                    output_sock.send(pickle.dumps(("slept", repr(e))))
            elif kind == "wake":
                engine_core.executor.wake_up()
                output_sock.send(pickle.dumps(("woke", None)))
            elif kind == "is_sleeping":
                output_sock.send(pickle.dumps(
                    ("sleeping", engine_core.executor.is_sleeping())))
            elif kind == "load_lora":
                try:
                    engine_core.executor.load_lora_adapter(*payload)
                    output_sock.send(pickle.dumps(("lora_loaded", None)))
                except Exception as e:  # noqa: BLE001
                    output_sock.send(pickle.dumps(("lora_loaded",
                                                   repr(e))))
            elif kind == "unload_lora":
                try:
                    engine_core.executor.unload_lora_adapter(payload)
                    output_sock.send(pickle.dumps(("lora_unloaded", None)))
                except Exception as e:  # noqa: BLE001
                    output_sock.send(pickle.dumps(("lora_unloaded",
                                                   repr(e))))
            elif kind == "shutdown":
                running = False
                break
            if not engine_core.has_unfinished_requests():
                break  # go back to blocking recv

        if running and engine_core.has_unfinished_requests():
            outputs = engine_core.step()
            if outputs:
                output_sock.send(pickle.dumps(("outputs", outputs)))

    engine_core.shutdown()
    output_sock.send(pickle.dumps(("bye", None)))
    input_sock.close(0)
    output_sock.close(0)
    ctx.term()


class EngineCoreClient:
    """In-process frontend handle to a background EngineCoreProc
    (reference SyncMPClient, core_client.py:597)."""

    def __init__(self, engine_config: EngineConfig,
                 start_timeout: float = 600.0) -> None:
        self.ctx = zmq.Context()
        self.input_sock = self.ctx.socket(zmq.PUSH)
        input_port = self.input_sock.bind_to_random_port("tcp://127.0.0.1")
        self.output_sock = self.ctx.socket(zmq.PULL)
        output_port = self.output_sock.bind_to_random_port("tcp://127.0.0.1")

        try:
            import jax

            # Effective value (attribute, not .read() — .read() raises
            # AttributeError for context-managed flags, which silently
            # left the child on whatever platform its sitecustomize
            # picked: test engines ended up compiling through a remote
            # TPU tunnel instead of CPU).
            jax_platforms = jax.config.jax_platforms
        except Exception:  # noqa: BLE001
            jax_platforms = None
        mp_ctx = mp.get_context("spawn")
        self.proc = mp_ctx.Process(
            target=_engine_core_main,
            args=(engine_config, f"tcp://127.0.0.1:{input_port}",
                  f"tcp://127.0.0.1:{output_port}", jax_platforms),
            daemon=True,
            name="VTTEngineCore",
        )
        self.proc.start()

        # Monitor thread: engine death must not hang the frontend
        # (reference worker-death monitor, multiproc_executor.py:138).
        self._dead = False
        self._outputs: "queue.Queue" = queue.Queue()
        self._unfinished: set[str] = set()

        kind, payload = self._recv(timeout=start_timeout)
        if kind != "ready":
            raise RuntimeError(f"engine handshake failed: {kind}")
        self.num_kv_blocks = payload["num_kv_blocks"]
        logger.info("engine core process ready (pid %d)", self.proc.pid)

    def _recv(self, timeout: Optional[float] = None):
        deadline = time.monotonic() + (timeout or 0)
        while True:
            if self.proc is not None and not self.proc.is_alive():
                self._dead = True
                raise RuntimeError("engine core process died")
            if self.output_sock.poll(200):
                return pickle.loads(self.output_sock.recv())
            if timeout is not None and time.monotonic() > deadline:
                raise TimeoutError("engine core recv timeout")

    def _send(self, kind: str, payload) -> None:
        self.input_sock.send(pickle.dumps((kind, payload)))

    def _recv_kind(self, want: str, timeout: float):
        """Wait for a control reply, stashing any generation outputs that
        arrive interleaved (a control request may be issued while steps
        are in flight)."""
        while True:
            kind, payload = self._recv(timeout=timeout)
            if kind == want:
                return payload
            if kind == "outputs":
                self._outputs.put(payload)
            else:
                raise RuntimeError(
                    f"engine core replied {kind!r}, wanted {want!r}")

    def _note_finished(self, outs) -> None:
        for out in outs:
            if out.finished:
                self._unfinished.discard(out.request_id)

    # --- engine-core-compatible surface ------------------------------------
    def add_request(self, request) -> None:
        self._unfinished.add(request.request_id)
        self._send("add", request)

    def abort_requests(self, request_ids: list[str]) -> None:
        self._unfinished.difference_update(request_ids)
        self._send("abort", request_ids)

    def step(self):
        """Pull the next batch of outputs (blocking while work remains)."""
        if not self._outputs.empty():
            outs = self._outputs.get_nowait()
            self._note_finished(outs)
            return outs
        if not self._unfinished:
            return []
        kind, payload = self._recv(timeout=600.0)
        if kind != "outputs":
            return []
        self._note_finished(payload)
        return payload

    async def step_async(self):
        """Await the next outputs batch WITHOUT blocking a thread
        (reference AsyncMPClient role, core_client.py): the engine-core
        process pushes autonomously; this awaits the output socket via
        its ZMQ FD on the running event loop. Spurious FD wakeups are
        re-checked against zmq.EVENTS (edge-trigger semantics); a 1 s
        tick doubles as the process-liveness check."""
        import asyncio

        if not self._outputs.empty():
            outs = self._outputs.get_nowait()
            self._note_finished(outs)
            return outs
        if not self._unfinished:
            return []
        loop = asyncio.get_running_loop()
        fd = self.output_sock.getsockopt(zmq.FD)
        while not self.output_sock.poll(0):
            fut = loop.create_future()

            def _on_readable():
                if not fut.done():
                    fut.set_result(None)

            loop.add_reader(fd, _on_readable)
            try:
                await asyncio.wait_for(asyncio.shield(fut), timeout=1.0)
            except asyncio.TimeoutError:
                if self.proc is not None and not self.proc.is_alive():
                    self._dead = True
                    raise RuntimeError("engine core process died")
            finally:
                loop.remove_reader(fd)
        kind, payload = pickle.loads(self.output_sock.recv())
        if kind != "outputs":
            return []
        self._note_finished(payload)
        return payload

    def try_step(self, timeout_ms: int = 50):
        """Non-blocking variant for replica pools (engine/dp_coordinator):
        returns [] when nothing is ready within ``timeout_ms``."""
        if not self._outputs.empty():
            outs = self._outputs.get_nowait()
            self._note_finished(outs)
            return outs
        if not self._unfinished:
            return []
        if self.proc is not None and not self.proc.is_alive():
            self._dead = True
            raise RuntimeError("engine core process died")
        if not self.output_sock.poll(timeout_ms):
            return []
        kind, payload = pickle.loads(self.output_sock.recv())
        if kind != "outputs":
            return []
        self._note_finished(payload)
        return payload

    def has_unfinished_requests(self) -> bool:
        return bool(self._unfinished)

    def num_unfinished(self) -> int:
        return len(self._unfinished)

    def make_stats(self):
        from vllm_trianglemix_tpu.core.sched_output import SchedulerStats

        return SchedulerStats()

    def warm_up(self) -> None:
        self._send("warmup", None)
        self._recv_kind("warmed", timeout=3600.0)

    def save_state(self, path: str) -> None:
        self._send("save_state", path)
        self._recv_kind("saved", timeout=600.0)

    def reset_prefix_cache(self) -> bool:
        self._send("reset_prefix_cache", None)
        return bool(self._recv_kind("reset", timeout=600.0))

    def profile_start(self, trace_dir: str) -> None:
        self._send("profile_start", trace_dir)
        self._recv_kind("profiling", timeout=600.0)

    def profile_stop(self) -> None:
        self._send("profile_stop", None)
        self._recv_kind("profiled", timeout=600.0)

    def reload_weights(self, path: Optional[str] = None) -> None:
        self._send("reload_weights", path)
        self._recv_kind("reloaded", timeout=3600.0)

    def sleep(self, level: int = 1) -> None:
        self._send("sleep", level)
        err = self._recv_kind("slept", timeout=600.0)
        if err is not None:
            raise ValueError(err)

    def wake_up(self) -> None:
        self._send("wake", None)
        self._recv_kind("woke", timeout=3600.0)

    def is_sleeping(self) -> bool:
        self._send("is_sleeping", None)
        return bool(self._recv_kind("sleeping", timeout=600.0))

    def load_lora_adapter(self, name: str, path: str) -> None:
        self._send("load_lora", (name, path))
        err = self._recv_kind("lora_loaded", timeout=600.0)
        if err is not None:
            raise ValueError(err)

    def unload_lora_adapter(self, name: str) -> None:
        self._send("unload_lora", name)
        err = self._recv_kind("lora_unloaded", timeout=600.0)
        if err is not None:
            raise ValueError(err)

    def shutdown(self) -> None:
        if self._dead or self.proc is None:
            return
        try:
            self._send("shutdown", None)
            self.proc.join(timeout=10)
        finally:
            if self.proc.is_alive():
                self.proc.terminate()
            self.input_sock.close(0)
            self.output_sock.close(0)
            self.ctx.term()
            self.proc = None
