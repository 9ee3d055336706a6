"""Async engine facade for online serving.

Role of the reference's AsyncLLM (vllm/v1/engine/async_llm.py:52): accept
requests from any coroutine, run the engine loop in the background, and
stream per-request ``RequestOutput``s through asyncio queues. The blocking
device step runs in a worker thread; new requests are admitted between
steps (no locks on the scheduler).
"""

from __future__ import annotations

import asyncio
import time
from typing import AsyncGenerator, Optional, Union

from vllm_trianglemix_tpu.config import EngineConfig
from vllm_trianglemix_tpu.engine.llm_engine import LLMEngine
from vllm_trianglemix_tpu.logger import init_logger
from vllm_trianglemix_tpu.outputs import RequestOutput
from vllm_trianglemix_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)

PromptType = Union[str, list[int], dict]


class EngineDeadError(RuntimeError):
    pass


class AsyncLLM:

    def __init__(self, engine_config: EngineConfig) -> None:
        self.engine = LLMEngine.from_engine_config(engine_config)
        self.engine_config = engine_config
        self._queues: dict[str, asyncio.Queue] = {}
        self._pending: list[tuple] = []  # (rid, prompt, params, priority)
        self._wakeup = asyncio.Event()
        self._loop_task: Optional[asyncio.Task] = None
        self._dead: Optional[BaseException] = None

    @classmethod
    def from_engine_config(cls, engine_config: EngineConfig) -> "AsyncLLM":
        return cls(engine_config)

    @property
    def tokenizer(self):
        return self.engine.tokenizer

    @property
    def errored(self) -> bool:
        return self._dead is not None

    def _ensure_loop(self) -> None:
        if self._loop_task is None or self._loop_task.done():
            self._loop_task = asyncio.get_running_loop().create_task(
                self._run_engine_loop())

    async def generate(
        self,
        prompt: PromptType,
        sampling_params: SamplingParams,
        request_id: str,
        priority: int = 0,
        pooling_params=None,
    ) -> AsyncGenerator[RequestOutput, None]:
        """Async generator of cumulative RequestOutputs (last one has
        ``finished=True``)."""
        if self._dead is not None:
            raise EngineDeadError(str(self._dead))
        self._ensure_loop()
        queue: asyncio.Queue = asyncio.Queue()
        self._queues[request_id] = queue
        self._pending.append((request_id, prompt, sampling_params, priority,
                              pooling_params))
        self._wakeup.set()
        try:
            while True:
                item = await queue.get()
                if isinstance(item, ValueError):
                    raise item  # per-request validation error
                if isinstance(item, BaseException):
                    raise EngineDeadError(str(item)) from item
                yield item
                if item.finished:
                    return
        finally:
            self._queues.pop(request_id, None)

    async def abort(self, request_id: str) -> None:
        # drop if still waiting for admission, else abort in the engine
        self._pending = [p for p in self._pending if p[0] != request_id]
        self.engine.abort_request([request_id])
        self._queues.pop(request_id, None)

    async def _run_engine_loop(self) -> None:
        logger.info("AsyncLLM engine loop started")
        try:
            while True:
                # Admit pending requests between steps.
                pending, self._pending = self._pending, []
                for rid, prompt, params, priority, pooling in pending:
                    try:
                        self.engine.add_request(rid, prompt, params,
                                                priority=priority,
                                                pooling_params=pooling)
                    except Exception as e:  # noqa: BLE001 (bad request)
                        q = self._queues.get(rid)
                        if q is not None:
                            q.put_nowait(e)

                if not self.engine.has_unfinished_requests():
                    self._wakeup.clear()
                    if not self._pending:
                        await self._wakeup.wait()
                    continue

                # MP cores are awaited on the loop (engine/core_proc.py
                # step_async — no worker thread); only the in-process
                # core's blocking device step uses the executor.
                outputs = await self.engine.step_async()
                for out in outputs:
                    q = self._queues.get(out.request_id)
                    if q is not None:
                        q.put_nowait(out)
        except asyncio.CancelledError:
            raise
        except BaseException as e:  # noqa: BLE001
            logger.exception("engine loop died")
            self._dead = e
            for q in self._queues.values():
                q.put_nowait(e)

    def shutdown(self) -> None:
        if self._loop_task is not None:
            self._loop_task.cancel()

    # Convenience for tests / simple scripts.
    async def generate_once(self, prompt: PromptType,
                            sampling_params: SamplingParams,
                            request_id: Optional[str] = None) -> RequestOutput:
        rid = request_id or f"req-{time.monotonic_ns()}"
        final = None
        async for out in self.generate(prompt, sampling_params, rid):
            final = out
        assert final is not None
        return final
