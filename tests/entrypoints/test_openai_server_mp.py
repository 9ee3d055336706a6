"""OpenAI server e2e against the PROCESS-BACKED engine core.

Reference analogue: the serving default runs the engine in its own
process (AsyncMPClient, vllm/v1/engine/core_client.py:597) so API-server
hiccups can't stall the device loop. Here AsyncLLM's LLMEngine is built
with multiprocess_engine=True: the scheduler+executor+device live in a
spawned EngineCoreProc (ZMQ), the aiohttp frontend only tokenizes and
detokenizes.
"""

import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

from vllm_trianglemix_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)


@pytest.fixture(scope="module")
def serve_mp(tiny_model_dir):
    import threading

    from vllm_trianglemix_tpu.engine.async_llm import AsyncLLM
    from vllm_trianglemix_tpu.entrypoints.openai.api_server import build_app

    loop = asyncio.new_event_loop()
    thread = threading.Thread(target=loop.run_forever, daemon=True)
    thread.start()
    holder = {}

    async def setup():
        config = EngineConfig(
            multiprocess_engine=True,
            model=ModelConfig(model=tiny_model_dir, dtype="float32",
                              max_model_len=256),
            cache=CacheConfig(block_size=16, num_gpu_blocks=64),
            scheduler=SchedulerConfig(max_num_seqs=8,
                                      max_num_batched_tokens=128),
        )
        engine = AsyncLLM.from_engine_config(config)
        client = TestClient(TestServer(build_app(engine, "tiny-qwen3")))
        await client.start_server()
        holder["engine"] = engine
        holder["client"] = client

    asyncio.run_coroutine_threadsafe(setup(), loop).result(timeout=300)

    def run(coro_fn, timeout=300):
        return asyncio.run_coroutine_threadsafe(
            coro_fn(holder["client"]), loop).result(timeout=timeout)

    yield run

    async def teardown():
        await holder["client"].close()
        holder["engine"].engine.shutdown()
        holder["engine"].shutdown()

    asyncio.run_coroutine_threadsafe(teardown(), loop).result(timeout=60)
    loop.call_soon_threadsafe(loop.stop)
    thread.join(timeout=10)


@pytest.mark.timeout(600)
def test_mp_completion(serve_mp):
    async def body(client):
        r = await client.post("/v1/completions", json={
            "prompt": "hello world", "max_tokens": 4, "temperature": 0.0,
            "ignore_eos": True,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["choices"][0]["finish_reason"] == "length"
        assert data["usage"]["completion_tokens"] == 4
    serve_mp(body)


@pytest.mark.timeout(600)
def test_mp_chat_streaming(serve_mp):
    async def body(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hello"}],
            "max_tokens": 4, "temperature": 0.0, "stream": True,
            "ignore_eos": True,
        })
        assert r.status == 200, await r.text()
        text = await r.text()
        assert "data: [DONE]" in text
    serve_mp(body)


@pytest.mark.timeout(600)
def test_mp_concurrent_requests(serve_mp):
    async def body(client):
        async def one(i):
            r = await client.post("/v1/completions", json={
                "prompt": f"hello tok{i}", "max_tokens": 3,
                "temperature": 0.0, "ignore_eos": True,
            })
            assert r.status == 200
            return (await r.json())["usage"]["completion_tokens"]

        counts = await asyncio.gather(*(one(i) for i in range(4)))
        assert counts == [3, 3, 3, 3]
    serve_mp(body)


@pytest.mark.timeout(600)
def test_mp_reset_prefix_cache(serve_mp):
    async def body(client):
        r = await client.post("/reset_prefix_cache")
        assert r.status == 200, await r.text()
        assert (await r.json())["reset"] is True
    serve_mp(body)
