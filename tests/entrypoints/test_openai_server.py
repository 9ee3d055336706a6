"""OpenAI API surface e2e: aiohttp test client against the real engine
(tiny random-weight model + offline-built tokenizer).

Reference analogue: tests/entrypoints/openai/* against RemoteOpenAIServer
(reference tests/utils.py:81), run in-process here. No pytest-asyncio in
the environment, so each test drives its own event loop.
"""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from vllm_trianglemix_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)


@pytest.fixture(scope="module")
def serve(tiny_model_dir):
    """Run one engine+server on a dedicated event-loop thread for the whole
    module; tests submit coroutines to it."""
    import threading

    from vllm_trianglemix_tpu.engine.async_llm import AsyncLLM
    from vllm_trianglemix_tpu.entrypoints.openai.api_server import build_app

    loop = asyncio.new_event_loop()
    thread = threading.Thread(target=loop.run_forever, daemon=True)
    thread.start()
    holder = {}

    async def setup():
        config = EngineConfig(
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

    asyncio.run_coroutine_threadsafe(setup(), loop).result(timeout=120)

    def run(coro_fn, timeout=120):
        return asyncio.run_coroutine_threadsafe(
            coro_fn(holder["client"]), loop).result(timeout=timeout)

    yield run

    async def teardown():
        await holder["client"].close()
        holder["engine"].shutdown()

    asyncio.run_coroutine_threadsafe(teardown(), loop).result(timeout=30)
    loop.call_soon_threadsafe(loop.stop)
    thread.join(timeout=10)


def test_health_and_version(serve):
    async def body(client):
        assert (await client.get("/health")).status == 200
        r = await client.get("/version")
        assert "version" in await r.json()
    serve(body)


def test_models_listing(serve):
    async def body(client):
        r = await client.get("/v1/models")
        data = await r.json()
        assert data["data"][0]["id"] == "tiny-qwen3"
    serve(body)


def test_completion_basic(serve):
    async def body(client):
        r = await client.post("/v1/completions", json={
            "prompt": "hello world", "max_tokens": 4, "temperature": 0.0,
            "ignore_eos": True,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["object"] == "text_completion"
        assert len(data["choices"]) == 1
        assert data["choices"][0]["finish_reason"] == "length"
        assert data["usage"]["prompt_tokens"] == 2
        assert data["usage"]["completion_tokens"] == 4
    serve(body)


def test_completion_token_ids_prompt(serve):
    async def body(client):
        r = await client.post("/v1/completions", json={
            "prompt": [1, 2, 3, 4], "max_tokens": 3, "temperature": 0.0,
            "ignore_eos": True,
        })
        assert r.status == 200
        data = await r.json()
        assert data["usage"]["completion_tokens"] == 3
    serve(body)


def test_completion_multiple_prompts(serve):
    async def body(client):
        r = await client.post("/v1/completions", json={
            "prompt": ["hello", "world"], "max_tokens": 2,
            "temperature": 0.0, "ignore_eos": True,
        })
        data = await r.json()
        assert [c["index"] for c in data["choices"]] == [0, 1]
    serve(body)


def test_completion_streaming(serve):
    async def body(client):
        r = await client.post("/v1/completions", json={
            "prompt": "hello", "max_tokens": 4, "temperature": 0.0,
            "stream": True, "ignore_eos": True,
        })
        assert r.status == 200
        text = await r.text()
        events = [line[6:] for line in text.splitlines()
                  if line.startswith("data: ")]
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        assert all(c["object"] == "text_completion" for c in chunks)
        assert chunks[-1]["choices"][0]["finish_reason"] == "length"
    serve(body)


def test_chat_completion(serve):
    async def body(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hello world"}],
            "max_tokens": 4, "temperature": 0.0, "ignore_eos": True,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["object"] == "chat.completion"
        assert data["choices"][0]["message"]["role"] == "assistant"
    serve(body)


def test_chat_streaming(serve):
    async def body(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hello"}],
            "max_tokens": 3, "temperature": 0.0, "stream": True,
            "ignore_eos": True,
        })
        text = await r.text()
        events = [line[6:] for line in text.splitlines()
                  if line.startswith("data: ")]
        assert events[-1] == "[DONE]"
        first = json.loads(events[0])
        assert first["choices"][0]["delta"].get("role") == "assistant"
    serve(body)


def test_concurrent_requests_batched(serve):
    async def body(client):
        async def one(i):
            r = await client.post("/v1/completions", json={
                "prompt": [10 + i, 20 + i], "max_tokens": 4,
                "temperature": 0.0, "ignore_eos": True,
            })
            assert r.status == 200
            return await r.json()

        results = await asyncio.gather(*(one(i) for i in range(6)))
        assert all(r["usage"]["completion_tokens"] == 4 for r in results)
    serve(body)


def test_guided_choice_over_api(serve):
    async def body(client):
        r = await client.post("/v1/completions", json={
            "prompt": "hello", "max_tokens": 8, "temperature": 0.0,
            "guided_choice": ["yes", "no"],
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        # WordLevel test tokenizer re-inserts spaces on decode; strip them
        assert data["choices"][0]["text"].replace(" ", "") in ("yes", "no")
    serve(body)


def test_tokenize_detokenize_roundtrip(serve):
    async def body(client):
        r = await client.post("/tokenize", json={"prompt": "hello world"})
        toks = (await r.json())["tokens"]
        assert toks == [503, 504]
        r = await client.post("/detokenize", json={"tokens": toks})
        assert (await r.json())["prompt"] == "hello world"
    serve(body)


def test_invalid_request_rejected(serve):
    async def body(client):
        r = await client.post("/v1/completions", json={
            "prompt": "hello", "temperature": -1.0,
        })
        assert r.status == 400
        assert "error" in await r.json()
    serve(body)


def test_prompt_too_long_rejected(serve):
    async def body(client):
        r = await client.post("/v1/completions", json={
            "prompt": [1] * 300, "max_tokens": 1,
        })
        assert r.status == 400
    serve(body)


def test_metrics_endpoint(serve):
    async def body(client):
        r = await client.get("/metrics")
        assert r.status == 200
    serve(body)


def test_embeddings_endpoint(serve):
    async def body(client):
        r = await client.post("/v1/embeddings", json={
            "input": "hello world", "dimensions": 8,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["object"] == "list"
        assert len(data["data"][0]["embedding"]) == 8
        assert data["usage"]["prompt_tokens"] == 2
    serve(body)


def test_logprobs_api_shape(serve):
    async def body(client):
        r = await client.post("/v1/completions", json={
            "prompt": [5, 6, 7], "max_tokens": 3, "temperature": 0.0,
            "ignore_eos": True, "logprobs": 2,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        lp = data["choices"][0]["logprobs"]
        assert len(lp["tokens"]) == 3
        assert len(lp["token_logprobs"]) == 3
        assert all(len(t) <= 2 for t in lp["top_logprobs"])
        assert lp["text_offset"][0] == 0
    serve(body)


def test_score_endpoint(serve):
    async def body(client):
        r = await client.post("/v1/score", json={
            "text_1": "hello world", "text_2": ["hello world", "tok7 tok9"],
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        assert [d["index"] for d in data["data"]] == [0, 1]
        # identical texts score ~1 under normalized embeddings and beat
        # the unrelated pair
        assert data["data"][0]["score"] > 0.99
        assert data["data"][0]["score"] >= data["data"][1]["score"]
    serve(body)


def test_rerank_endpoint(serve):
    async def body(client):
        docs = ["tok1 tok2 tok3", "hello world", "tok9"]
        r = await client.post("/v1/rerank", json={
            "query": "hello world", "documents": docs, "top_n": 2,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        assert len(data["results"]) == 2
        # the identical document must rank first
        assert data["results"][0]["document"]["text"] == "hello world"
        scores = [x["relevance_score"] for x in data["results"]]
        assert scores == sorted(scores, reverse=True)
        # /v2/rerank alias answers too
        r2 = await client.post("/v2/rerank", json={
            "query": "hello", "documents": docs})
        assert r2.status == 200
    serve(body)


def test_responses_endpoint(serve):
    async def body(client):
        r = await client.post("/v1/responses", json={
            "input": "hello world",
            "instructions": "be brief",
            "max_output_tokens": 4,
            "temperature": 0.0,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["object"] == "response"
        assert data["status"] == "completed"
        msg = data["output"][0]
        assert msg["role"] == "assistant"
        assert msg["content"][0]["type"] == "output_text"
        assert data["usage"]["output_tokens"] == 4
        # message-list input form
        r2 = await client.post("/v1/responses", json={
            "input": [{"role": "user", "content": "hello"}],
            "max_output_tokens": 2, "temperature": 0.0,
        })
        assert r2.status == 200, await r2.text()
    serve(body)
