"""OpenAI-compatible HTTP server on aiohttp.

Role of the reference's FastAPI server (vllm/entrypoints/openai/
api_server.py:252-950) on the stack available here (aiohttp): completions,
chat completions (with tokenizer chat templates), model listing, tokenize/
detokenize, health, version, and Prometheus /metrics. SSE streaming follows
the OpenAI wire format (``data: {...}\\n\\n`` ... ``data: [DONE]``).
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from typing import Optional

from aiohttp import web

from vllm_trianglemix_tpu import __version__
from vllm_trianglemix_tpu.engine.async_llm import AsyncLLM, EngineDeadError
from vllm_trianglemix_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest,
    CompletionRequest,
    DetokenizeRequest,
    TokenizeRequest,
    UsageCounter,
    chat_response,
    completion_response,
    error_response,
)
from vllm_trianglemix_tpu.logger import init_logger

logger = init_logger(__name__)

ENGINE_KEY = web.AppKey("engine", AsyncLLM)
MODEL_KEY = web.AppKey("model_name", str)
TOOL_PARSER_KEY = web.AppKey("tool_call_parser", str)
REASONING_PARSER_KEY = web.AppKey("reasoning_parser", str)
RESPONSES_KEY = web.AppKey("responses_store", dict)


def _json_error(message: str, status: int = 400) -> web.Response:
    return web.json_response(error_response(message, code=status),
                             status=status)


async def health(request: web.Request) -> web.Response:
    engine = request.app[ENGINE_KEY]
    if engine.errored:
        return _json_error("engine dead", 500)
    return web.Response(status=200)


async def version(request: web.Request) -> web.Response:
    return web.json_response({"version": __version__})


async def list_models(request: web.Request) -> web.Response:
    model = request.app[MODEL_KEY]
    return web.json_response({
        "object": "list",
        "data": [{
            "id": model,
            "object": "model",
            "created": int(time.time()),
            "owned_by": "vllm-trianglemix-tpu",
        }],
    })


async def metrics(request: web.Request) -> web.Response:
    try:
        from prometheus_client import generate_latest

        return web.Response(body=generate_latest(),
                            content_type="text/plain")
    except ImportError:
        return _json_error("prometheus_client unavailable", 501)


def _resolve_prompts(req: CompletionRequest) -> list:
    p = req.prompt
    if isinstance(p, str):
        return [p]
    if isinstance(p, list) and p and isinstance(p[0], int):
        return [p]
    if isinstance(p, list):
        return list(p)
    raise ValueError("invalid prompt")


async def create_completion(request: web.Request) -> web.StreamResponse:
    app = request.app
    engine = app[ENGINE_KEY]
    try:
        body = CompletionRequest(**await request.json())
        prompts = _resolve_prompts(body)
        params = body.to_sampling_params()
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))

    request_id = f"cmpl-{uuid.uuid4().hex}"
    model = body.model or app[MODEL_KEY]

    if body.stream:
        if len(prompts) != 1:
            return _json_error("streaming supports a single prompt")
        return await _stream_completion(request, engine, prompts[0], params,
                                        request_id, model, chat=False)

    usage = UsageCounter()
    choices = []

    async def run_one(i, prompt):
        final = None
        async for out in engine.generate(prompt, params, f"{request_id}-{i}"):
            final = out
        return i, final

    try:
        results = await asyncio.gather(
            *(run_one(i, p) for i, p in enumerate(prompts)))
    except EngineDeadError as e:
        return _json_error(str(e), 500)
    except ValueError as e:
        return _json_error(str(e))

    tokenizer = engine.tokenizer
    for i, final in sorted(results):
        comp = final.outputs[0]
        usage.prompt_tokens += len(final.prompt_token_ids)
        usage.completion_tokens += len(comp.token_ids)

        def tok_str(tid):
            return (tokenizer.decode([tid]) if tokenizer is not None
                    else str(tid))

        lp_block = None
        if comp.logprobs is not None or (body.echo
                                         and final.prompt_logprobs):
            # OpenAI legacy logprobs shape; echo=true prepends the prompt
            # tokens with their prompt_logprobs (first token: null).
            k = body.logprobs or 0
            lp_block = {"tokens": [], "token_logprobs": [],
                        "top_logprobs": [], "text_offset": []}
            offset = 0
            rows = []
            if body.echo and final.prompt_logprobs:
                rows.extend(zip(final.prompt_token_ids,
                                final.prompt_logprobs))
            rows.extend(zip(comp.token_ids, comp.logprobs or []))
            for tid, row in rows:
                s = tok_str(tid)
                lp_block["tokens"].append(s)
                lp_block["token_logprobs"].append(
                    row.get(tid) if row else None)
                top = (sorted(row.items(), key=lambda kv: -kv[1])[:k]
                       if row else [])
                lp_block["top_logprobs"].append(
                    {tok_str(t): v for t, v in top} if row else None)
                lp_block["text_offset"].append(offset)
                offset += len(s)
        text = comp.text
        if body.echo:
            prompt_text = final.prompt
            if prompt_text is None and tokenizer is not None:
                prompt_text = tokenizer.decode(final.prompt_token_ids)
            text = (prompt_text or "") + text
        choices.append({
            "index": i,
            "text": text,
            "finish_reason": comp.finish_reason,
            "logprobs": lp_block,
        })
    return web.json_response(
        completion_response(request_id, model, choices, usage.as_dict()))


def _decode_data_url(url: str):
    """data:image/...;base64,XXXX → image array. HTTP(S) fetching is
    deliberately unsupported (no egress from the serving host)."""
    import base64
    import io

    if not url.startswith("data:"):
        raise ValueError(
            "only data: image URLs are supported (base64-embedded)")
    try:
        b64 = url.split(",", 1)[1]
        raw = base64.b64decode(b64)
    except Exception as e:  # noqa: BLE001
        raise ValueError(f"invalid data URL: {e}") from e
    try:
        from PIL import Image

        return Image.open(io.BytesIO(raw)).convert("RGB")
    except ImportError:
        import numpy as np

        # PIL-free fallback: raw npy payloads.
        return np.load(io.BytesIO(raw), allow_pickle=False)


def _decode_video_data_url(url: str):
    """data: URL -> multi-frame media. Animated PIL formats (GIF/APNG)
    keep their frames (no RGB flattening); npy payloads load as
    [F, H, W, 3] arrays."""
    import base64
    import io

    if not url.startswith("data:"):
        raise ValueError(
            "only data: video URLs are supported (base64-embedded "
            "GIF/APNG or npy frame stacks)")
    raw = base64.b64decode(url.split(",", 1)[1])
    try:
        from PIL import Image

        img = Image.open(io.BytesIO(raw))
        img.load()
        return img
    except Exception:  # noqa: BLE001
        import numpy as np

        return np.load(io.BytesIO(raw), allow_pickle=False)


def _extract_chat_images(messages: list[dict]) -> tuple[list, list]:
    """OpenAI content-part lists → flat text with <image>/<video> markers
    plus the decoded media (reference: chat_utils multimodal content
    parsing; video_url follows the vLLM extension of the OpenAI
    schema)."""
    images: list = []
    videos: list = []
    for m in messages:
        content = m.get("content")
        if not isinstance(content, list):
            continue
        text_parts = []
        for part in content:
            ptype = part.get("type")
            if ptype == "text":
                text_parts.append(part.get("text", ""))
            elif ptype == "image_url":
                url = (part.get("image_url") or {}).get("url", "")
                images.append(_decode_data_url(url))
                text_parts.append("<image>")
            elif ptype == "video_url":
                url = (part.get("video_url") or {}).get("url", "")
                videos.append(_decode_video_data_url(url))
                text_parts.append("<video>")
            else:
                raise ValueError(f"unsupported content part {ptype!r}")
        m["content"] = "\n".join(text_parts)
    return images, videos


async def create_chat_completion(request: web.Request) -> web.StreamResponse:
    app = request.app
    engine = app[ENGINE_KEY]
    tokenizer = engine.tokenizer
    try:
        body = ChatCompletionRequest(**await request.json())
        params = body.to_sampling_params()
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))
    if tokenizer is None:
        return _json_error("chat requires a tokenizer with a chat template",
                           501)
    try:
        messages = [m.model_dump(exclude_none=True) for m in body.messages]
        images, videos = _extract_chat_images(messages)
        template_kwargs = {}
        if body.tools:
            template_kwargs["tools"] = body.tools
        prompt_ids = tokenizer.apply_chat_template(
            messages,
            tokenize=True,
            add_generation_prompt=body.add_generation_prompt,
            chat_template=body.chat_template,
            **template_kwargs,
        )
    except ValueError as e:
        return _json_error(str(e))
    except Exception as e:  # noqa: BLE001
        return _json_error(f"chat template failed: {e}")
    if images or videos:
        # Placeholder <image>/<video> tokens in prompt_ids expand to
        # per-item spans in the engine Processor
        # (multimodal/processor.py).
        mm = {}
        if images:
            mm["image"] = images
        if videos:
            mm["video"] = videos
        prompt_ids = {"prompt_token_ids": prompt_ids,
                      "multi_modal_data": mm}

    request_id = f"chatcmpl-{uuid.uuid4().hex}"
    model = body.model or app[MODEL_KEY]

    if body.stream:
        return await _stream_completion(
            request, engine, prompt_ids, params, request_id, model,
            chat=True, enable_tools=bool(body.tools),
            tool_format=app.get(TOOL_PARSER_KEY, "hermes"),
            reasoning_format=app.get(REASONING_PARSER_KEY, "qwen3"))

    try:
        final = await engine.generate_once(prompt_ids, params, request_id)
    except EngineDeadError as e:
        return _json_error(str(e), 500)
    except ValueError as e:
        return _json_error(str(e))
    comp = final.outputs[0]
    usage = UsageCounter()
    usage.prompt_tokens = len(final.prompt_token_ids)
    usage.completion_tokens = len(comp.token_ids)
    from vllm_trianglemix_tpu.entrypoints.openai.parsers import (
        parse_chat_output,
    )

    message = parse_chat_output(
        comp.text, enable_tools=bool(body.tools),
        tool_format=app.get(TOOL_PARSER_KEY, "hermes"),
        reasoning_format=app.get(REASONING_PARSER_KEY, "qwen3"))
    finish_reason = comp.finish_reason
    if message.get("tool_calls"):
        finish_reason = "tool_calls"
    choices = [{
        "index": 0,
        "message": message,
        "finish_reason": finish_reason,
    }]
    return web.json_response(
        chat_response(request_id, model, choices, usage.as_dict()))


async def _stream_completion(request: web.Request, engine: AsyncLLM, prompt,
                             params, request_id: str, model: str,
                             chat: bool, enable_tools: bool = False,
                             tool_format: str = "hermes",
                             reasoning_format: str = "qwen3",
                             ) -> web.StreamResponse:
    resp = web.StreamResponse(headers={
        "Content-Type": "text/event-stream",
        "Cache-Control": "no-cache",
    })
    await resp.prepare(request)
    sent_len = 0
    created = int(time.time())
    obj = "chat.completion.chunk" if chat else "text_completion"

    stream_parser = None
    if chat:
        from vllm_trianglemix_tpu.entrypoints.openai.parsers import (
            ChatStreamParser,
        )

        # Incremental tool-call / reasoning extraction (reference:
        # extract_tool_calls_streaming) — marker-prefix text is held back
        # and completed calls arrive as tool_calls deltas.
        stream_parser = ChatStreamParser(enable_tools=enable_tools,
                                         tool_format=tool_format,
                                         reasoning_format=reasoning_format)
        first = {
            "id": request_id, "object": obj, "created": created,
            "model": model,
            "choices": [{"index": 0,
                         "delta": {"role": "assistant", "content": ""},
                         "finish_reason": None}],
        }
        await resp.write(f"data: {json.dumps(first)}\n\n".encode())

    async def write_chat_delta(delta, finish_reason):
        choice = {"index": 0, "delta": delta,
                  "finish_reason": finish_reason}
        chunk = {"id": request_id, "object": obj, "created": created,
                 "model": model, "choices": [choice]}
        await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())

    finished = False
    try:
        async for out in engine.generate(prompt, params, request_id):
            comp = out.outputs[0]
            if chat:
                deltas = stream_parser.deltas(comp.text,
                                              finished=out.finished)
                finish_reason = None
                if out.finished:
                    finish_reason = ("tool_calls"
                                     if stream_parser.emitted_tool_calls
                                     else comp.finish_reason)
                if not deltas and out.finished:
                    deltas = [{}]
                for i, delta in enumerate(deltas):
                    last = i == len(deltas) - 1
                    await write_chat_delta(
                        delta, finish_reason if last else None)
                finished = out.finished
                continue
            delta = comp.text[sent_len:]
            sent_len = len(comp.text)
            if not delta and not out.finished:
                continue
            choice = {"index": 0, "text": delta,
                      "finish_reason": comp.finish_reason,
                      "logprobs": None}
            chunk = {"id": request_id, "object": obj, "created": created,
                     "model": model, "choices": [choice]}
            await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
            finished = out.finished
    except (EngineDeadError, ValueError) as e:
        err = {"error": {"message": str(e)}}
        await resp.write(f"data: {json.dumps(err)}\n\n".encode())
        finished = True
    finally:
        if not finished:
            # client disconnected mid-stream: free engine resources
            # (reference: abort on disconnect)
            await engine.abort(request_id)
    await resp.write(b"data: [DONE]\n\n")
    await resp.write_eof()
    return resp


async def _transcribe(request: web.Request, translate: bool
                      ) -> web.Response:
    """OpenAI /v1/audio/transcriptions|translations (reference
    serving_transcription role): multipart audio file -> Whisper-family
    decode. WAV in; other containers need client-side decoding."""
    app = request.app
    engine = app[ENGINE_KEY]
    try:
        form = await request.post()
        f = form.get("file")
        if f is None:
            return _json_error("missing 'file' form field")
        data = f.file.read() if hasattr(f, "file") else (
            f.encode() if isinstance(f, str) else bytes(f))
        response_format = form.get("response_format", "json")
        temperature = float(form.get("temperature") or 0.0)
        language = form.get("language")
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))

    from vllm_trianglemix_tpu.multimodal.audio import (
        decode_wav,
        resample_linear,
    )
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    try:
        wav, sr = decode_wav(data)
    except Exception as e:  # noqa: BLE001
        return _json_error(f"could not decode audio (WAV only): {e}")
    wav = resample_linear(wav, sr)

    # Decoder prompt: the model's default transcription prompt, with the
    # language / task tokens overridden when the tokenizer knows them.
    prompt: dict = {"multi_modal_data": {"audio": wav}}
    tokenizer = engine.tokenizer
    mm_config = getattr(engine.engine.processor, "mm_config", None) or {}
    default_ids = mm_config.get("default_prompt")
    if tokenizer is not None and default_ids:
        ids = list(default_ids)

        def tok(s):
            t = tokenizer.convert_tokens_to_ids(s)
            return None if t is None or t == tokenizer.unk_token_id \
                else t

        if language:
            lang = tok(f"<|{language}|>")
            if lang is not None and len(ids) > 1:
                ids[1] = lang
        if translate:
            tr = tok("<|translate|>")
            ts = tok("<|transcribe|>")
            if tr is not None:
                if ts is not None and ts in ids:
                    ids = [tr if t == ts else t for t in ids]
                elif len(ids) > 2:
                    ids[2] = tr
        prompt["prompt_token_ids"] = ids

    max_len = engine.engine_config.model.max_model_len
    n_prompt = len(prompt.get("prompt_token_ids") or default_ids or [1])
    params = SamplingParams(temperature=temperature,
                            max_tokens=max(1, max_len - n_prompt - 1),
                            skip_special_tokens=True)
    request_id = f"trsc-{uuid.uuid4().hex}"
    final = None
    try:
        async for out in engine.generate(prompt, params, request_id):
            final = out
    except EngineDeadError as e:
        return _json_error(str(e), 500)
    except ValueError as e:
        return _json_error(str(e))

    text = final.outputs[0].text if final is not None else ""
    if response_format == "text":
        return web.Response(text=text, content_type="text/plain")
    body = {"text": text}
    if response_format == "verbose_json":
        body.update(task="translate" if translate else "transcribe",
                    language=language or "", duration=len(wav) / 16000.0)
    return web.json_response(body)


async def create_transcription(request: web.Request) -> web.Response:
    return await _transcribe(request, translate=False)


async def create_translation(request: web.Request) -> web.Response:
    return await _transcribe(request, translate=True)


async def create_embeddings(request: web.Request) -> web.Response:
    """OpenAI /v1/embeddings (reference serving_embedding role)."""
    app = request.app
    engine = app[ENGINE_KEY]
    try:
        body = await request.json()
        inputs = body["input"]
        dimensions = int(body.get("dimensions") or 0)
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))
    if isinstance(inputs, str):
        inputs = [inputs]
    elif isinstance(inputs, list) and inputs \
            and isinstance(inputs[0], int):
        inputs = [inputs]

    from vllm_trianglemix_tpu.pooling_params import PoolingParams
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    pooling = PoolingParams(dimensions=dimensions)
    request_id = f"embd-{uuid.uuid4().hex}"
    usage = UsageCounter()

    async def run_one(i, prompt):
        final = None
        async for out in engine.generate(
                prompt, SamplingParams(max_tokens=1), f"{request_id}-{i}",
                pooling_params=pooling):
            final = out
        return i, final

    try:
        results = await asyncio.gather(
            *(run_one(i, p) for i, p in enumerate(inputs)))
    except EngineDeadError as e:
        return _json_error(str(e), 500)
    except ValueError as e:
        return _json_error(str(e))

    data = []
    for i, final in sorted(results):
        usage.prompt_tokens += len(final.prompt_token_ids)
        data.append({"object": "embedding", "index": i,
                     "embedding": final.pooled})
    return web.json_response({
        "object": "list",
        "data": data,
        "model": body.get("model") or app[MODEL_KEY],
        "usage": usage.as_dict(),
    })


async def _embed_texts(engine: AsyncLLM, texts: list, request_id: str,
                       normalize: bool = True) -> list:
    """Pooled (normalized) embeddings for a list of texts/token lists."""
    from vllm_trianglemix_tpu.pooling_params import PoolingParams
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    pooling = PoolingParams(normalize=normalize)

    async def run_one(i, prompt):
        final = None
        async for out in engine.generate(
                prompt, SamplingParams(max_tokens=1), f"{request_id}-{i}",
                pooling_params=pooling):
            final = out
        return i, final

    results = await asyncio.gather(
        *(run_one(i, p) for i, p in enumerate(texts)))
    ordered = [None] * len(texts)
    n_tokens = 0
    for i, final in results:
        ordered[i] = final.pooled
        n_tokens += len(final.prompt_token_ids)
    return ordered, n_tokens


def _dot(a, b) -> float:
    return float(sum(x * y for x, y in zip(a, b)))


async def create_score(request: web.Request) -> web.Response:
    """/v1/score (reference serving_score.py): similarity of text pairs.

    Embedding-similarity scoring (cosine of normalized pooled vectors) —
    the reference's path for embedding models; cross-encoder heads can
    override later. text_1/text_2 broadcast 1-to-N like the reference."""
    app = request.app
    engine = app[ENGINE_KEY]
    try:
        body = await request.json()
        t1 = body["text_1"]
        t2 = body["text_2"]
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))
    t1 = [t1] if isinstance(t1, str) else list(t1)
    t2 = [t2] if isinstance(t2, str) else list(t2)
    if len(t1) == 1 and len(t2) > 1:
        t1 = t1 * len(t2)
    if len(t2) == 1 and len(t1) > 1:
        t2 = t2 * len(t1)
    if len(t1) != len(t2):
        return _json_error("text_1 and text_2 lengths do not broadcast")

    request_id = f"score-{uuid.uuid4().hex}"
    try:
        embs, n_tok = await _embed_texts(engine, t1 + t2, request_id)
    except EngineDeadError as e:
        return _json_error(str(e), 500)
    except ValueError as e:
        return _json_error(str(e))
    n = len(t1)
    data = [{"object": "score", "index": i,
             "score": _dot(embs[i], embs[n + i])} for i in range(n)]
    return web.json_response({
        "object": "list",
        "id": request_id,
        "data": data,
        "model": body.get("model") or app[MODEL_KEY],
        "usage": {"prompt_tokens": n_tok, "total_tokens": n_tok},
    })


async def create_rerank(request: web.Request) -> web.Response:
    """/v1/rerank + /v2/rerank (reference serving_score.py rerank
    surface, Jina/Cohere-compatible): order documents by relevance to the
    query via embedding similarity."""
    app = request.app
    engine = app[ENGINE_KEY]
    try:
        body = await request.json()
        query = body["query"]
        documents = list(body["documents"])
        top_n = int(body.get("top_n") or len(documents))
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))

    request_id = f"rerank-{uuid.uuid4().hex}"
    try:
        embs, n_tok = await _embed_texts(engine, [query] + documents,
                                         request_id)
    except EngineDeadError as e:
        return _json_error(str(e), 500)
    except ValueError as e:
        return _json_error(str(e))
    scores = [(_dot(embs[0], e), i) for i, e in enumerate(embs[1:])]
    scores.sort(key=lambda x: (-x[0], x[1]))
    results = [{
        "index": i,
        "document": {"text": documents[i]},
        "relevance_score": s,
    } for s, i in scores[:top_n]]
    return web.json_response({
        "id": request_id,
        "model": body.get("model") or app[MODEL_KEY],
        "results": results,
        "usage": {"prompt_tokens": n_tok, "total_tokens": n_tok},
    })


async def create_classify(request: web.Request) -> web.Response:
    """/classify (reference serving_classification role): class
    probabilities from a sequence-classification model's score head."""
    app = request.app
    engine = app[ENGINE_KEY]
    try:
        body = await request.json()
        inputs = body["input"]
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))
    if isinstance(inputs, str):
        inputs = [inputs]

    from vllm_trianglemix_tpu.pooling_params import PoolingParams
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    request_id = f"classify-{uuid.uuid4().hex}"
    pooling = PoolingParams(task="classify")

    async def run_one(i, prompt):
        final = None
        async for out in engine.generate(
                prompt, SamplingParams(max_tokens=1), f"{request_id}-{i}",
                pooling_params=pooling):
            final = out
        return i, final

    try:
        results = await asyncio.gather(
            *(run_one(i, p) for i, p in enumerate(inputs)))
    except EngineDeadError as e:
        return _json_error(str(e), 500)
    except ValueError as e:
        return _json_error(str(e))
    data = []
    n_tok = 0
    for i, final in sorted(results):
        probs = [float(x) for x in final.pooled]
        n_tok += len(final.prompt_token_ids)
        data.append({"object": "classify", "index": i, "probs": probs,
                     "label": int(max(range(len(probs)),
                                      key=probs.__getitem__))})
    return web.json_response({
        "id": request_id,
        "object": "list",
        "data": data,
        "model": body.get("model") or app[MODEL_KEY],
        "usage": {"prompt_tokens": n_tok, "total_tokens": n_tok},
    })


def _response_json(entry: dict) -> dict:
    return {k: v for k, v in entry.items() if not k.startswith("_")}


async def _run_response(engine: AsyncLLM, entry: dict, prompt_ids,
                        params, request_id: str) -> None:
    try:
        final = await engine.generate_once(prompt_ids, params, request_id)
    except asyncio.CancelledError:
        entry["status"] = "cancelled"
        await engine.abort(request_id)
        return
    except Exception as e:  # noqa: BLE001
        entry["status"] = "failed"
        entry["error"] = {"message": str(e)}
        return
    comp = final.outputs[0]
    entry["status"] = "completed"
    entry["output"] = [{
        "type": "message",
        "id": f"msg_{uuid.uuid4().hex}",
        "role": "assistant",
        "status": "completed",
        "content": [{
            "type": "output_text",
            "text": comp.text,
            "annotations": [],
        }],
    }]
    entry["usage"] = {
        "input_tokens": len(final.prompt_token_ids),
        "output_tokens": len(comp.token_ids),
        "total_tokens": (len(final.prompt_token_ids)
                         + len(comp.token_ids)),
    }


async def create_response(request: web.Request) -> web.Response:
    """/v1/responses (reference serving_responses.py, core subset): the
    OpenAI Responses API over the chat machinery — string or message-list
    input, optional instructions, stored responses (GET /v1/responses/{id}),
    and background mode with cancellation."""
    app = request.app
    engine = app[ENGINE_KEY]
    tokenizer = engine.tokenizer
    if tokenizer is None:
        return _json_error("responses requires a tokenizer", 501)
    try:
        body = await request.json()
        inp = body.get("input")
        if inp is None:
            raise ValueError("missing 'input'")
        if body.get("stream"):
            raise ValueError("responses streaming not supported yet")
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))

    messages = []
    if body.get("instructions"):
        messages.append({"role": "system", "content": body["instructions"]})
    if isinstance(inp, str):
        messages.append({"role": "user", "content": inp})
    else:
        for m in inp:
            messages.append({"role": m.get("role", "user"),
                             "content": m.get("content", "")})
    try:
        prompt_ids = tokenizer.apply_chat_template(
            messages, tokenize=True, add_generation_prompt=True)
    except Exception as e:  # noqa: BLE001
        return _json_error(f"chat template failed: {e}")

    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    params = SamplingParams(
        max_tokens=body.get("max_output_tokens") or 256,
        temperature=float(body.get("temperature", 1.0)),
        top_p=float(body.get("top_p", 1.0)),
    )
    request_id = f"resp_{uuid.uuid4().hex}"
    entry = {
        "id": request_id,
        "object": "response",
        "created_at": int(time.time()),
        "status": "in_progress",
        "background": bool(body.get("background")),
        "model": body.get("model") or app[MODEL_KEY],
        "output": [],
    }
    if body.get("store", True):
        app[RESPONSES_KEY][request_id] = entry

    coro = _run_response(engine, entry, prompt_ids, params, request_id)
    if body.get("background"):
        entry["_task"] = asyncio.get_running_loop().create_task(coro)
        return web.json_response(_response_json(entry))
    await coro
    if entry["status"] == "failed":
        return _json_error(entry["error"]["message"], 500)
    return web.json_response(_response_json(entry))


async def get_response(request: web.Request) -> web.Response:
    """GET /v1/responses/{id} (reference api_server.py:533)."""
    entry = request.app[RESPONSES_KEY].get(
        request.match_info["response_id"])
    if entry is None:
        return _json_error("response not found", 404)
    return web.json_response(_response_json(entry))


async def cancel_response(request: web.Request) -> web.Response:
    """POST /v1/responses/{id}/cancel (reference api_server.py:564):
    cancel an in-flight background response."""
    entry = request.app[RESPONSES_KEY].get(
        request.match_info["response_id"])
    if entry is None:
        return _json_error("response not found", 404)
    task = entry.get("_task")
    if entry["status"] == "in_progress" and task is not None:
        task.cancel()
        try:
            await task
        except asyncio.CancelledError:
            pass
        entry["status"] = "cancelled"
    return web.json_response(_response_json(entry))


async def create_pooling(request: web.Request) -> web.Response:
    """/pooling (reference api_server.py:701 serving_pooling): raw pooled
    hidden-state vectors without the embedding-API normalization."""
    app = request.app
    engine = app[ENGINE_KEY]
    try:
        body = await request.json()
        inputs = body["input"]
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))
    if isinstance(inputs, str):
        inputs = [inputs]
    elif isinstance(inputs, list) and inputs and isinstance(inputs[0], int):
        inputs = [inputs]

    request_id = f"pool-{uuid.uuid4().hex}"
    try:
        vecs, n_tok = await _embed_texts(engine, inputs, request_id,
                                         normalize=False)
    except EngineDeadError as e:
        return _json_error(str(e), 500)
    except ValueError as e:
        return _json_error(str(e))
    return web.json_response({
        "id": request_id,
        "object": "list",
        "created": int(time.time()),
        "model": body.get("model") or app[MODEL_KEY],
        "data": [{"object": "pooling", "index": i, "data": v}
                 for i, v in enumerate(vecs)],
        "usage": {"prompt_tokens": n_tok, "total_tokens": n_tok},
    })


async def invocations(request: web.Request) -> web.StreamResponse:
    """/invocations (reference api_server.py:1148, SageMaker entry):
    dispatch on the payload shape to chat / completions / embeddings."""
    try:
        body = await request.json()
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))
    if "messages" in body:
        return await create_chat_completion(_Rewound(request, body))
    if "prompt" in body:
        return await create_completion(_Rewound(request, body))
    if "input" in body:
        return await create_embeddings(_Rewound(request, body))
    return _json_error(
        "cannot infer task: provide 'messages', 'prompt', or 'input'")


class _Rewound:
    """Minimal request proxy that re-serves an already-read JSON body."""

    def __init__(self, request: web.Request, body: dict) -> None:
        self._request = request
        self._body = body

    def __getattr__(self, name):
        return getattr(self._request, name)

    async def json(self):
        return self._body


async def sleep_engine(request: web.Request) -> web.Response:
    """/sleep?level=1|2 (reference api_server.py:1001): release device
    memory for RLHF colocation. Level 1 keeps weights on host for a fast
    wake; level 2 drops them (wake reloads from the checkpoint)."""
    engine = request.app[ENGINE_KEY]
    try:
        level = int(request.query.get("level", "1"))
    except ValueError:
        return _json_error("level must be an integer")
    # A request that just completed for its client may still be retiring
    # from the engine loop; drain briefly before declaring the engine
    # busy, and make busy a retryable 409 (not a blanket 500).
    for _ in range(40):
        if not engine.engine.has_unfinished_requests():
            break
        await asyncio.sleep(0.025)
    else:
        return _json_error("engine busy: unfinished requests", 409)
    try:
        await asyncio.get_running_loop().run_in_executor(
            None, engine.engine.sleep, level)
    except ValueError as e:
        return _json_error(str(e), 409)
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e), 500)
    return web.Response(status=200)


async def wake_engine(request: web.Request) -> web.Response:
    engine = request.app[ENGINE_KEY]
    try:
        await asyncio.get_running_loop().run_in_executor(
            None, engine.engine.wake_up)
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e), 500)
    return web.Response(status=200)


async def is_sleeping(request: web.Request) -> web.Response:
    engine = request.app[ENGINE_KEY]
    return web.json_response(
        {"is_sleeping": bool(engine.engine.is_sleeping())})


async def load_lora_adapter(request: web.Request) -> web.Response:
    """/v1/load_lora_adapter (reference api_server.py:1217): hot-load a
    peft adapter into a preallocated slot."""
    engine = request.app[ENGINE_KEY]
    try:
        body = await request.json()
        name, path = body["lora_name"], body["lora_path"]
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))
    try:
        await asyncio.get_running_loop().run_in_executor(
            None, engine.engine.load_lora_adapter, name, path)
    except ValueError as e:
        return _json_error(str(e))
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e), 500)
    return web.Response(
        text=f"Success: LoRA adapter '{name}' added successfully.")


async def unload_lora_adapter(request: web.Request) -> web.Response:
    engine = request.app[ENGINE_KEY]
    try:
        body = await request.json()
        name = body["lora_name"]
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))
    try:
        await asyncio.get_running_loop().run_in_executor(
            None, engine.engine.unload_lora_adapter, name)
    except ValueError as e:
        return _json_error(str(e))
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e), 500)
    return web.Response(
        text=f"Success: LoRA adapter '{name}' removed successfully.")


async def start_profile(request: web.Request) -> web.Response:
    engine = request.app[ENGINE_KEY]
    try:
        body = await request.json() if request.can_read_body else {}
    except Exception:  # noqa: BLE001
        body = {}
    engine.engine.start_profile(body.get("trace_dir"))
    return web.Response(status=200)


async def stop_profile(request: web.Request) -> web.Response:
    engine = request.app[ENGINE_KEY]
    engine.engine.stop_profile()
    return web.Response(status=200)


async def reset_prefix_cache(request: web.Request) -> web.Response:
    """Drop the prefix-cache index (reference /reset_prefix_cache)."""
    engine = request.app[ENGINE_KEY]
    ok = engine.engine.reset_prefix_cache()
    return web.json_response({"reset": bool(ok)})


async def tokenize(request: web.Request) -> web.Response:
    engine = request.app[ENGINE_KEY]
    if engine.tokenizer is None:
        return _json_error("no tokenizer loaded", 501)
    try:
        body = TokenizeRequest(**await request.json())
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))
    ids = engine.tokenizer.encode(body.prompt,
                                  add_special_tokens=body.add_special_tokens)
    return web.json_response({"tokens": ids, "count": len(ids),
                              "max_model_len":
                              engine.engine_config.model.max_model_len})


async def detokenize(request: web.Request) -> web.Response:
    engine = request.app[ENGINE_KEY]
    if engine.tokenizer is None:
        return _json_error("no tokenizer loaded", 501)
    try:
        body = DetokenizeRequest(**await request.json())
    except Exception as e:  # noqa: BLE001
        return _json_error(str(e))
    return web.json_response(
        {"prompt": engine.tokenizer.decode(body.tokens)})


def build_app(engine: AsyncLLM, model_name: str,
              tool_call_parser: str = "hermes",
              reasoning_parser: str = "qwen3") -> web.Application:
    from vllm_trianglemix_tpu.entrypoints.openai.parsers import (
        REASONING_FORMATS,
        TOOL_FORMATS,
    )

    if tool_call_parser not in TOOL_FORMATS:
        raise ValueError(f"unknown --tool-call-parser {tool_call_parser!r}; "
                         f"choose from {sorted(TOOL_FORMATS)}")
    if reasoning_parser not in REASONING_FORMATS:
        raise ValueError(f"unknown --reasoning-parser {reasoning_parser!r}; "
                         f"choose from {sorted(REASONING_FORMATS)}")
    app = web.Application(client_max_size=64 * 2**20)
    app[ENGINE_KEY] = engine
    app[MODEL_KEY] = model_name
    app[TOOL_PARSER_KEY] = tool_call_parser
    app[REASONING_PARSER_KEY] = reasoning_parser
    app.router.add_get("/health", health)
    app.router.add_get("/version", version)
    app.router.add_get("/v1/models", list_models)
    app.router.add_get("/metrics", metrics)
    app.router.add_post("/v1/completions", create_completion)
    app.router.add_post("/v1/chat/completions", create_chat_completion)
    app.router.add_post("/v1/embeddings", create_embeddings)
    app.router.add_post("/v1/audio/transcriptions", create_transcription)
    app.router.add_post("/v1/audio/translations", create_translation)
    app[RESPONSES_KEY] = {}
    app.router.add_post("/v1/responses", create_response)
    app.router.add_get("/v1/responses/{response_id}", get_response)
    app.router.add_post("/v1/responses/{response_id}/cancel",
                        cancel_response)
    app.router.add_post("/pooling", create_pooling)
    app.router.add_post("/invocations", invocations)
    app.router.add_post("/sleep", sleep_engine)
    app.router.add_post("/wake_up", wake_engine)
    app.router.add_get("/is_sleeping", is_sleeping)
    app.router.add_post("/v1/load_lora_adapter", load_lora_adapter)
    app.router.add_post("/v1/unload_lora_adapter", unload_lora_adapter)
    app.router.add_post("/classify", create_classify)
    app.router.add_post("/v1/classify", create_classify)
    app.router.add_post("/v1/score", create_score)
    app.router.add_post("/score", create_score)
    app.router.add_post("/v1/rerank", create_rerank)
    app.router.add_post("/v2/rerank", create_rerank)
    app.router.add_post("/rerank", create_rerank)
    app.router.add_post("/tokenize", tokenize)
    app.router.add_post("/detokenize", detokenize)
    app.router.add_post("/start_profile", start_profile)
    app.router.add_post("/stop_profile", stop_profile)
    app.router.add_post("/reset_prefix_cache", reset_prefix_cache)
    return app


def run_server(engine_config, host: str = "0.0.0.0", port: int = 8000,
               model_name: Optional[str] = None,
               tool_call_parser: str = "hermes",
               reasoning_parser: str = "qwen3") -> None:
    engine = AsyncLLM.from_engine_config(engine_config)
    model_name = model_name or engine_config.model.model
    try:
        from vllm_trianglemix_tpu.metrics.loggers import PrometheusStatLogger

        engine.engine.stat_loggers.append(PrometheusStatLogger(model_name))
    except Exception as e:  # noqa: BLE001 (duplicate registry in tests)
        logger.warning("prometheus logger unavailable: %s", e)
    app = build_app(engine, model_name, tool_call_parser=tool_call_parser,
                    reasoning_parser=reasoning_parser)
    logger.info("serving on %s:%d", host, port)
    web.run_app(app, host=host, port=port, print=None)
