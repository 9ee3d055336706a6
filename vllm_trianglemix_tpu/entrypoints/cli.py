"""`vtt` command-line interface.

Mirror of the reference CLI (vllm/entrypoints/cli/main.py: serve / chat /
complete / bench) on argparse. Engine flags map 1:1 onto EngineConfig
fields (the reference's EngineArgs role, engine/arg_utils.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_engine_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("model", help="checkpoint directory or architecture name")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32", "float16"])
    p.add_argument("--max-model-len", type=int, default=4096)
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--max-num-seqs", type=int, default=64)
    p.add_argument("--max-num-batched-tokens", type=int, default=2048)
    p.add_argument("--multi-step-decode", type=int, default=1,
                   help="device-side autoregressive steps per dispatch")
    p.add_argument("--multiprocess-engine", action="store_true",
                   help="run the engine core in a background process "
                        "(ZMQ), isolating device work from the frontend")
    p.add_argument("--kv-cache-dtype", default="auto",
                   choices=["auto", "fp8", "int8"])
    p.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
    p.add_argument("--pipeline-parallel-size", "-pp", type=int, default=1)
    p.add_argument("--context-parallel-size", "-cp", type=int, default=1,
                   help="decode context parallelism: KV pages sharded "
                        "over a cp mesh axis with LSE-merged attention")
    p.add_argument("--enable-eplb", action="store_true",
                   help="expert-parallel load balancing (periodic "
                        "measured-load expert repacking)")
    p.add_argument("--eplb-interval", type=int, default=256)
    p.add_argument("--speculative-method", default=None,
                   choices=["ngram", "eagle"],
                   help="speculative decoding proposer")
    p.add_argument("--num-speculative-tokens", type=int, default=4)
    p.add_argument("--speculative-model", default=None,
                   help="EAGLE draft checkpoint dir")
    p.add_argument("--data-parallel-size", "-dp", type=int, default=1,
                   help="engine replicas behind a least-loaded router "
                        "(implies --multiprocess-engine)")
    p.add_argument("--enable-expert-parallel", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-enable-prefix-caching", action="store_true")
    p.add_argument("--load-format", default="auto",
                   choices=["auto", "dummy"])
    p.add_argument("--quantization", "-q", default=None)
    p.add_argument("--enable-trianglemix", action="store_true")
    p.add_argument("--trianglemix-layers", type=int, default=None,
                   help="number of triangle layers (first-N policy)")
    p.add_argument("--warmup", action="store_true",
                   help="precompile all (token, request) buckets at startup")
    p.add_argument("--enable-cascade-attention", action="store_true",
                   help="attend batch-shared prefixes once "
                        "(attention/cascade.py)")
    p.add_argument("--max-loras", type=int, default=0,
                   help="preallocate LoRA slots for runtime "
                        "/v1/load_lora_adapter")
    p.add_argument("--max-lora-rank", type=int, default=0,
                   help="rank capacity for dynamically loaded adapters")
    p.add_argument("--num-hosts", type=int, default=1,
                   help="multi-host serving: total host processes "
                        "(scripts/launch_multihost.py)")
    p.add_argument("--host-id", type=int, default=0)
    p.add_argument("--control-address", default=None,
                   help="multi-host ZMQ step-broadcast root, "
                        "e.g. tcp://host0:8576")


def _engine_config(args):
    from vllm_trianglemix_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoRAConfig,
        ModelConfig,
        ParallelConfig,
        SchedulerConfig,
        TriangleMixConfig,
    )

    tri = TriangleMixConfig()
    if args.enable_trianglemix:
        tri = TriangleMixConfig(enabled=True,
                                num_triangle_layers=args.trianglemix_layers
                                or 8)
    from vllm_trianglemix_tpu.config import SpeculativeConfig

    spec = SpeculativeConfig()
    if args.speculative_method:
        spec = SpeculativeConfig(
            method=args.speculative_method,
            num_speculative_tokens=args.num_speculative_tokens,
            model=args.speculative_model)
    return EngineConfig(
        speculative=spec,
        multiprocess_engine=(args.multiprocess_engine
                             or args.data_parallel_size > 1),
        model=ModelConfig(model=args.model, dtype=args.dtype,
                          max_model_len=args.max_model_len, seed=args.seed,
                          quantization=args.quantization,
                          load_format=args.load_format,
                          kv_cache_dtype=args.kv_cache_dtype),
        cache=CacheConfig(
            block_size=args.block_size,
            enable_prefix_caching=not args.no_enable_prefix_caching,
            enable_cascade_attention=args.enable_cascade_attention),
        scheduler=SchedulerConfig(
            max_num_seqs=args.max_num_seqs,
            max_num_batched_tokens=args.max_num_batched_tokens,
            multi_step_decode=args.multi_step_decode),
        parallel=ParallelConfig(
            tensor_parallel_size=args.tensor_parallel_size,
            pipeline_parallel_size=args.pipeline_parallel_size,
            data_parallel_size=args.data_parallel_size,
            context_parallel_size=args.context_parallel_size,
            enable_expert_parallel=args.enable_expert_parallel,
            enable_eplb=args.enable_eplb,
            eplb_interval=args.eplb_interval,
            num_hosts=args.num_hosts,
            host_id=args.host_id,
            control_address=args.control_address),
        trianglemix=tri,
        lora=LoRAConfig(max_loras=args.max_loras,
                        max_rank=args.max_lora_rank),
    )


def cmd_serve(args) -> int:
    import dataclasses

    from vllm_trianglemix_tpu.entrypoints.openai.api_server import run_server

    # Serving default: engine core in its own process (reference
    # AsyncMPClient, core_client.py:597) so API-server hiccups can't
    # stall the device loop.
    cfg = _engine_config(args)
    if args.num_hosts > 1:
        # Multi-host serving: the engine must stay in the process that
        # joined jax.distributed (executor/multihost_executor.py); peer
        # hosts run the lockstep worker loop. The launcher
        # (scripts/launch_multihost.py) handles jax.distributed
        # bring-up; reaching here assumes it already ran.
        if args.host_id > 0:
            from vllm_trianglemix_tpu.executor.multihost_executor import (
                run_worker_loop,
            )

            run_worker_loop(cfg)
            return 0
    elif not args.inproc_engine:
        cfg = dataclasses.replace(cfg, multiprocess_engine=True)
    run_server(cfg, host=args.host, port=args.port,
               tool_call_parser=args.tool_call_parser,
               reasoning_parser=args.reasoning_parser)
    return 0


def cmd_complete(args) -> int:
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    llm = LLM(model=args.model, dtype=args.dtype,
              max_model_len=args.max_model_len,
              max_num_seqs=args.max_num_seqs,
              max_num_batched_tokens=args.max_num_batched_tokens,
              load_format=args.load_format,
              quantization=args.quantization)
    params = SamplingParams(max_tokens=args.max_tokens,
                            temperature=args.temperature)
    prompt = args.prompt or sys.stdin.read()
    out = llm.generate([prompt], params)[0]
    print(out.outputs[0].text)
    return 0


def cmd_chat(args) -> int:
    """Interactive chat (reference `vllm chat`)."""
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    llm = LLM(model=args.model, dtype=args.dtype,
              max_model_len=args.max_model_len,
              max_num_seqs=args.max_num_seqs,
              max_num_batched_tokens=args.max_num_batched_tokens,
              multi_step_decode=args.multi_step_decode,
              load_format=args.load_format,
              quantization=args.quantization)
    tok = llm.llm_engine.tokenizer
    if tok is None:
        print("chat requires a tokenizer", file=sys.stderr)
        return 1
    params = SamplingParams(max_tokens=args.max_tokens,
                            temperature=args.temperature)
    messages = []
    if args.system:
        messages.append({"role": "system", "content": args.system})
    print("(/quit to exit)")
    while True:
        try:
            user = input("user> ")
        except (EOFError, KeyboardInterrupt):
            break
        if user.strip() in ("/quit", "/exit"):
            break
        messages.append({"role": "user", "content": user})
        ids = tok.apply_chat_template(messages, tokenize=True,
                                      add_generation_prompt=True)
        out = llm.generate([list(ids)], params)[0].outputs[0].text
        print(f"assistant> {out}")
        messages.append({"role": "assistant", "content": out})
    return 0


def cmd_bench_latency(args) -> int:
    """Single-batch latency sweep (reference `vllm bench latency`)."""
    import numpy as np

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    llm = LLM(model=args.model, dtype=args.dtype,
              max_model_len=args.max_model_len,
              max_num_seqs=args.max_num_seqs,
              max_num_batched_tokens=args.max_num_batched_tokens,
              skip_tokenizer_init=True, load_format=args.load_format,
              quantization=args.quantization)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 1000, size=args.input_len).tolist()
               for _ in range(args.batch_size)]
    params = SamplingParams(max_tokens=args.output_len, temperature=0.0,
                            ignore_eos=True)
    llm.generate(prompts, params)  # warmup
    times = []
    for _ in range(args.num_iters):
        t0 = time.perf_counter()
        llm.generate(prompts, params)
        times.append(time.perf_counter() - t0)
    total_tokens = args.batch_size * args.output_len
    result = {
        "avg_latency_s": sum(times) / len(times),
        "p50_s": sorted(times)[len(times) // 2],
        "decode_tokens_per_s": total_tokens / (sum(times) / len(times)),
        "batch_size": args.batch_size,
        "input_len": args.input_len,
        "output_len": args.output_len,
    }
    print(json.dumps(result))
    return 0


def cmd_bench_throughput(args) -> int:
    """Offline throughput (reference `vllm bench throughput`)."""
    import numpy as np

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    llm = LLM(model=args.model, dtype=args.dtype,
              max_model_len=args.max_model_len,
              max_num_seqs=args.max_num_seqs,
              max_num_batched_tokens=args.max_num_batched_tokens,
              skip_tokenizer_init=True, load_format=args.load_format,
              quantization=args.quantization)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 1000, size=args.input_len).tolist()
               for _ in range(args.num_prompts)]
    params = SamplingParams(max_tokens=args.output_len, temperature=0.0,
                            ignore_eos=True)
    llm.generate(prompts[:2], params)  # warmup
    t0 = time.perf_counter()
    llm.generate(prompts, params)
    dt = time.perf_counter() - t0
    total = args.num_prompts * (args.input_len + args.output_len)
    print(json.dumps({
        "elapsed_s": dt,
        "requests_per_s": args.num_prompts / dt,
        "total_tokens_per_s": total / dt,
        "output_tokens_per_s": args.num_prompts * args.output_len / dt,
    }))
    return 0


def cmd_bench_serving(args) -> int:
    """Online serving benchmark at a fixed request rate (reference
    `vllm bench serving`, vllm/benchmarks/serve.py role): Poisson
    arrivals against the async engine, TTFT/TPOT/E2E percentiles."""
    import asyncio

    import numpy as np

    from vllm_trianglemix_tpu.engine.async_llm import AsyncLLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    cfg = _engine_config(args)
    cfg.model.skip_tokenizer_init = True
    engine = AsyncLLM.from_engine_config(cfg)
    rng = np.random.default_rng(args.seed)
    prompts = [rng.integers(1, 1000, size=args.input_len).tolist()
               for _ in range(args.num_prompts)]
    params = SamplingParams(max_tokens=args.output_len, temperature=0.0,
                            ignore_eos=True)
    if args.request_rate > 0:
        gaps = rng.exponential(1.0 / args.request_rate,
                               size=args.num_prompts)
    else:
        gaps = np.zeros(args.num_prompts)  # burst: all at once

    async def one(i, prompt, t_start):
        ttft = None
        n_out = 0
        async for out in engine.generate(prompt, params, f"bench-{i}"):
            n_out = len(out.outputs[0].token_ids)
            if ttft is None and n_out > 0:
                ttft = time.perf_counter() - t_start
        e2e = time.perf_counter() - t_start
        tpot = ((e2e - ttft) / max(n_out - 1, 1)) if ttft is not None else 0
        return ttft, tpot, e2e, n_out

    async def run():
        # Warmup so the first timed request doesn't pay compilation.
        await one(-1, prompts[0], time.perf_counter())
        tasks = []
        t0 = time.perf_counter()
        for i, prompt in enumerate(prompts):
            await asyncio.sleep(gaps[i])
            tasks.append(asyncio.create_task(
                one(i, prompt, time.perf_counter())))
        results = await asyncio.gather(*tasks)
        return results, time.perf_counter() - t0

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    results, elapsed = loop.run_until_complete(run())
    ttfts = sorted(r[0] for r in results)
    tpots = sorted(r[1] for r in results)
    e2es = sorted(r[2] for r in results)
    out_toks = sum(r[3] for r in results)

    def pct(xs, p):
        return xs[min(len(xs) - 1, int(len(xs) * p))]

    print(json.dumps({
        "request_rate_qps": args.request_rate,
        "completed": len(results),
        "elapsed_s": round(elapsed, 3),
        "request_throughput_qps": round(len(results) / elapsed, 3),
        "output_tokens_per_s": round(out_toks / elapsed, 1),
        "ttft_p50_ms": round(pct(ttfts, 0.5) * 1e3, 1),
        "ttft_p99_ms": round(pct(ttfts, 0.99) * 1e3, 1),
        "tpot_p50_ms": round(pct(tpots, 0.5) * 1e3, 2),
        "tpot_p99_ms": round(pct(tpots, 0.99) * 1e3, 2),
        "e2e_p50_s": round(pct(e2es, 0.5), 3),
        "e2e_p99_s": round(pct(e2es, 0.99), 3),
    }))
    engine.shutdown()
    return 0


def cmd_run_batch(args) -> int:
    """OpenAI batch-file runner (reference `vllm run-batch`,
    entrypoints/openai/run_batch.py role): JSONL of {custom_id, url,
    body} processed offline, JSONL of responses out."""
    import uuid

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.entrypoints.openai.parsers import (
        parse_chat_output,
    )
    from vllm_trianglemix_tpu.entrypoints.openai.protocol import (
        ChatCompletionRequest,
        CompletionRequest,
        chat_response,
        completion_response,
    )
    from vllm_trianglemix_tpu.pooling_params import PoolingParams
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    llm = LLM(model=args.model, dtype=args.dtype,
              max_model_len=args.max_model_len,
              max_num_seqs=args.max_num_seqs,
              max_num_batched_tokens=args.max_num_batched_tokens,
              load_format=args.load_format,
              quantization=args.quantization)
    tok = llm.llm_engine.tokenizer

    def handle(line: dict) -> dict:
        url = line.get("url", "/v1/chat/completions")
        body = line.get("body", {})
        rid = f"batch-{uuid.uuid4().hex}"
        model = body.get("model") or args.model
        if url == "/v1/chat/completions":
            req = ChatCompletionRequest(**body)
            ids = tok.apply_chat_template(
                [m.model_dump(exclude_none=True) for m in req.messages],
                tokenize=True, add_generation_prompt=True)
            out = llm.generate([ids], req.to_sampling_params())[0]
            comp = out.outputs[0]
            msg = parse_chat_output(comp.text,
                                    enable_tools=bool(req.tools))
            return chat_response(rid, model, [{
                "index": 0, "message": msg,
                "finish_reason": comp.finish_reason}], {
                    "prompt_tokens": len(out.prompt_token_ids),
                    "completion_tokens": len(comp.token_ids),
                    "total_tokens": (len(out.prompt_token_ids)
                                     + len(comp.token_ids))})
        if url == "/v1/completions":
            req = CompletionRequest(**body)
            out = llm.generate([req.prompt] if isinstance(req.prompt, str)
                               else req.prompt,
                               req.to_sampling_params())[0]
            comp = out.outputs[0]
            return completion_response(rid, model, [{
                "index": 0, "text": comp.text,
                "finish_reason": comp.finish_reason}], {
                    "prompt_tokens": len(out.prompt_token_ids),
                    "completion_tokens": len(comp.token_ids),
                    "total_tokens": (len(out.prompt_token_ids)
                                     + len(comp.token_ids))})
        if url == "/v1/embeddings":
            inputs = body["input"]
            out = llm.encode([inputs] if isinstance(inputs, str)
                             else inputs, PoolingParams())[0]
            return {"object": "list", "model": model,
                    "data": [{"object": "embedding", "index": 0,
                              "embedding": out.pooled}]}
        raise ValueError(f"unsupported url {url}")

    n_ok = n_err = 0
    with open(args.input_file) as fin, open(args.output_file, "w") as fout:
        for raw in fin:
            raw = raw.strip()
            if not raw:
                continue
            line = json.loads(raw)
            rec = {"id": f"vtt-batch-{uuid.uuid4().hex}",
                   "custom_id": line.get("custom_id"),
                   "response": None, "error": None}
            try:
                rec["response"] = {"status_code": 200,
                                   "body": handle(line)}
                n_ok += 1
            except Exception as e:  # noqa: BLE001
                rec["error"] = {"message": str(e)}
                n_err += 1
            fout.write(json.dumps(rec) + "\n")
    print(json.dumps({"completed": n_ok, "failed": n_err}))
    return 0 if n_err == 0 else 1


def cmd_eval_gsm8k(args) -> int:
    """GSM8K accuracy gate (reference .buildkite/lm-eval-harness role)."""
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.evals.gsm8k import (
        check_gate,
        evaluate_gsm8k,
        load_gate_config,
        load_jsonl,
    )
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    gate = load_gate_config(args.gate) if args.gate else None
    limit = args.limit or (gate or {}).get("limit")
    fewshot = args.num_fewshot or (gate or {}).get("num_fewshot", 5)
    data = load_jsonl(args.data, limit=(limit or 0) + fewshot or None)

    llm = LLM(model=args.model, max_model_len=args.max_model_len,
              max_num_seqs=args.max_num_seqs,
              quantization=args.quantization)
    params = SamplingParams(temperature=0.0, max_tokens=args.max_tokens,
                            stop=["\n\nQuestion:", "Question:"])

    def generate(prompts):
        outs = llm.generate(prompts, params)
        return [o.outputs[0].text for o in outs]

    result = evaluate_gsm8k(generate, data, num_fewshot=fewshot,
                            limit=limit)
    print(json.dumps(result.as_json()))
    if gate:
        errs = check_gate(result, gate)
        for e in errs:
            print(f"GATE VIOLATION: {e}", file=sys.stderr)
        return 1 if errs else 0
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="vtt",
                                     description="vllm-trianglemix-tpu CLI")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("serve", help="start the OpenAI-compatible server")
    _add_engine_args(p)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--inproc-engine", action="store_true",
                   help="run the engine core in the server process instead "
                   "of its own process (debugging; the default isolates "
                   "the device loop from the API event loop)")
    p.add_argument("--tool-call-parser", default="hermes",
                   help="tool-call wire format (see openai/parsers.py "
                   "TOOL_FORMATS; reference: vllm serve flag of the same "
                   "name)")
    p.add_argument("--reasoning-parser", default="qwen3",
                   help="reasoning wire format (see openai/parsers.py "
                   "REASONING_FORMATS)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("chat", help="interactive chat REPL")
    _add_engine_args(p)
    p.add_argument("--max-tokens", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--system", default=None, help="system prompt")
    p.set_defaults(fn=cmd_chat)

    p = sub.add_parser("complete", help="one-shot text completion")
    _add_engine_args(p)
    p.add_argument("--prompt", default=None)
    p.add_argument("--max-tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.0)
    p.set_defaults(fn=cmd_complete)

    p = sub.add_parser("bench-latency", help="batch latency benchmark")
    _add_engine_args(p)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--input-len", type=int, default=128)
    p.add_argument("--output-len", type=int, default=128)
    p.add_argument("--num-iters", type=int, default=3)
    p.set_defaults(fn=cmd_bench_latency)

    p = sub.add_parser("bench-throughput", help="offline throughput benchmark")
    _add_engine_args(p)
    p.add_argument("--num-prompts", type=int, default=64)
    p.add_argument("--input-len", type=int, default=128)
    p.add_argument("--output-len", type=int, default=128)
    p.set_defaults(fn=cmd_bench_throughput)

    p = sub.add_parser("bench-serving",
                       help="online QPS benchmark (Poisson arrivals)")
    _add_engine_args(p)
    p.add_argument("--num-prompts", type=int, default=64)
    p.add_argument("--input-len", type=int, default=128)
    p.add_argument("--output-len", type=int, default=128)
    p.add_argument("--request-rate", type=float, default=4.0,
                   help="QPS; 0 = send all at once")
    p.set_defaults(fn=cmd_bench_serving)

    p = sub.add_parser("run-batch",
                       help="process an OpenAI batch JSONL offline")
    _add_engine_args(p)
    p.add_argument("-i", "--input-file", required=True)
    p.add_argument("-o", "--output-file", required=True)
    p.set_defaults(fn=cmd_run_batch)

    p = sub.add_parser("eval-gsm8k",
                       help="GSM8K accuracy gate (lm-eval-harness role)")
    _add_engine_args(p)
    p.add_argument("--data", required=True,
                   help="GSM8K-format JSONL (question/answer fields)")
    p.add_argument("--gate", default=None,
                   help="expected-score YAML (evals/configs/*.yaml)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--num-fewshot", type=int, default=None)
    p.add_argument("--max-tokens", type=int, default=256)
    p.set_defaults(fn=cmd_eval_gsm8k)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
