"""Offline inference API (reference vllm/entrypoints/llm.py:66 LLM class)."""

from __future__ import annotations

from typing import Optional, Sequence, Union

from vllm_trianglemix_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoRAConfig,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
    SpeculativeConfig,
    TriangleMixConfig,
)
from vllm_trianglemix_tpu.engine.llm_engine import LLMEngine
from vllm_trianglemix_tpu.outputs import RequestOutput
from vllm_trianglemix_tpu.sampling_params import SamplingParams

PromptType = Union[str, list[int], dict]


class LLM:
    """Synchronous batch-inference entrypoint.

    >>> llm = LLM(model="/path/to/Qwen3-0.6B")
    >>> outs = llm.generate(["hello"], SamplingParams(max_tokens=16))
    """

    def __init__(
        self,
        model: str,
        *,
        dtype: str = "bfloat16",
        max_model_len: int = 4096,
        block_size: int = 16,
        max_num_seqs: int = 64,
        max_num_batched_tokens: int = 2048,
        multi_step_decode: int = 1,
        async_scheduling: bool = True,
        encoder_cache_size: int = 8192,
        num_kv_blocks: Optional[int] = None,
        enable_prefix_caching: bool = True,
        enable_cascade_attention: bool = False,
        tensor_parallel_size: int = 1,
        pipeline_parallel_size: int = 1,
        data_parallel_size: int = 1,
        context_parallel_size: int = 1,
        enable_expert_parallel: bool = False,
        enable_eplb: bool = False,
        eplb_interval: int = 256,
        multiprocess_engine: Optional[bool] = None,
        trianglemix: Optional[TriangleMixConfig] = None,
        speculative_config: Optional[dict] = None,
        lora_modules: Optional[dict] = None,
        max_loras: int = 0,
        max_lora_rank: int = 0,
        seed: int = 0,
        skip_tokenizer_init: bool = False,
        warmup: bool = False,
        quantization: Optional[str] = None,
        load_format: str = "auto",
        kv_cache_dtype: str = "auto",
        kv_cache_scale: float = 1.0,
        kv_connector: Optional[dict] = None,
    ) -> None:
        self.engine_config = EngineConfig(
            kv_connector=kv_connector,
            model=ModelConfig(model=model, dtype=dtype,
                              max_model_len=max_model_len, seed=seed,
                              skip_tokenizer_init=skip_tokenizer_init,
                              quantization=quantization,
                              load_format=load_format,
                              kv_cache_dtype=kv_cache_dtype,
                              kv_cache_scale=kv_cache_scale),
            cache=CacheConfig(
                block_size=block_size,
                num_gpu_blocks=num_kv_blocks,
                enable_prefix_caching=enable_prefix_caching,
                enable_cascade_attention=enable_cascade_attention),
            scheduler=SchedulerConfig(
                max_num_seqs=max_num_seqs,
                max_num_batched_tokens=max_num_batched_tokens,
                multi_step_decode=multi_step_decode,
                async_scheduling=async_scheduling,
                encoder_cache_size=encoder_cache_size),
            parallel=ParallelConfig(
                tensor_parallel_size=tensor_parallel_size,
                pipeline_parallel_size=pipeline_parallel_size,
                data_parallel_size=data_parallel_size,
                context_parallel_size=context_parallel_size,
                enable_expert_parallel=enable_expert_parallel,
                enable_eplb=enable_eplb,
                eplb_interval=eplb_interval),
            # DP replicas require process isolation (one engine per
            # replica); otherwise respect the explicit flag.
            multiprocess_engine=(data_parallel_size > 1
                                 if multiprocess_engine is None
                                 else multiprocess_engine),
            trianglemix=trianglemix or TriangleMixConfig(),
            speculative=(SpeculativeConfig(**speculative_config)
                         if speculative_config else SpeculativeConfig()),
            lora=LoRAConfig(modules=lora_modules or {},
                            max_loras=max_loras,
                            max_rank=max_lora_rank),
        )
        self.llm_engine = LLMEngine.from_engine_config(self.engine_config)
        if warmup:
            self.llm_engine.warm_up()
        self._request_counter = 0

    def generate(
        self,
        prompts: Union[PromptType, Sequence[PromptType]],
        sampling_params: Optional[Union[SamplingParams,
                                        Sequence[SamplingParams]]] = None,
        lora_request: Union[None, str, Sequence[Optional[str]]] = None,
    ) -> list[RequestOutput]:
        if isinstance(prompts, (str, dict)) or (
                isinstance(prompts, list) and prompts
                and isinstance(prompts[0], int)):
            prompts = [prompts]
        n = len(prompts)
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * n
        if len(sampling_params) != n:
            raise ValueError("len(sampling_params) != len(prompts)")
        if lora_request is None or isinstance(lora_request, str):
            lora_request = [lora_request] * n
        if len(lora_request) != n:
            raise ValueError("len(lora_request) != len(prompts)")

        # n>1 fan-out (reference v1/engine/parallel_sampling.py): each
        # sample runs as its own engine request; results aggregate into
        # one RequestOutput with n CompletionOutputs.
        from dataclasses import replace as dc_replace

        child_map: dict[str, tuple[int, int]] = {}  # rid -> (prompt, k)
        fanout: list[int] = []
        for i, (prompt, params, lora) in enumerate(
                zip(prompts, sampling_params, lora_request)):
            fanout.append(params.n)
            for k in range(params.n):
                child = params
                if params.n > 1:
                    child = dc_replace(
                        params, n=1,
                        seed=(params.seed + k if params.seed is not None
                              else None))
                    child.all_stop_token_ids = set(
                        params.all_stop_token_ids)
                rid = str(self._request_counter)
                self._request_counter += 1
                self.llm_engine.add_request(rid, prompt, child,
                                            lora_name=lora)
                child_map[rid] = (i, k)

        finals: dict[tuple[int, int], RequestOutput] = {}
        while self.llm_engine.has_unfinished_requests():
            for out in self.llm_engine.step():
                key = child_map.get(out.request_id)
                if key is not None and out.finished:
                    finals[key] = out

        results: list[RequestOutput] = []
        for i in range(n):
            children = [finals[(i, k)] for k in range(fanout[i])]
            parent = children[0]
            for k, child in enumerate(children):
                child.outputs[0].index = k
            parent.outputs = [c.outputs[0] for c in children]
            results.append(parent)
        return results

    def beam_search(
        self,
        prompts: Sequence[list[int]],
        beam_width: int = 4,
        max_tokens: int = 32,
        ignore_eos: bool = False,
        length_penalty: float = 1.0,
    ) -> list[list[dict]]:
        """Beam search (reference LLM.beam_search): iterative one-token
        expansion scored by logprobs; the prefix cache makes the repeated
        prefills cheap. Returns, per prompt, ``beam_width`` dicts with
        ``token_ids`` (generated suffix) and ``cumulative_logprob``,
        best first."""
        eos = self.llm_engine.processor.eos_token_id

        def score(lp: float, n: int) -> float:
            return lp / (max(n, 1) ** length_penalty)

        results = []
        for prompt in prompts:
            beams = [(list(prompt), 0.0)]
            completed: list[tuple[list[int], float]] = []
            for _ in range(max_tokens):
                if not beams:
                    break
                outs = self.generate(
                    [b[0] for b in beams],
                    SamplingParams(max_tokens=1, temperature=0.0,
                                   ignore_eos=True,
                                   logprobs=2 * beam_width))
                candidates = []
                for (toks, cum), out in zip(beams, outs):
                    row = out.outputs[0].logprobs[0]
                    for tid, lp in sorted(row.items(),
                                          key=lambda kv: -kv[1]):
                        candidates.append((toks + [tid], cum + lp))
                candidates.sort(
                    key=lambda c: score(c[1], len(c[0]) - len(prompt)),
                    reverse=True)
                beams = []
                for toks, cum in candidates:
                    if not ignore_eos and eos is not None \
                            and toks[-1] == eos:
                        completed.append((toks, cum))
                    else:
                        beams.append((toks, cum))
                    if len(beams) >= beam_width:
                        break
            completed.extend(beams)
            completed.sort(
                key=lambda c: score(c[1], len(c[0]) - len(prompt)),
                reverse=True)
            results.append([
                {"token_ids": toks[len(prompt):],
                 "cumulative_logprob": cum}
                for toks, cum in completed[:beam_width]
            ])
        return results

    def encode(
        self,
        prompts: Union[PromptType, Sequence[PromptType]],
        pooling_params=None,
    ) -> list[RequestOutput]:
        """Embedding inference (reference LLM.encode, llm.py:900): runs
        prefill only and returns pooled vectors in ``output.pooled``."""
        from vllm_trianglemix_tpu.pooling_params import PoolingParams

        if isinstance(prompts, (str, dict)) or (
                isinstance(prompts, list) and prompts
                and isinstance(prompts[0], int)):
            prompts = [prompts]
        pooling_params = pooling_params or PoolingParams()

        request_ids = []
        for prompt in prompts:
            rid = str(self._request_counter)
            self._request_counter += 1
            self.llm_engine.add_request(
                rid, prompt, SamplingParams(max_tokens=1),
                pooling_params=pooling_params)
            request_ids.append(rid)

        order = {rid: i for i, rid in enumerate(request_ids)}
        results: list[Optional[RequestOutput]] = [None] * len(request_ids)
        while self.llm_engine.has_unfinished_requests():
            for out in self.llm_engine.step():
                if out.request_id in order and out.finished:
                    results[order[out.request_id]] = out
        assert all(r is not None for r in results)
        return results

    def classify(
        self,
        prompts: Union[PromptType, Sequence[PromptType]],
    ) -> list[RequestOutput]:
        """Sequence classification (reference LLM.classify): last-token
        pooling through the model's score head; class probabilities land
        in ``output.pooled``."""
        from vllm_trianglemix_tpu.pooling_params import PoolingParams

        return self.encode(prompts, PoolingParams(task="classify"))
