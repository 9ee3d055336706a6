"""Engine configuration.

A compact mirror of the reference's composite ``VllmConfig``
(reference vllm/config/, 18 modules) re-shaped for a JAX/TPU engine:
- ModelConfig       — architecture + dtype + context length
- CacheConfig       — paged-KV geometry + prefix caching
- SchedulerConfig   — token-budget continuous batching knobs
- ParallelConfig    — jax.sharding mesh axes (tp/dp/ep/cp), not process groups
- TriangleMixConfig — the fork's sparse-attention surface
  (reference vllm/attention/trianglemix_attention.py:11-36 and
  trianglemix_config.py:12-81)
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field
from typing import Any, Optional

from vllm_trianglemix_tpu import envs


@dataclass
class TriangleMixConfig:
    """TriangleMix structured-sparse attention configuration.

    Semantics (reference trianglemix_attention.py:53-219, §0.1 of SURVEY.md),
    for causal attention over sequence length N with query index i, key j:

    - streaming[i,j] = (j <= num_sink_tokens) or (i - j <= sliding_window_size)
    - last[i,j]      = (N - i < num_last_tokens) and not streaming[i,j]
    - triangle       = streaming | last   (the middle Q-K region is dropped)

    Dense attention is used for seq_len <= dense_threshold
    (reference trianglemix_attention.py:330-332 uses 2048).
    """

    enabled: bool = False
    num_sink_tokens: int = 4
    sliding_window_size: int = 32
    num_last_tokens: int = 64
    num_triangle_layers: Optional[int] = None
    triangle_layer_indices: Optional[list[int]] = None
    dense_threshold: int = 2048

    def __post_init__(self):
        if not self.enabled and envs.VTT_TRIANGLEMIX_ENABLED:
            self.enabled = True
            if self.num_triangle_layers is None and not self.triangle_layer_indices:
                n = envs.VTT_TRIANGLEMIX_LAYERS
                self.num_triangle_layers = n if n > 0 else 8

    def layer_uses_triangle(self, layer_idx: int) -> bool:
        """Layer-selection policy (reference trianglemix_attention.py:263-278):
        explicit indices win; else first ``num_triangle_layers`` layers."""
        if not self.enabled:
            return False
        if self.triangle_layer_indices:
            return layer_idx in self.triangle_layer_indices
        if self.num_triangle_layers is not None:
            return layer_idx < self.num_triangle_layers
        return False

    def triangle_layers(self, num_layers: int) -> list[int]:
        return [i for i in range(num_layers) if self.layer_uses_triangle(i)]

    @staticmethod
    def for_qwen3(model_size: str = "14B",
                  num_triangle_layers: Optional[int] = None) -> "TriangleMixConfig":
        """Qwen3 presets (reference trianglemix_config.py:59-81)."""
        if num_triangle_layers is None:
            num_triangle_layers = {"14B": 10, "32B": 12}.get(model_size, 8)
        return TriangleMixConfig(
            enabled=True,
            num_triangle_layers=num_triangle_layers,
            num_sink_tokens=4,
            sliding_window_size=32,
            num_last_tokens=64,
        )


@dataclass
class ModelConfig:
    """Model architecture + checkpoint description.

    ``model`` is a local path to a HF-format checkpoint directory
    (config.json + *.safetensors [+ tokenizer files]) or a registry alias
    for a synthetic config (tests).
    """

    model: str = ""
    dtype: str = "bfloat16"
    max_model_len: int = 4096
    seed: int = 0
    # Overrides read from config.json when a checkpoint path is given.
    hf_overrides: dict[str, Any] = field(default_factory=dict)
    # Quantization method: None | "int8" | "awq" | "gptq" | "fp8"
    quantization: Optional[str] = None
    # KV cache dtype: "auto" (model dtype) | "fp8" | "int8"
    kv_cache_dtype: str = "auto"
    # Static dequant scale for fp8/int8 KV (reference k_scale/v_scale
    # plumbing, pallas.py:282-305); same scale for K and V.
    kv_cache_scale: float = 1.0
    tokenizer: Optional[str] = None  # defaults to `model`
    skip_tokenizer_init: bool = False
    # "auto" = safetensors if present else random; "dummy" = always random
    # (reference model_loader/dummy_loader.py).
    load_format: str = "auto"

    def __post_init__(self):
        if self.tokenizer is None:
            self.tokenizer = self.model


@dataclass
class CacheConfig:
    """Paged KV cache geometry.

    ``block_size`` is the page size in tokens; num_gpu_blocks is either set
    explicitly (tests) or derived from free HBM after model load (reference
    gpu_worker.py:222 / tpu_worker.py:174 determine_available_memory).
    """

    block_size: int = 16
    num_gpu_blocks: Optional[int] = None
    memory_utilization: float = 0.9
    enable_prefix_caching: bool = True
    # Cascade attention (reference gpu_model_runner.py:1268 +
    # flash_attn cascade): when every scheduled request shares leading
    # KV blocks, attend the shared prefix ONCE for the whole batch.
    enable_cascade_attention: bool = False
    # Minimum shared blocks before cascading pays for itself.
    cascade_min_shared_blocks: int = 2
    # dtype handled by ModelConfig.kv_cache_dtype


@dataclass
class SchedulerConfig:
    """Token-budget continuous batching (reference sched/scheduler.py:179).

    No prefill/decode phases: each request catches num_computed_tokens up to
    its total; chunked prefill falls out of the per-step token budget.
    """

    max_num_seqs: int = 64
    max_num_batched_tokens: int = 2048
    # Chunk any single prefill above this many tokens (0 = no extra chunking).
    long_prefill_token_threshold: int = 0
    policy: str = "fcfs"  # "fcfs" | "priority"
    # Async scheduling: dispatch step N+1's host work while step N runs on
    # device (reference async_scheduler.py). Sampled-but-in-flight tokens
    # are placeholders gathered device-side by the runner. Auto-disabled
    # when spec decode is on; grammar/logit-row requests force per-step
    # sync fallback.
    async_scheduling: bool = True
    # Multi-step decode: when the whole batch is decoding and nothing is
    # waiting, run up to this many autoregressive steps per device dispatch
    # (device-side lax.scan), cutting host<->device round trips per token.
    # 1 disables. Overrun past a stop token within the window is discarded.
    multi_step_decode: int = 1
    # Multimodal: encoder-output cache budget in encoder tokens (reference
    # encoder_cache_budget). Bounds both the on-device cache of projected
    # image embeddings and the per-step encoder compute.
    encoder_cache_size: int = 8192


@dataclass
class ParallelConfig:
    """Mesh-based parallelism.

    Unlike the reference's GroupCoordinator/NCCL process groups
    (parallel_state.py:171), parallelism here is declarative: a
    ``jax.sharding.Mesh`` with named axes and NamedShardings on weights,
    activations, and KV cache. XLA's SPMD partitioner inserts the
    collectives over ICI/DCN.
    """

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # pipeline parallel: decoder layers sharded in stages over a pp mesh
    # axis (parallel/pp.py), reference config/parallel.py pipeline_parallel_size
    pipeline_parallel_size: int = 1
    expert_parallel_size: int = 1
    # decode context parallel (KV-shard decode, reference config/parallel.py:198)
    context_parallel_size: int = 1
    # Shard MoE expert stacks on the E axis over the tp mesh axis
    # (parallel/ep.py) instead of ffn-sharding them (reference
    # enable_expert_parallel, config/parallel.py).
    enable_expert_parallel: bool = False
    # Per-shard EP token capacity factor; None = no token drops (exact).
    ep_capacity_factor: float | None = None
    # EPLB (parallel/eplb.py): periodically repack experts onto shards by
    # measured load; interval is in engine steps.
    enable_eplb: bool = False
    eplb_interval: int = 256
    # Multi-host serving (reference: multiproc_executor.py:49 rank workers
    # + tpu_communicator.py PJRT multiprocess init). One process per host
    # joins jax.distributed; host 0 runs scheduler+frontend and broadcasts
    # each step's SchedulerOutput over ZMQ (control_address); every host
    # executes the same jitted step on the global mesh in lockstep
    # (executor/multihost_executor.py).
    num_hosts: int = 1
    host_id: int = 0
    # ZMQ control plane root, e.g. "tcp://10.0.0.1:8576". Port is the PUB
    # broadcast; port+1 is the worker->host0 ack/error channel.
    control_address: str | None = None

    @property
    def world_size(self) -> int:
        return (self.tensor_parallel_size * self.data_parallel_size
                * self.context_parallel_size * self.pipeline_parallel_size)


@dataclass
class SpeculativeConfig:
    """Speculative decoding (reference vllm/config/speculative.py surface,
    ngram method: v1/spec_decode/ngram_proposer.py).

    Drafts are proposed host-side from prompt n-gram matches and verified
    by the target model in one step; greedy acceptance keeps exact
    equivalence for temperature=0 requests (sampled requests skip
    speculation)."""

    method: Optional[str] = None  # None | "ngram" | "eagle" | "medusa"
    num_speculative_tokens: int = 4
    prompt_lookup_max: int = 3
    prompt_lookup_min: int = 1
    # EAGLE: draft checkpoint dir (safetensors, official fc + layers.0.*
    # layout; reference vllm/v1/spec_decode/eagle.py:42). None => random
    # draft weights (drafts mostly rejected; outputs stay exact — useful
    # for tests and plumbing bring-up).
    model: Optional[str] = None
    # Star-chain TREE drafting (reference eagle.py tree proposals +
    # tree_attn.py verification): per chain depth l, the draft's top
    # tree_branching[l] tokens all ride as candidates sharing the chain
    # parent — the chain (branch 0) is the classic linear-K proposal and
    # siblings add shallow-width acceptance at zero extra draft compute.
    # None => linear chains. Implies method="eagle" and greedy-request
    # acceptance (sampled requests fall back to the bonus token).
    tree_branching: Optional[tuple] = None

    @property
    def enabled(self) -> bool:
        return self.method is not None

    @property
    def tree_enabled(self) -> bool:
        return self.tree_branching is not None

    @property
    def num_tree_tokens(self) -> int:
        return sum(self.tree_branching) if self.tree_branching else 0

    def __post_init__(self):
        if self.method not in (None, "ngram", "eagle", "medusa"):
            raise ValueError(f"unsupported speculative method {self.method}")
        if self.enabled and self.num_speculative_tokens < 1:
            raise ValueError("num_speculative_tokens must be >= 1")
        if self.tree_branching is not None:
            self.tree_branching = tuple(int(b) for b in self.tree_branching)
            if self.method != "eagle":
                raise ValueError("tree_branching requires method='eagle'")
            if any(b < 1 for b in self.tree_branching):
                raise ValueError("tree_branching factors must be >= 1")
            if len(self.tree_branching) != self.num_speculative_tokens:
                # depth follows the branching spec
                self.num_speculative_tokens = len(self.tree_branching)


@dataclass
class LoRAConfig:
    """Multi-LoRA serving (reference vllm/lora/ role): adapters are
    registered at engine build (name -> HF/peft adapter directory) and
    selected per request. ``max_loras``/``max_rank`` preallocate slot
    capacity for runtime /v1/load_lora_adapter (reference
    api_server.py:1217) — stacks keep a fixed shape so hot-swapping an
    adapter never recompiles."""

    modules: dict[str, str] = field(default_factory=dict)
    # Total adapter slots to preallocate (0 = just the initial modules).
    max_loras: int = 0
    # Rank capacity for dynamically loaded adapters (0 = derive from the
    # initial adapters; 16 if serving starts with none).
    max_rank: int = 0

    @property
    def enabled(self) -> bool:
        return bool(self.modules) or self.max_loras > 0


@dataclass
class ObservabilityConfig:
    collect_stats: bool = True
    log_stats_interval_s: float = 5.0
    # OTLP gRPC collector endpoint for per-request spans (reference
    # --otlp-traces-endpoint, vllm/tracing.py). None disables OTLP; the
    # in-memory recorder is still available via TracingStatLogger.
    otlp_traces_endpoint: "Optional[str]" = None


@dataclass
class EngineConfig:
    """Composite engine config (mirror of reference VllmConfig)."""

    # Run the engine core (scheduler+executor+device) in a background
    # process over ZMQ (reference EngineCoreProc, core.py:453) instead of
    # in the frontend process.
    multiprocess_engine: bool = False
    # KV connector (reference kv_transfer): e.g.
    # {"type": "shared_storage", "path": "/mnt/kv"} enables cross-engine
    # prefix reuse / P-D disaggregation.
    kv_connector: Optional[dict] = None

    model: ModelConfig = field(default_factory=ModelConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    trianglemix: TriangleMixConfig = field(default_factory=TriangleMixConfig)
    speculative: SpeculativeConfig = field(default_factory=SpeculativeConfig)
    lora: LoRAConfig = field(default_factory=LoRAConfig)
    observability: ObservabilityConfig = field(default_factory=ObservabilityConfig)

    def compute_hash(self) -> str:
        """Stable hash for compile-cache keying (reference VllmConfig.compute_hash)."""
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]
