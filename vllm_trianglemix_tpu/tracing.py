"""Per-request OpenTelemetry tracing.

Role of the reference's vllm/tracing.py (init_tracer:52,
SpanAttributes:98): one span per finished request carrying queue time,
TTFT, e2e latency, and token counts, exported over OTLP.

opentelemetry is not part of this environment's baked dependencies, so
``init_tracer`` degrades to an in-process recorder with the same span
API — spans land in ``InMemoryTracer.finished_spans`` (inspectable by
tests and debug tooling) instead of an OTLP collector. When the
opentelemetry-sdk IS importable and an endpoint is configured, the real
OTLP gRPC exporter is used, matching the reference wire format.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Optional

from vllm_trianglemix_tpu.logger import init_logger

logger = init_logger(__name__)


class SpanAttributes:
    """Reference vllm/tracing.py:98 attribute names (gen_ai semconv)."""

    GEN_AI_REQUEST_ID = "gen_ai.request.id"
    GEN_AI_REQUEST_MODEL = "gen_ai.request.model"
    GEN_AI_USAGE_PROMPT_TOKENS = "gen_ai.usage.prompt_tokens"
    GEN_AI_USAGE_COMPLETION_TOKENS = "gen_ai.usage.completion_tokens"
    GEN_AI_LATENCY_TIME_IN_QUEUE = "gen_ai.latency.time_in_queue"
    GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN = \
        "gen_ai.latency.time_to_first_token"
    GEN_AI_LATENCY_E2E = "gen_ai.latency.e2e"
    GEN_AI_LATENCY_TIME_IN_MODEL_EXECUTE = \
        "gen_ai.latency.time_in_model_execute"
    GEN_AI_RESPONSE_FINISH_REASON = "gen_ai.response.finish_reason"


class _Span:
    def __init__(self, name: str, start_time: Optional[float] = None):
        self.name = name
        self.start_time = start_time or time.time()
        self.end_time: Optional[float] = None
        self.attributes: dict = {}

    def set_attribute(self, key: str, value) -> None:
        self.attributes[key] = value

    def end(self, end_time: Optional[float] = None) -> None:
        self.end_time = end_time or time.time()


class InMemoryTracer:
    """Fallback tracer: same surface as an otel Tracer for our usage."""

    is_otlp = False

    def __init__(self) -> None:
        self.finished_spans: list[_Span] = []

    @contextmanager
    def start_as_current_span(self, name: str, start_time=None, **kwargs):
        span = _Span(name, start_time)
        try:
            yield span
        finally:
            span.end()
            self.finished_spans.append(span)
            # bound memory in long-running servers
            if len(self.finished_spans) > 10_000:
                del self.finished_spans[:5_000]


class _OtelTracer:
    is_otlp = True

    def __init__(self, tracer) -> None:
        self._tracer = tracer

    @contextmanager
    def start_as_current_span(self, name: str, start_time=None, **kwargs):
        # otel wants ns timestamps
        st = int((start_time or time.time()) * 1e9)
        with self._tracer.start_as_current_span(name,
                                                start_time=st) as span:
            yield span


def init_tracer(instrumenting_module_name: str,
                otlp_traces_endpoint: Optional[str]):
    """Reference init_tracer (vllm/tracing.py:52): returns an OTLP-backed
    tracer when the SDK + endpoint are available, else the in-memory
    recorder (never raises)."""
    if otlp_traces_endpoint:
        try:
            from opentelemetry import trace
            from opentelemetry.exporter.otlp.proto.grpc.trace_exporter \
                import OTLPSpanExporter
            from opentelemetry.sdk.trace import TracerProvider
            from opentelemetry.sdk.trace.export import BatchSpanProcessor

            provider = TracerProvider()
            provider.add_span_processor(BatchSpanProcessor(
                OTLPSpanExporter(endpoint=otlp_traces_endpoint)))
            trace.set_tracer_provider(provider)
            return _OtelTracer(trace.get_tracer(instrumenting_module_name))
        except ImportError:
            logger.warning(
                "opentelemetry not installed; tracing falls back to the "
                "in-memory recorder (endpoint %s ignored)",
                otlp_traces_endpoint)
    return InMemoryTracer()


class TracingStatLogger:
    """StatLogger emitting one llm_request span per finished request
    (reference async_llm do_tracing role)."""

    def __init__(self, model_name: str,
                 otlp_traces_endpoint: Optional[str] = None) -> None:
        self.model_name = model_name
        self.tracer = init_tracer("vllm_trianglemix_tpu",
                                  otlp_traces_endpoint)

    def record(self, scheduler_stats, iteration_stats) -> None:
        if iteration_stats is None:
            return
        now = time.time()
        A = SpanAttributes
        for fr in iteration_stats.finished_requests:
            with self.tracer.start_as_current_span(
                    "llm_request",
                    start_time=now - fr.e2e_latency) as span:
                span.set_attribute(A.GEN_AI_REQUEST_MODEL, self.model_name)
                span.set_attribute(A.GEN_AI_RESPONSE_FINISH_REASON,
                                   fr.finish_reason)
                span.set_attribute(A.GEN_AI_USAGE_PROMPT_TOKENS,
                                   fr.num_prompt_tokens)
                span.set_attribute(A.GEN_AI_USAGE_COMPLETION_TOKENS,
                                   fr.num_generation_tokens)
                span.set_attribute(A.GEN_AI_LATENCY_TIME_IN_QUEUE,
                                   fr.queued_time)
                span.set_attribute(A.GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN,
                                   fr.ttft)
                span.set_attribute(A.GEN_AI_LATENCY_E2E, fr.e2e_latency)
                span.set_attribute(
                    A.GEN_AI_LATENCY_TIME_IN_MODEL_EXECUTE,
                    fr.inference_time)
