"""Per-request tracing spans (reference vllm/tracing.py role).

opentelemetry isn't in this environment, so init_tracer falls back to
the in-memory recorder — the span contents are what the OTLP exporter
would ship.
"""

from vllm_trianglemix_tpu.sampling_params import SamplingParams
from vllm_trianglemix_tpu.tracing import (
    InMemoryTracer,
    SpanAttributes,
    TracingStatLogger,
    init_tracer,
)


def test_init_tracer_falls_back_in_memory():
    tracer = init_tracer("x", "grpc://localhost:4317")
    assert isinstance(tracer, InMemoryTracer)  # no otel SDK installed


def test_request_spans_emitted(tiny_llm):
    engine = tiny_llm.llm_engine
    tracing = TracingStatLogger("tiny-qwen3")
    engine.stat_loggers.append(tracing)
    try:
        tiny_llm.generate(
            [[5, 9, 12], [4, 4, 4, 4]],
            SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True))
    finally:
        engine.stat_loggers.remove(tracing)

    spans = tracing.tracer.finished_spans
    assert len(spans) == 2
    A = SpanAttributes
    for span in spans:
        assert span.name == "llm_request"
        at = span.attributes
        assert at[A.GEN_AI_REQUEST_MODEL] == "tiny-qwen3"
        assert at[A.GEN_AI_USAGE_COMPLETION_TOKENS] == 5
        assert at[A.GEN_AI_USAGE_PROMPT_TOKENS] in (3, 4)
        assert at[A.GEN_AI_LATENCY_E2E] > 0
        assert 0 < at[A.GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN] \
            <= at[A.GEN_AI_LATENCY_E2E]
        assert at[A.GEN_AI_RESPONSE_FINISH_REASON] == "length"
        assert span.end_time >= span.start_time
