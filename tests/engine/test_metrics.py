"""Metrics: IterationStats timing aggregation + Prometheus export through
a real engine run (reference v1/metrics role)."""

import numpy as np

from vllm_trianglemix_tpu.sampling_params import SamplingParams


def test_iteration_stats_flow(tiny_llm):
    from vllm_trianglemix_tpu.metrics.loggers import LoggingStatLogger

    eng = tiny_llm.llm_engine
    # ensure a logging stat logger is installed and capturing
    assert any(isinstance(s, LoggingStatLogger) for s in eng.stat_loggers)
    capture = []

    class Capture:
        def record(self, ss, its):
            capture.append((ss, its))

    eng.stat_loggers.append(Capture())
    outs = tiny_llm.generate(
        [np.arange(1, 9).tolist()],
        SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True))
    assert outs[0].finished
    eng.stat_loggers.pop()

    its_all = [its for _, its in capture if its is not None]
    total_gen = sum(i.num_generation_tokens for i in its_all)
    assert total_gen == 5
    assert sum(i.num_prompt_tokens for i in its_all) == 8
    ttfts = [t for i in its_all for t in i.time_to_first_tokens]
    assert len(ttfts) == 1 and ttfts[0] >= 0
    finished = [f for i in its_all for f in i.finished_requests]
    assert len(finished) == 1
    assert finished[0].num_generation_tokens == 5
    assert finished[0].e2e_latency > 0
    ss = capture[-1][0]
    assert ss is not None and ss.num_running_reqs == 0


def test_prometheus_logger_exports():
    import prometheus_client as pc

    from vllm_trianglemix_tpu.core.sched_output import SchedulerStats
    from vllm_trianglemix_tpu.metrics.loggers import PrometheusStatLogger
    from vllm_trianglemix_tpu.metrics.stats import (
        FinishedRequestStats,
        IterationStats,
    )

    registry = pc.REGISTRY
    stat_logger = PrometheusStatLogger(model_name="prom-test-model")
    its = IterationStats()
    its.num_prompt_tokens = 100
    its.num_generation_tokens = 10
    its.time_to_first_tokens.append(0.05)
    its.time_per_output_tokens.append(0.01)
    its.finished_requests.append(FinishedRequestStats(e2e_latency=0.5))
    stat_logger.record(SchedulerStats(num_running_reqs=2, num_waiting_reqs=1,
                                      kv_cache_usage=0.25), its)

    text = pc.generate_latest(registry).decode()
    assert 'vtt_prompt_tokens_total{model_name="prom-test-model"} 100.0' \
        in text
    assert 'vtt_num_requests_running{model_name="prom-test-model"} 2.0' \
        in text
    assert "vtt_time_to_first_token_seconds_bucket" in text
