"""Stat loggers: periodic console logging + Prometheus export.

Mirror of the reference's vllm/v1/metrics/loggers.py (LoggingStatLogger:53,
PrometheusStatLogger:153): the engine facade feeds each step's
SchedulerStats + IterationStats; the logging logger prints a throughput
line every interval, the Prometheus logger exports counters/histograms
(TTFT, TPOT, e2e, queue depths, KV usage, prefix-cache hit rate) for the
server's /metrics endpoint.
"""

from __future__ import annotations

import time
from typing import Optional

from vllm_trianglemix_tpu.core.sched_output import SchedulerStats
from vllm_trianglemix_tpu.logger import init_logger
from vllm_trianglemix_tpu.metrics.stats import IterationStats

logger = init_logger(__name__)


class StatLoggerBase:

    def record(self, scheduler_stats: Optional[SchedulerStats],
               iteration_stats: Optional[IterationStats]) -> None:
        raise NotImplementedError

    def log(self) -> None:
        pass


class LoggingStatLogger(StatLoggerBase):
    """Console throughput/queue line every ``interval`` seconds."""

    def __init__(self, interval: float = 5.0) -> None:
        self.interval = interval
        self._last_log = time.monotonic()
        self._prompt_tokens = 0
        self._gen_tokens = 0
        self._last_scheduler_stats = SchedulerStats()

    def record(self, scheduler_stats, iteration_stats) -> None:
        if iteration_stats is not None:
            self._prompt_tokens += iteration_stats.num_prompt_tokens
            self._gen_tokens += iteration_stats.num_generation_tokens
        if scheduler_stats is not None:
            self._last_scheduler_stats = scheduler_stats
        now = time.monotonic()
        if now - self._last_log >= self.interval:
            self.log()

    def log(self) -> None:
        now = time.monotonic()
        dt = max(now - self._last_log, 1e-9)
        ss = self._last_scheduler_stats
        logger.info(
            "Avg prompt throughput: %.1f tok/s, avg generation throughput: "
            "%.1f tok/s, running: %d, waiting: %d, KV cache usage: %.1f%%, "
            "prefix cache hit rate: %.1f%%",
            self._prompt_tokens / dt, self._gen_tokens / dt,
            ss.num_running_reqs, ss.num_waiting_reqs,
            ss.kv_cache_usage * 100.0,
            100.0 * ss.prefix_cache_hits / ss.prefix_cache_queries
            if ss.prefix_cache_queries else 0.0)
        self._prompt_tokens = 0
        self._gen_tokens = 0
        self._last_log = now


class PrometheusStatLogger(StatLoggerBase):
    """Prometheus counters/gauges/histograms (reference loggers.py:153)."""

    _LATENCY_BUCKETS = (0.001, 0.005, 0.01, 0.02, 0.04, 0.06, 0.08, 0.1,
                        0.25, 0.5, 0.75, 1.0, 2.5, 5.0, 7.5, 10.0, 20.0,
                        40.0, 80.0)

    def __init__(self, model_name: str = "model") -> None:
        import prometheus_client as pc

        labels = {"model_name": model_name}

        def counter(name, doc):
            return pc.Counter(name, doc, labelnames=list(labels)).labels(
                **labels)

        def gauge(name, doc):
            return pc.Gauge(name, doc, labelnames=list(labels)).labels(
                **labels)

        def histogram(name, doc, buckets):
            return pc.Histogram(name, doc, labelnames=list(labels),
                                buckets=buckets).labels(**labels)

        self.counter_prompt_tokens = counter(
            "vtt_prompt_tokens_total", "Number of prefill tokens processed.")
        self.counter_generation_tokens = counter(
            "vtt_generation_tokens_total",
            "Number of generation tokens processed.")
        self.counter_preempted = counter(
            "vtt_num_preemptions_total", "Number of request preemptions.")
        self.gauge_running = gauge(
            "vtt_num_requests_running", "Requests currently executing.")
        self.gauge_waiting = gauge(
            "vtt_num_requests_waiting", "Requests waiting to be scheduled.")
        self.gauge_kv_usage = gauge(
            "vtt_kv_cache_usage_perc", "KV cache usage fraction.")
        self.counter_prefix_queries = counter(
            "vtt_prefix_cache_queries_total", "Prefix cache query tokens.")
        self.counter_prefix_hits = counter(
            "vtt_prefix_cache_hits_total", "Prefix cache hit tokens.")
        self.counter_spec_drafts = counter(
            "vtt_spec_decode_num_draft_tokens_total",
            "Speculative draft tokens scheduled.")
        self.counter_spec_accepted = counter(
            "vtt_spec_decode_num_accepted_tokens_total",
            "Speculative draft tokens accepted.")
        self.hist_ttft = histogram(
            "vtt_time_to_first_token_seconds", "TTFT histogram.",
            self._LATENCY_BUCKETS)
        self.hist_tpot = histogram(
            "vtt_time_per_output_token_seconds", "TPOT histogram.",
            (0.01, 0.025, 0.05, 0.075, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5, 0.75,
             1.0, 2.5))
        self.hist_e2e = histogram(
            "vtt_e2e_request_latency_seconds", "End-to-end latency.",
            self._LATENCY_BUCKETS)
        self._prev_prefix_queries = 0
        self._prev_prefix_hits = 0
        self._prev_spec_drafts = 0
        self._prev_spec_accepted = 0

    def record(self, scheduler_stats, iteration_stats) -> None:
        if scheduler_stats is not None:
            self.gauge_running.set(scheduler_stats.num_running_reqs)
            self.gauge_waiting.set(scheduler_stats.num_waiting_reqs)
            self.gauge_kv_usage.set(scheduler_stats.kv_cache_usage)
            dq = scheduler_stats.prefix_cache_queries \
                - self._prev_prefix_queries
            dh = scheduler_stats.prefix_cache_hits - self._prev_prefix_hits
            dd = scheduler_stats.spec_num_drafts - self._prev_spec_drafts
            da = (scheduler_stats.spec_num_accepted
                  - self._prev_spec_accepted)
            if dd > 0:
                self.counter_spec_drafts.inc(dd)
                self._prev_spec_drafts = scheduler_stats.spec_num_drafts
            if da > 0:
                self.counter_spec_accepted.inc(da)
                self._prev_spec_accepted = scheduler_stats.spec_num_accepted
            if dq > 0:
                self.counter_prefix_queries.inc(dq)
                self._prev_prefix_queries = scheduler_stats.prefix_cache_queries
            if dh > 0:
                self.counter_prefix_hits.inc(dh)
                self._prev_prefix_hits = scheduler_stats.prefix_cache_hits
        if iteration_stats is not None:
            self.counter_prompt_tokens.inc(iteration_stats.num_prompt_tokens)
            self.counter_generation_tokens.inc(
                iteration_stats.num_generation_tokens)
            self.counter_preempted.inc(iteration_stats.num_preempted_reqs)
            for t in iteration_stats.time_to_first_tokens:
                self.hist_ttft.observe(t)
            for t in iteration_stats.time_per_output_tokens:
                self.hist_tpot.observe(t)
            for fr in iteration_stats.finished_requests:
                self.hist_e2e.observe(fr.e2e_latency)
