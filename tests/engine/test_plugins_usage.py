"""Plugins loader + local usage stats (reference vllm/plugins + usage_lib)."""

import json
import os

import pytest

from vllm_trianglemix_tpu import plugins, usage


class FakeEP:
    def __init__(self, name, fn, fail=False):
        self.name = name
        self.value = f"fake.module:{name}"
        self._fn = fn
        self._fail = fail

    def load(self):
        if self._fail:
            raise ImportError("broken plugin")
        return self._fn


def test_plugins_load_and_filter(monkeypatch):
    calls = []
    eps = [FakeEP("alpha", lambda: calls.append("alpha")),
           FakeEP("beta", lambda: calls.append("beta")),
           FakeEP("broken", None, fail=True)]
    monkeypatch.setattr("importlib.metadata.entry_points",
                        lambda group=None: eps)

    plugins.reset_for_testing()
    monkeypatch.delenv("VTT_PLUGINS", raising=False)
    loaded = plugins.load_general_plugins()
    assert set(loaded) == {"alpha", "beta"}   # broken one skipped, logged
    assert calls == ["alpha", "beta"]

    # second call is a no-op (once per process)
    assert plugins.load_general_plugins() == {}

    # allow-list restricts
    plugins.reset_for_testing()
    calls.clear()
    monkeypatch.setenv("VTT_PLUGINS", "beta")
    loaded = plugins.load_general_plugins()
    assert set(loaded) == {"beta"} and calls == ["beta"]

    # empty allow-list disables
    plugins.reset_for_testing()
    calls.clear()
    monkeypatch.setenv("VTT_PLUGINS", "")
    assert plugins.load_general_plugins() == {} and calls == []
    plugins.reset_for_testing()


def test_usage_stats_written_and_opt_out(monkeypatch, tmp_path):
    monkeypatch.setattr(usage, "_CONFIG_DIR", str(tmp_path))
    monkeypatch.delenv("VTT_NO_USAGE_STATS", raising=False)
    monkeypatch.delenv("DO_NOT_TRACK", raising=False)

    usage.report_usage("Qwen3Config", "TEST", {"extra_key": 1})
    f = tmp_path / "usage_stats.jsonl"
    assert f.exists()
    rec = json.loads(f.read_text().splitlines()[-1])
    assert rec["model_architecture"] == "Qwen3Config"
    assert rec["context"] == "TEST" and rec["extra_key"] == 1
    assert "platform" in rec and "jax_version" in rec

    # env opt-out
    monkeypatch.setenv("VTT_NO_USAGE_STATS", "1")
    usage.report_usage("X", "TEST")
    assert len(f.read_text().splitlines()) == 1
    monkeypatch.delenv("VTT_NO_USAGE_STATS")

    monkeypatch.setenv("DO_NOT_TRACK", "1")
    assert not usage.usage_stats_enabled()
    monkeypatch.delenv("DO_NOT_TRACK")

    # marker-file opt-out
    (tmp_path / "do_not_track").touch()
    assert not usage.usage_stats_enabled()


def test_engine_reports_usage(monkeypatch, tmp_path, tiny_model_dir):
    monkeypatch.setattr(usage, "_CONFIG_DIR", str(tmp_path))
    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    LLM(model=tiny_model_dir, dtype="float32", max_model_len=64,
        max_num_seqs=2, max_num_batched_tokens=32, num_kv_blocks=16,
        skip_tokenizer_init=True)
    recs = [json.loads(x) for x in
            (tmp_path / "usage_stats.jsonl").read_text().splitlines()]
    assert recs[-1]["context"] == "LLM_ENGINE"
    assert recs[-1]["model_architecture"] == "Qwen3Config"
