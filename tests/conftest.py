"""Test env: force JAX onto a virtual 8-device CPU platform (so sharding
tests run without TPUs) and keep HF fully offline. Must run before any jax
import, hence the env mutation at module import time."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (real TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

# The axon sitecustomize registers the remote-TPU plugin and force-updates
# jax_platforms to "axon,cpu" — override it back so tests run on the
# virtual 8-device CPU platform.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402
import signal  # noqa: E402
import threading  # noqa: E402

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "timeout(seconds): fail the test if it runs longer than this "
        "(minimal SIGALRM implementation; pytest-timeout is not in the "
        "environment, so without this the marks would be silent no-ops)")


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    mark = item.get_closest_marker("timeout")
    if (mark is None or not mark.args or not hasattr(signal, "SIGALRM")
            or threading.current_thread() is not threading.main_thread()):
        return (yield)
    seconds = int(mark.args[0])

    def _on_alarm(signum, frame):
        raise TimeoutError(f"test exceeded {seconds}s timeout")

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(seconds)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture(scope="session")
def tiny_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_qwen3")
    cfg = {
        "architectures": ["Qwen3ForCausalLM"],
        "vocab_size": 600,
        "hidden_size": 64,
        "intermediate_size": 128,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 16,
        "max_position_embeddings": 512,
        "rope_theta": 1_000_000.0,
        "rms_norm_eps": 1e-6,
        "tie_word_embeddings": True,
        "eos_token_id": 501,
        "bos_token_id": 500,
    }
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)

    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {f"tok{i}": i for i in range(500)}
    vocab.update({"<bos>": 500, "<eos>": 501, "<unk>": 502,
                  "hello": 503, "world": 504, "stopword": 505})
    # JSON-ish single tokens for structured-output tests
    json_toks = (list('{}[]:,"-.') + [str(d) for d in range(10)]
                 + ["true", "false", "null", "name", "yes", "no"]
                 + list("abcdefghijklmnopqrstuvwxyz"))
    for i, t in enumerate(json_toks):
        vocab[t] = 510 + i
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(d / "tokenizer.json"))
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "eos_token": "<eos>",
            "bos_token": "<bos>",
            "unk_token": "<unk>",
            "chat_template":
                "{% for m in messages %}{{ m['content'] }} {% endfor %}",
        }, f)
    return str(d)


@pytest.fixture(scope="session")
def tiny_llm(tiny_model_dir):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    return LLM(model=tiny_model_dir, dtype="float32", max_model_len=256,
               max_num_seqs=8, max_num_batched_tokens=128, num_kv_blocks=64)
