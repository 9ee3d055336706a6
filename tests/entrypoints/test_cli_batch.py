"""run-batch and bench-serving CLI subcommands (reference `vllm
run-batch` / `vllm bench serving` roles)."""

import json


def test_run_batch(tiny_model_dir, tmp_path, capsys):
    from vllm_trianglemix_tpu.entrypoints.cli import main

    inp = tmp_path / "batch.jsonl"
    out = tmp_path / "out.jsonl"
    lines = [
        {"custom_id": "c1", "method": "POST", "url": "/v1/completions",
         "body": {"prompt": "hello world", "max_tokens": 3,
                  "temperature": 0.0, "ignore_eos": True}},
        {"custom_id": "c2", "method": "POST",
         "url": "/v1/chat/completions",
         "body": {"messages": [{"role": "user", "content": "hello"}],
                  "max_tokens": 2, "temperature": 0.0,
                  "ignore_eos": True}},
        {"custom_id": "c3", "method": "POST", "url": "/v1/embeddings",
         "body": {"input": "hello world"}},
    ]
    inp.write_text("\n".join(json.dumps(x) for x in lines) + "\n")

    rc = main(["run-batch", tiny_model_dir, "--dtype", "float32",
               "--max-model-len", "128", "--max-num-seqs", "4",
               "--max-num-batched-tokens", "64",
               "-i", str(inp), "-o", str(out)])
    assert rc == 0
    recs = [json.loads(x) for x in out.read_text().splitlines()]
    assert [r["custom_id"] for r in recs] == ["c1", "c2", "c3"]
    assert all(r["response"]["status_code"] == 200 for r in recs)
    assert recs[0]["response"]["body"]["object"] == "text_completion"
    assert recs[1]["response"]["body"]["object"] == "chat.completion"
    assert len(recs[2]["response"]["body"]["data"][0]["embedding"]) > 0


def test_bench_serving_smoke(tiny_model_dir, capsys):
    from vllm_trianglemix_tpu.entrypoints.cli import main

    rc = main(["bench-serving", tiny_model_dir, "--dtype", "float32",
               "--max-model-len", "128", "--max-num-seqs", "4",
               "--max-num-batched-tokens", "64",
               "--num-prompts", "6", "--input-len", "8",
               "--output-len", "4", "--request-rate", "50"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    stats = json.loads(out)
    assert stats["completed"] == 6
    assert stats["ttft_p50_ms"] > 0
    assert stats["output_tokens_per_s"] > 0
