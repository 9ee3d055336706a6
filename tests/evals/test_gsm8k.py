"""GSM8K accuracy-gate harness (reference .buildkite/lm-eval-harness/
configs/ + tests/evals/gsm8k role). Driven with a fake generator so the
scoring/gating logic is covered without a checkpoint; the same harness
runs for real via `vtt eval-gsm8k --model <ckpt> --data <jsonl> --gate
<yaml>`.
"""

import json

from vllm_trianglemix_tpu.evals.gsm8k import (
    build_fewshot_prompt,
    check_gate,
    evaluate_gsm8k,
    extract_final_number,
    gold_answer,
    load_gate_config,
    load_jsonl,
)


def test_extract_strict_and_flexible():
    text = "Adding 3 and 4 gives 7. So the total is 12.\n#### 12"
    assert extract_final_number(text, strict=True) == "12"
    assert extract_final_number(text, strict=False) == "12"
    loose = "I think the answer is about 1,234.0 dollars"
    assert extract_final_number(loose, strict=True) is None
    assert extract_final_number(loose, strict=False) == "1234"
    assert extract_final_number("no numbers here", strict=False) is None


def test_gold_answer_normalization():
    assert gold_answer("blah blah\n#### 1,000") == "1000"
    assert gold_answer("#### 3.50") == "3.5"
    assert gold_answer("unterminated") is None


def test_fewshot_prompt_shape():
    shots = [{"question": f"q{i}", "answer": f"work\n#### {i}"}
             for i in range(2)]
    p = build_fewshot_prompt("target?", shots)
    assert p.count("Question:") == 3
    assert p.endswith("Question: target?\nAnswer:")
    assert "#### 1" in p


def make_data(n):
    return [{"question": f"What is {i}+{i}?",
             "answer": f"{i}+{i} = {2*i}\n#### {2*i}"} for i in range(n)]


def test_evaluate_with_perfect_and_broken_model():
    data = make_data(15)

    def perfect(prompts):
        # Answer the target question (last line's arithmetic).
        outs = []
        for p in prompts:
            q = p.rsplit("Question: ", 1)[1].split("?")[0]
            i = int(q.split("+")[0].split()[-1])
            outs.append(f"thinking... {i}+{i} = {2*i}\n#### {2*i}")
        return outs

    res = evaluate_gsm8k(perfect, data, num_fewshot=5)
    assert res.num_questions == 10
    assert res.strict_match == 1.0 and res.flexible_extract == 1.0

    def flexible_only(prompts):
        return ["the result equals 42... final answer 42"] * len(prompts)

    res2 = evaluate_gsm8k(flexible_only, data, num_fewshot=5)
    assert res2.strict_match == 0.0
    assert res2.flexible_extract < 1.0


def test_load_jsonl_and_limit(tmp_path):
    f = tmp_path / "d.jsonl"
    f.write_text("\n".join(json.dumps(x) for x in make_data(8)))
    assert len(load_jsonl(str(f))) == 8
    assert len(load_jsonl(str(f), limit=3)) == 3


def test_gate_config_and_check(tmp_path):
    import vllm_trianglemix_tpu.evals as ev
    import os

    cfg_path = os.path.join(os.path.dirname(ev.__file__), "configs",
                            "Qwen2.5-1.5B-Instruct.yaml")
    gate = load_gate_config(cfg_path)
    assert gate["metrics"]["exact_match,strict-match"] == 0.54
    assert gate["metrics"]["exact_match,flexible-extract"] == 0.59
    assert gate["limit"] == 1319 and gate["num_fewshot"] == 5

    from vllm_trianglemix_tpu.evals.gsm8k import GSM8KResult

    ok = GSM8KResult(num_questions=10, strict_match=0.52,
                     flexible_extract=0.58)
    assert check_gate(ok, gate) == []  # within rtol 0.05
    bad = GSM8KResult(num_questions=10, strict_match=0.40,
                      flexible_extract=0.58)
    errs = check_gate(bad, gate)
    assert len(errs) == 1 and "strict" in errs[0]


def test_cli_eval_gsm8k_with_tiny_model(tiny_model_dir, tmp_path,
                                        capsys):
    """End-to-end through the real CLI + engine (random tiny model: the
    score is ~0, but the whole path — tokenize, generate, extract, report
    — must run)."""
    f = tmp_path / "d.jsonl"
    f.write_text("\n".join(json.dumps(x) for x in make_data(7)))
    from vllm_trianglemix_tpu.entrypoints.cli import main

    rc = main(["eval-gsm8k", tiny_model_dir, "--data", str(f),
               "--limit", "2", "--num-fewshot", "5",
               "--max-tokens", "8", "--max-model-len", "512"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(out)
    assert rep["num_questions"] == 2
    assert 0.0 <= rep["strict_match"] <= 1.0
