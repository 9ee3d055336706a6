"""Accuracy-gate harness (reference tests/evals/gsm8k +
.buildkite/lm-eval-harness/configs/ role): GSM8K-format greedy scoring
with per-model expected-score gates, runnable the moment a real
checkpoint is available."""

from vllm_trianglemix_tpu.evals.gsm8k import (  # noqa: F401
    GSM8KResult,
    build_fewshot_prompt,
    evaluate_gsm8k,
    extract_final_number,
    load_gate_config,
    load_jsonl,
)
