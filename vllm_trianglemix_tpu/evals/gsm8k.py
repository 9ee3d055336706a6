"""GSM8K greedy accuracy harness.

Mirror of the reference's lm-eval GSM8K gate
(.buildkite/lm-eval-harness/configs/Qwen2.5-1.5B-Instruct.yaml:
strict-match 0.54, flexible-extract 0.59, 5-shot, limit 1319) without the
lm-eval dependency (not in the environment): few-shot prompt construction,
greedy generation through the engine, and the two standard extraction
metrics —

- strict-match: the canonical ``#### <number>`` answer format;
- flexible-extract: the LAST number anywhere in the generation.

Dataset format: GSM8K-style JSONL with ``question`` and ``answer`` fields
(answer contains ``#### <gold>`` like the original dataset). The harness
activates when a checkpoint and dataset are available (e.g. via
``vtt eval-gsm8k`` or the VTT_EVAL_* env vars); unit tests drive it with a
fake generator.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Callable, Optional

STRICT_RE = re.compile(r"####\s*(-?[0-9][0-9,]*(?:\.[0-9]+)?)")
NUMBER_RE = re.compile(r"-?[0-9][0-9,]*(?:\.[0-9]+)?")

PROMPT_TEMPLATE = "Question: {question}\nAnswer:"


def load_jsonl(path: str, limit: Optional[int] = None) -> list[dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            out.append(json.loads(line))
            if limit and len(out) >= limit:
                break
    return out


def _normalize(num: str) -> str:
    num = num.replace(",", "").rstrip(".")
    try:
        f = float(num)
        return str(int(f)) if f == int(f) else str(f)
    except ValueError:
        return num


def gold_answer(answer_field: str) -> Optional[str]:
    m = STRICT_RE.search(answer_field)
    return _normalize(m.group(1)) if m else None


def extract_final_number(text: str, strict: bool) -> Optional[str]:
    """strict: the ``#### N`` format; flexible: last number anywhere."""
    if strict:
        m = STRICT_RE.search(text)
        return _normalize(m.group(1)) if m else None
    nums = NUMBER_RE.findall(text)
    return _normalize(nums[-1]) if nums else None


def build_fewshot_prompt(question: str, fewshot: list[dict]) -> str:
    """5-shot GSM8K prompt in the lm-eval style: full worked answers
    (ending in ``#### N``) for the shots, then the target question."""
    parts = []
    for shot in fewshot:
        parts.append(PROMPT_TEMPLATE.format(question=shot["question"])
                     + " " + shot["answer"].strip())
    parts.append(PROMPT_TEMPLATE.format(question=question))
    return "\n\n".join(parts)


@dataclass
class GSM8KResult:
    num_questions: int = 0
    strict_match: float = 0.0
    flexible_extract: float = 0.0
    failures: list[dict] = field(default_factory=list)

    def as_json(self) -> dict:
        return {"num_questions": self.num_questions,
                "strict_match": round(self.strict_match, 4),
                "flexible_extract": round(self.flexible_extract, 4)}


def evaluate_gsm8k(
    generate: Callable[[list[str]], list[str]],
    data: list[dict],
    num_fewshot: int = 5,
    limit: Optional[int] = None,
    batch_size: int = 32,
) -> GSM8KResult:
    """``generate(prompts) -> completions`` abstracts the engine (greedy,
    stop at '\\n\\nQuestion:'). The first ``num_fewshot`` examples are the
    shots; the rest are scored (matching lm-eval's train-split shots is
    the caller's job when exactness matters)."""
    fewshot, rest = data[:num_fewshot], data[num_fewshot:]
    if limit:
        rest = rest[:limit]
    result = GSM8KResult(num_questions=len(rest))
    strict_hits = flex_hits = 0
    for i in range(0, len(rest), batch_size):
        batch = rest[i:i + batch_size]
        prompts = [build_fewshot_prompt(ex["question"], fewshot)
                   for ex in batch]
        outs = generate(prompts)
        for ex, out in zip(batch, outs):
            gold = gold_answer(ex["answer"])
            strict = extract_final_number(out, strict=True)
            flex = extract_final_number(out, strict=False)
            if gold is not None and strict == gold:
                strict_hits += 1
            if gold is not None and flex == gold:
                flex_hits += 1
            elif len(result.failures) < 20:
                result.failures.append(
                    {"question": ex["question"][:100], "gold": gold,
                     "got": out[-120:]})
    n = max(1, len(rest))
    result.strict_match = strict_hits / n
    result.flexible_extract = flex_hits / n
    return result


def load_gate_config(path: str) -> dict:
    """Minimal YAML reader for gate configs of the reference's shape
    (model_name / tasks -> metrics -> value, limit, num_fewshot). Only the
    subset the gate files use is parsed (no YAML lib in the env)."""
    import re as _re

    gate = {"metrics": {}}
    current_metric = None
    with open(path) as f:
        for raw in f:
            line = raw.rstrip()
            if not line or line.lstrip().startswith("#"):
                continue
            m = _re.match(r"^model_name:\s*\"?([^\"]+)\"?", line)
            if m:
                gate["model_name"] = m.group(1).strip()
            m = _re.match(r"^\s*-?\s*name:\s*\"?([^\"]+)\"?", line)
            if m:
                current_metric = m.group(1).strip()
            m = _re.match(r"^\s*value:\s*([0-9.]+)", line)
            if m and current_metric:
                gate["metrics"][current_metric] = float(m.group(1))
            m = _re.match(r"^limit:\s*([0-9]+)", line)
            if m:
                gate["limit"] = int(m.group(1))
            m = _re.match(r"^num_fewshot:\s*([0-9]+)", line)
            if m:
                gate["num_fewshot"] = int(m.group(1))
    return gate


def check_gate(result: GSM8KResult, gate: dict,
               rtol: float = 0.05) -> list[str]:
    """Return violations (empty = pass) vs a gate config, using the
    reference CI's relative tolerance (lm-eval-harness RTOL 0.05)."""
    errs = []
    got = {"exact_match,strict-match": result.strict_match,
           "exact_match,flexible-extract": result.flexible_extract}
    for name, expected in gate.get("metrics", {}).items():
        actual = got.get(name)
        if actual is None:
            continue
        if actual < expected - rtol:
            errs.append(f"{name}: {actual:.4f} < {expected} - {rtol}")
    return errs
