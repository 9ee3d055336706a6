"""User-facing output types (reference vllm/outputs.py surface)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class CompletionOutput:
    index: int
    text: str
    token_ids: list[int]
    cumulative_logprob: Optional[float] = None
    logprobs: Optional[list[dict[int, float]]] = None
    finish_reason: Optional[str] = None
    stop_reason: Optional[int | str] = None

    @property
    def finished(self) -> bool:
        return self.finish_reason is not None


@dataclass
class RequestOutput:
    request_id: str
    prompt: Optional[str]
    prompt_token_ids: list[int]
    outputs: list[CompletionOutput]
    finished: bool
    metrics: dict[str, Any] = field(default_factory=dict)
    # Embedding requests: the pooled vector (list of floats).
    pooled: Optional[list] = None
    # SamplingParams.prompt_logprobs: per-prompt-token {token_id: logprob}
    # dicts, index-aligned with prompt_token_ids (index 0 is None).
    prompt_logprobs: Optional[list] = None
