"""Per-request sampling parameters.

Mirror of the reference's ``vllm/sampling_params.py`` surface (the subset the
v1 engine actually consumes), validated eagerly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Optional, Union


class SamplingType(Enum):
    GREEDY = 0
    RANDOM = 1


@dataclass
class SamplingParams:
    n: int = 1
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0  # 0 => disabled (all tokens)
    min_p: float = 0.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    max_tokens: Optional[int] = 16
    min_tokens: int = 0
    stop: Union[None, str, list[str]] = None
    stop_token_ids: Optional[list[int]] = None
    ignore_eos: bool = False
    seed: Optional[int] = None
    logprobs: Optional[int] = None
    # Top-k logprobs for each PROMPT token (reference sampling_params.py
    # prompt_logprobs): 0 = just the prompt token's own logprob, N = also
    # the top-N alternatives. Disables prefix caching for the request
    # (cached positions are never recomputed, so their logits don't
    # exist). Powers OpenAI completions echo=true + logprobs.
    prompt_logprobs: Optional[int] = None
    detokenize: bool = True
    skip_special_tokens: bool = True
    include_stop_str_in_output: bool = False
    # bias per token id, applied pre-softmax
    logit_bias: Optional[dict[int, float]] = None
    # --- structured (guided) decoding ---
    # JSON schema (dict or json string), True/{} for free-form JSON
    guided_json: Optional[object] = None
    guided_regex: Optional[str] = None
    guided_choice: Optional[list[str]] = None
    # Lark/GBNF-style EBNF, compiled to a DFA token mask with bounded
    # recursion unrolling (structured_output/ebnf.py)
    guided_grammar: Optional[str] = None
    # hard-restrict sampling to these ids
    allowed_token_ids: Optional[list[int]] = None
    bad_words: Optional[list[str]] = None
    # filled by the processor:
    all_stop_token_ids: set[int] = field(default_factory=set, repr=False)
    # tokenized bad words (processor fills from `bad_words` when a
    # tokenizer is available; may also be provided directly)
    bad_words_token_ids: Optional[list[list[int]]] = field(
        default=None, repr=False)

    def __post_init__(self):
        if self.n < 1:
            raise ValueError(f"n must be >= 1, got {self.n}")
        if self.temperature < 0.0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.top_k < 0:
            raise ValueError(f"top_k must be >= 0, got {self.top_k}")
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError(f"min_p must be in [0, 1], got {self.min_p}")
        if not -2.0 <= self.presence_penalty <= 2.0:
            raise ValueError("presence_penalty must be in [-2, 2]")
        if not -2.0 <= self.frequency_penalty <= 2.0:
            raise ValueError("frequency_penalty must be in [-2, 2]")
        if self.repetition_penalty <= 0.0:
            raise ValueError("repetition_penalty must be > 0")
        if self.max_tokens is not None and self.max_tokens < 1:
            raise ValueError(f"max_tokens must be >= 1, got {self.max_tokens}")
        if self.min_tokens < 0:
            raise ValueError("min_tokens must be >= 0")
        if self.prompt_logprobs is not None and not (
                0 <= self.prompt_logprobs <= 20):
            raise ValueError("prompt_logprobs must be in [0, 20]")
        if isinstance(self.stop, str):
            self.stop = [self.stop]
        elif self.stop is None:
            self.stop = []
        if self.stop_token_ids is None:
            self.stop_token_ids = []
        self.all_stop_token_ids = set(self.stop_token_ids)

    @property
    def sampling_type(self) -> SamplingType:
        return (SamplingType.GREEDY
                if self.temperature == 0.0 else SamplingType.RANDOM)

    @property
    def needs_host_sampling(self) -> bool:
        """Excluded from device-side decode lookahead / speculation:
        per-step host state (logit rows) or per-step host outputs
        (logprobs)."""
        return self.needs_logit_rows or self.logprobs is not None

    @property
    def needs_logit_rows(self) -> bool:
        """True when this request needs host-built per-step logit bias /
        mask rows (penalties, biases, banned words, min-tokens EOS ban) —
        these also exclude it from device-side decode lookahead."""
        return bool(
            self.presence_penalty != 0.0
            or self.frequency_penalty != 0.0
            or self.repetition_penalty != 1.0
            or self.logit_bias
            or self.allowed_token_ids is not None
            or self.bad_words or self.bad_words_token_ids
            or self.min_tokens > 0)
