"""OpenAI-compatible API schema (subset).

Mirror of the reference's vllm/entrypoints/openai/protocol.py surface for
the endpoints this server exposes: /v1/completions, /v1/chat/completions,
/v1/models, /tokenize, /detokenize. Pydantic validates requests; responses
are plain dicts shaped like the OpenAI wire format.
"""

from __future__ import annotations

import time
from typing import Any, Optional, Union

from pydantic import BaseModel, Field

from vllm_trianglemix_tpu.sampling_params import SamplingParams


class CompletionRequest(BaseModel):
    model: str = ""
    prompt: Union[str, list[int], list[str], list[list[int]]]
    max_tokens: Optional[int] = 16
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    min_p: float = 0.0
    n: int = 1
    stream: bool = False
    stop: Optional[Union[str, list[str]]] = None
    stop_token_ids: Optional[list[int]] = None
    seed: Optional[int] = None
    ignore_eos: bool = False
    min_tokens: int = 0
    logprobs: Optional[int] = None
    echo: bool = False
    # vLLM extension: top-k logprobs per PROMPT token; echo+logprobs
    # implies it (OpenAI echo semantics return prompt logprobs too).
    prompt_logprobs: Optional[int] = None
    user: Optional[str] = None
    # guided decoding (vLLM-compatible extension fields)
    guided_json: Optional[Any] = None
    guided_regex: Optional[str] = None
    guided_choice: Optional[list[str]] = None

    def to_sampling_params(self) -> SamplingParams:
        prompt_lp = self.prompt_logprobs
        if prompt_lp is None and self.echo and self.logprobs is not None:
            prompt_lp = self.logprobs
        return SamplingParams(
            n=self.n,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            min_p=self.min_p,
            max_tokens=self.max_tokens,
            min_tokens=self.min_tokens,
            stop=self.stop,
            stop_token_ids=self.stop_token_ids,
            ignore_eos=self.ignore_eos,
            seed=self.seed,
            logprobs=self.logprobs,
            prompt_logprobs=prompt_lp,
            guided_json=self.guided_json,
            guided_regex=self.guided_regex,
            guided_choice=self.guided_choice,
        )


class ChatMessage(BaseModel):
    role: str
    content: Optional[Union[str, list[dict[str, Any]]]] = None
    name: Optional[str] = None


class ChatCompletionRequest(BaseModel):
    model: str = ""
    messages: list[ChatMessage]
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    min_p: float = 0.0
    n: int = 1
    stream: bool = False
    stop: Optional[Union[str, list[str]]] = None
    stop_token_ids: Optional[list[int]] = None
    seed: Optional[int] = None
    ignore_eos: bool = False
    add_generation_prompt: bool = True
    chat_template: Optional[str] = None
    user: Optional[str] = None
    # tools (hermes-format parsing; templates that support `tools`)
    tools: Optional[list[dict[str, Any]]] = None
    tool_choice: Optional[Union[str, dict[str, Any]]] = None
    # OpenAI structured outputs + vLLM guided extensions
    response_format: Optional[dict[str, Any]] = None
    guided_json: Optional[Any] = None
    guided_regex: Optional[str] = None
    guided_choice: Optional[list[str]] = None

    def to_sampling_params(self) -> SamplingParams:
        max_tokens = self.max_completion_tokens or self.max_tokens or 16
        guided_json = self.guided_json
        if self.response_format:
            kind = self.response_format.get("type")
            if kind == "json_object":
                guided_json = guided_json or True
            elif kind == "json_schema":
                schema = (self.response_format.get("json_schema") or {})
                guided_json = guided_json or schema.get("schema") or True
        return SamplingParams(
            n=self.n,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            min_p=self.min_p,
            max_tokens=max_tokens,
            stop=self.stop,
            stop_token_ids=self.stop_token_ids,
            ignore_eos=self.ignore_eos,
            seed=self.seed,
            guided_json=guided_json,
            guided_regex=self.guided_regex,
            guided_choice=self.guided_choice,
        )


class TokenizeRequest(BaseModel):
    model: str = ""
    prompt: str
    add_special_tokens: bool = True


class DetokenizeRequest(BaseModel):
    model: str = ""
    tokens: list[int]


def completion_response(request_id: str, model: str, choices: list[dict],
                        usage: dict) -> dict:
    return {
        "id": request_id,
        "object": "text_completion",
        "created": int(time.time()),
        "model": model,
        "choices": choices,
        "usage": usage,
    }


def chat_response(request_id: str, model: str, choices: list[dict],
                  usage: dict) -> dict:
    return {
        "id": request_id,
        "object": "chat.completion",
        "created": int(time.time()),
        "model": model,
        "choices": choices,
        "usage": usage,
    }


def error_response(message: str, err_type: str = "invalid_request_error",
                   code: int = 400) -> dict:
    return {"error": {"message": message, "type": err_type, "code": code}}


class UsageCounter:
    """Accumulates token usage for a response."""

    def __init__(self) -> None:
        self.prompt_tokens = 0
        self.completion_tokens = 0

    def as_dict(self) -> dict:
        return {
            "prompt_tokens": self.prompt_tokens,
            "completion_tokens": self.completion_tokens,
            "total_tokens": self.prompt_tokens + self.completion_tokens,
        }
