"""Tool-call and reasoning parsers for chat completions.

Role of the reference's tool parser / reasoning parser registries
(vllm/entrypoints/openai/tool_parsers/ — 26 parsers; vllm/reasoning/ — 12),
scoped to the formats the flagship Qwen family emits:

- hermes-style tool calls: ``<tool_call>{"name": ..., "arguments": ...}
  </tool_call>`` blocks (Qwen2.5/Qwen3 chat template format);
- llama3-json tool calls: the whole message is one JSON object
  ``{"name": ..., "parameters": ...}`` (Llama 3.1/3.2 format);
- mistral tool calls: ``[TOOL_CALLS] [{...}, ...]`` prefix blocks;
- ``<think>...</think>`` reasoning segments (Qwen3 thinking mode),
  returned as ``reasoning_content`` per the DeepSeek-R1 API convention.
"""

from __future__ import annotations

import json
import re
import uuid
from typing import Optional

_TOOL_CALL_RE = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>",
                           re.DOTALL)
_THINK_RE = re.compile(r"<think>(.*?)</think>", re.DOTALL)
_OPEN_THINK_RE = re.compile(r"<think>(.*)$", re.DOTALL)


def parse_reasoning(text: str) -> tuple[Optional[str], str]:
    """Split <think> segments out of the text.

    Returns (reasoning_content or None, remaining_text). An unclosed
    <think> (generation cut off mid-thought) counts as all-reasoning.
    """
    segments = _THINK_RE.findall(text)
    rest = _THINK_RE.sub("", text)
    m = _OPEN_THINK_RE.search(rest)
    if m:
        segments.append(m.group(1))
        rest = _OPEN_THINK_RE.sub("", rest)
    if not segments:
        return None, text
    return "\n".join(s.strip() for s in segments), rest.lstrip("\n")


_MISTRAL_TOOLS_RE = re.compile(r"\[TOOL_CALLS\]\s*(\[.*?\])(?=\s|$)",
                               re.DOTALL)


def _wire_call(name: str, args) -> dict:
    return {
        "id": f"chatcmpl-tool-{uuid.uuid4().hex[:24]}",
        "type": "function",
        "function": {
            "name": name,
            "arguments": json.dumps(args, ensure_ascii=False),
        },
    }


def parse_tool_calls(text: str,
                     fmt: str = "hermes") -> tuple[list[dict], str]:
    """Extract tool calls in the given model-family format.

    Returns (tool_calls in OpenAI wire format, remaining_text).
    Malformed JSON is left in the text untouched.
    """
    if fmt == "llama3":
        # Llama 3.x emits the whole message as one JSON object.
        try:
            payload = json.loads(text.strip())
            name = payload["name"]
        except (json.JSONDecodeError, KeyError, TypeError):
            return [], text
        args = payload.get("parameters", payload.get("arguments", {}))
        return [_wire_call(name, args)], ""

    if fmt == "mistral":
        calls = []

        def repl_m(m: "re.Match[str]") -> str:
            try:
                payloads = json.loads(m.group(1))
                parsed = [(p["name"],
                           p.get("arguments", p.get("parameters", {})))
                          for p in payloads]
            except (json.JSONDecodeError, KeyError, TypeError):
                return m.group(0)
            calls.extend(_wire_call(n, a) for n, a in parsed)
            return ""

        rest = _MISTRAL_TOOLS_RE.sub(repl_m, text)
        return calls, rest.strip()

    calls = []

    def repl(m: "re.Match[str]") -> str:
        try:
            payload = json.loads(m.group(1))
            name = payload["name"]
        except (json.JSONDecodeError, KeyError, TypeError):
            return m.group(0)  # keep malformed block as text
        args = payload.get("arguments", payload.get("parameters", {}))
        calls.append(_wire_call(name, args))
        return ""

    rest = _TOOL_CALL_RE.sub(repl, text)
    return calls, rest.strip()


def parse_chat_output(text: str, enable_reasoning: bool = True,
                      enable_tools: bool = True,
                      tool_format: str = "hermes") -> dict:
    """Full message parse: returns an OpenAI `message` dict with content,
    optional reasoning_content and tool_calls."""
    reasoning = None
    if enable_reasoning:
        reasoning, text = parse_reasoning(text)
    tool_calls: list[dict] = []
    if enable_tools:
        tool_calls, text = parse_tool_calls(text, tool_format)
    msg: dict = {"role": "assistant", "content": text or None}
    if reasoning is not None:
        msg["reasoning_content"] = reasoning
    if tool_calls:
        msg["tool_calls"] = tool_calls
        if not text:
            msg["content"] = None
    return msg
