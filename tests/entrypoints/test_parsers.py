"""Tool-call and reasoning parsers (hermes / Qwen3 formats)."""

import json

from vllm_trianglemix_tpu.entrypoints.openai.parsers import (
    parse_chat_output,
    parse_reasoning,
    parse_tool_calls,
)


def test_reasoning_split():
    r, rest = parse_reasoning("<think>step 1\nstep 2</think>\nThe answer "
                              "is 4.")
    assert r == "step 1\nstep 2"
    assert rest == "The answer is 4."


def test_reasoning_unclosed_counts_as_reasoning():
    r, rest = parse_reasoning("<think>still thinki")
    assert r == "still thinki"
    assert rest == ""


def test_no_reasoning_passthrough():
    r, rest = parse_reasoning("plain text")
    assert r is None and rest == "plain text"


def test_tool_call_extraction():
    text = ('Sure.\n<tool_call>\n{"name": "get_weather", '
            '"arguments": {"city": "Paris"}}\n</tool_call>')
    calls, rest = parse_tool_calls(text)
    assert rest == "Sure."
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Paris"}


def test_multiple_tool_calls():
    text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
    calls, rest = parse_tool_calls(text)
    assert [c["function"]["name"] for c in calls] == ["a", "b"]
    assert rest == ""


def test_malformed_tool_call_kept_as_text():
    text = '<tool_call>{not json}</tool_call>'
    calls, rest = parse_tool_calls(text)
    assert calls == [] and rest == text


def test_full_message_parse():
    text = ('<think>user wants weather</think>I will check.\n'
            '<tool_call>{"name": "w", "arguments": {}}</tool_call>')
    msg = parse_chat_output(text)
    assert msg["reasoning_content"] == "user wants weather"
    assert msg["content"] == "I will check."
    assert msg["tool_calls"][0]["function"]["name"] == "w"


def test_tool_only_message_has_null_content():
    msg = parse_chat_output(
        '<tool_call>{"name": "w", "arguments": {}}</tool_call>')
    assert msg["content"] is None
    assert msg["tool_calls"]


def test_llama3_json_tool_call():
    from vllm_trianglemix_tpu.entrypoints.openai.parsers import (
        parse_tool_calls,
    )

    calls, rest = parse_tool_calls(
        '{"name": "get_weather", "parameters": {"city": "Paris"}}',
        fmt="llama3")
    assert rest == ""
    assert calls[0]["function"]["name"] == "get_weather"
    assert '"city": "Paris"' in calls[0]["function"]["arguments"]
    # Plain prose is NOT a tool call in llama3 format.
    calls, rest = parse_tool_calls("The weather is nice.", fmt="llama3")
    assert calls == [] and rest == "The weather is nice."


def test_mistral_tool_calls():
    from vllm_trianglemix_tpu.entrypoints.openai.parsers import (
        parse_tool_calls,
    )

    text = ('[TOOL_CALLS] [{"name": "a", "arguments": {"x": 1}}, '
            '{"name": "b", "arguments": {}}]')
    calls, rest = parse_tool_calls(text, fmt="mistral")
    assert rest == ""
    assert [c["function"]["name"] for c in calls] == ["a", "b"]
    # Malformed payload stays in the text.
    calls, rest = parse_tool_calls("[TOOL_CALLS] [not json]", fmt="mistral")
    assert calls == [] and "[TOOL_CALLS]" in rest
