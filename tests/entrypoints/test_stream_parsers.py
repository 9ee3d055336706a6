"""Streaming tool-call / reasoning parsing (VERDICT r3 missing #3).

Property under test: feeding the cumulative text delta-by-delta through
ChatStreamParser and reassembling the deltas must reproduce the
non-streaming parse_chat_output result exactly — content, reasoning, and
tool calls (reference: extract_tool_calls_streaming parity with
extract_tool_calls).
"""

import pytest

from vllm_trianglemix_tpu.entrypoints.openai.parsers import (
    ChatStreamParser,
    parse_chat_output,
)


def drive(text, chunk=3, **kw):
    """Feed `text` in `chunk`-char increments; reassemble the deltas."""
    p = ChatStreamParser(**kw)
    content, reasoning, calls = "", "", []
    for end in list(range(chunk, len(text), chunk)) + [len(text)]:
        for d in p.deltas(text[:end], finished=(end == len(text))):
            content += d.get("content", "")
            reasoning += d.get("reasoning_content", "")
            for c in d.get("tool_calls", []):
                calls.append((c["function"]["name"],
                              c["function"]["arguments"]))
    return content, reasoning, calls, p


def ref_parse(text, **kw):
    msg = parse_chat_output(
        text, enable_tools=kw.get("enable_tools", False),
        tool_format=kw.get("tool_format", "hermes"),
        reasoning_format=kw.get("reasoning_format", "qwen3"))
    calls = [(c["function"]["name"], c["function"]["arguments"])
             for c in msg.get("tool_calls", [])]
    return msg.get("content") or "", msg.get("reasoning_content") or "", calls


HERMES = ('I will check the weather. <tool_call>{"name": "get_weather", '
          '"arguments": {"city": "Paris"}}</tool_call> Done.')
MISTRAL = ('[TOOL_CALLS] [{"name": "add", "arguments": {"a": 1, "b": 2}}] '
           'ok')
LLAMA3 = '{"name": "search", "parameters": {"q": "tpu; pods"}}'
THINK = "<think>step one; step two</think>The answer is 42."


@pytest.mark.parametrize("chunk", [1, 3, 7])
def test_hermes_streaming_matches_nonstreaming(chunk):
    kw = dict(enable_tools=True, tool_format="hermes")
    content, _, calls, _ = drive(HERMES, chunk, **kw)
    rc, _, rcalls = ref_parse(HERMES, **kw)
    assert [c[0] for c in calls] == [c[0] for c in rcalls]
    assert [c[1] for c in calls] == [c[1] for c in rcalls]
    # streamed content never contains marker text
    assert "<tool_call>" not in content
    assert content.strip() == rc.strip()


def test_mistral_streaming(chunk=2):
    kw = dict(enable_tools=True, tool_format="mistral")
    content, _, calls, _ = drive(MISTRAL, chunk, **kw)
    rc, _, rcalls = ref_parse(MISTRAL, **kw)
    assert calls == [(n, a) for n, a in rcalls]
    assert "[TOOL_CALLS]" not in content
    assert content.strip() == rc.strip()


def test_llama3_json_streaming():
    kw = dict(enable_tools=True, tool_format="llama3_json")
    content, _, calls, _ = drive(LLAMA3, 4, **kw)
    rc, _, rcalls = ref_parse(LLAMA3, **kw)
    assert calls == rcalls
    assert content.strip() == rc.strip() == ""


def test_think_reasoning_streams_incrementally():
    p = ChatStreamParser(reasoning_format="qwen3")
    # mid-block: inner text must stream before the close tag arrives
    deltas = p.deltas("<think>step one", finished=False)
    assert deltas and deltas[0]["reasoning_content"] == "step one"
    content, reasoning, _, _ = drive(THINK, 3)
    rc, rr, _ = ref_parse(THINK)
    assert reasoning == rr
    assert content == rc
    assert "<think>" not in content and "</think>" not in content


def test_plain_content_streams_through():
    text = "Just a plain answer with no markers at all."
    content, reasoning, calls, _ = drive(text, 5, enable_tools=True,
                                         tool_format="hermes")
    assert content == text
    assert reasoning == "" and calls == []


def test_unknown_format_buffers_until_finish():
    text = "some output"
    p = ChatStreamParser(enable_tools=True, tool_format="granite")
    assert p.deltas(text[:5], finished=False) == []
    out = p.deltas(text, finished=True)
    assert out == [{"content": text}]


def test_tool_call_emitted_once():
    kw = dict(enable_tools=True, tool_format="hermes")
    p = ChatStreamParser(**kw)
    full = HERMES
    n_calls = 0
    for end in range(1, len(full) + 1):
        for d in p.deltas(full[:end], finished=(end == len(full))):
            n_calls += len(d.get("tool_calls", []))
    assert n_calls == 1
    assert p.emitted_tool_calls
