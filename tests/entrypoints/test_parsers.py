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


# ---------------------------------------------------------------------------
# long-tail formats (reference tool_parsers/ registry)

def _one(text, fmt, name, args):
    calls, rest = parse_tool_calls(text, fmt=fmt)
    assert len(calls) == 1, (fmt, calls, rest)
    assert calls[0]["function"]["name"] == name
    assert json.loads(calls[0]["function"]["arguments"]) == args
    return rest


def test_pythonic():
    rest = _one('[get_weather(city="Paris", days=3)]', "pythonic",
                "get_weather", {"city": "Paris", "days": 3})
    assert rest == ""
    calls, rest = parse_tool_calls("[1, 2, 3]", fmt="pythonic")
    assert calls == [] and rest == "[1, 2, 3]"
    calls, _ = parse_tool_calls('[a(x=1), b()]', fmt="pythonic")
    assert [c["function"]["name"] for c in calls] == ["a", "b"]


def test_deepseek_v3():
    text = ("<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
            "<｜tool▁sep｜>get_weather\n```json\n"
            '{"city": "Paris"}\n```<｜tool▁call▁end｜><｜tool▁calls▁end｜>')
    rest = _one(text, "deepseek_v3", "get_weather", {"city": "Paris"})
    assert rest == ""


def test_deepseek_v31():
    text = ("prose <｜tool▁calls▁begin｜><｜tool▁call▁begin｜>get_weather"
            '<｜tool▁sep｜>{"city": "Paris"}<｜tool▁call▁end｜>'
            "<｜tool▁calls▁end｜>")
    rest = _one(text, "deepseek_v31", "get_weather", {"city": "Paris"})
    assert rest == "prose"


def test_internlm():
    text = ('I will check.<|action_start|><|plugin|>\n'
            '{"name": "w", "parameters": {"x": 1}}\n<|action_end|>')
    rest = _one(text, "internlm", "w", {"x": 1})
    assert rest == "I will check."


def test_granite():
    _one('<|tool_call|>[{"name": "w", "arguments": {"x": 1}}]',
         "granite", "w", {"x": 1})
    _one('[{"name": "w", "arguments": {"x": 1}}]', "granite", "w", {"x": 1})
    calls, rest = parse_tool_calls("just text", fmt="granite")
    assert calls == [] and rest == "just text"


def test_granite_20b_fc():
    text = ('<function_call> {"name": "a", "arguments": {}}'
            '<function_call> {"name": "b", "arguments": {"x": 2}}')
    calls, rest = parse_tool_calls(text, fmt="granite-20b-fc")
    assert [c["function"]["name"] for c in calls] == ["a", "b"]


def test_jamba_and_hunyuan():
    text = '<tool_calls>[{"name": "w", "arguments": {"x": 1}}]</tool_calls>'
    for fmt in ("jamba", "hunyuan_a13b"):
        _one(text, fmt, "w", {"x": 1})


def test_xlam():
    _one('[{"name": "w", "arguments": {"x": 1}}]', "xlam", "w", {"x": 1})
    _one('```json\n[{"name": "w", "arguments": {"x": 1}}]\n```', "xlam",
         "w", {"x": 1})


def test_kimi_k2():
    text = ("<|tool_calls_section_begin|><|tool_call_begin|>"
            "functions.get_weather:0<|tool_call_argument_begin|>"
            '{"city": "Paris"}<|tool_call_end|><|tool_calls_section_end|>')
    rest = _one(text, "kimi_k2", "get_weather", {"city": "Paris"})
    assert rest == ""


def test_qwen3_xml():
    text = ("<tool_call>\n<function=get_weather>\n"
            "<parameter=city>\nParis\n</parameter>\n"
            "<parameter=days>\n3\n</parameter>\n"
            "</function>\n</tool_call>")
    _one(text, "qwen3_xml", "get_weather", {"city": "Paris", "days": 3})


def test_seed_oss():
    text = ("<seed:tool_call>\n<function=w>\n<parameter=x>\n1\n"
            "</parameter>\n</function>\n</seed:tool_call>")
    _one(text, "seed_oss", "w", {"x": 1})


def test_glm4_moe():
    text = ("<tool_call>get_weather\n"
            "<arg_key>city</arg_key><arg_value>Paris</arg_value>\n"
            "<arg_key>days</arg_key><arg_value>3</arg_value>"
            "</tool_call>")
    _one(text, "glm4_moe", "get_weather", {"city": "Paris", "days": 3})


def test_phi4_mini():
    _one('functools[{"name": "w", "arguments": {"x": 1}}]',
         "phi4_mini_json", "w", {"x": 1})


def test_minimax():
    text = ('<tool_calls>\n{"name": "a", "arguments": {}}\n'
            '{"name": "b", "arguments": {"x": 1}}\n</tool_calls>')
    calls, rest = parse_tool_calls(text, fmt="minimax")
    assert [c["function"]["name"] for c in calls] == ["a", "b"]


def test_longcat():
    _one('<longcat_tool_call>{"name": "w", "arguments": {"x": 1}}'
         "</longcat_tool_call>", "longcat", "w", {"x": 1})


def test_step3():
    text = ('<｜tool_calls_begin｜><steptml:invoke name="get_weather">'
            '<steptml:parameter name="city">Paris</steptml:parameter>'
            '<steptml:parameter name="days">3</steptml:parameter>'
            "</steptml:invoke><｜tool_calls_end｜>")
    _one(text, "step3", "get_weather", {"city": "Paris", "days": 3})


def test_gpt_oss_tools():
    text = ("<|channel|>commentary to=functions.get_weather "
            '<|constrain|>json<|message|>{"city": "Paris"}<|call|>')
    _one(text, "gpt_oss", "get_weather", {"city": "Paris"})


def test_unknown_format_raises():
    import pytest

    with pytest.raises(ValueError, match="unknown tool parser"):
        parse_tool_calls("x", fmt="nope")
    with pytest.raises(ValueError, match="unknown reasoning parser"):
        parse_reasoning("x", fmt="nope")


# ---------------------------------------------------------------------------
# reasoning formats (reference reasoning/ registry)

def test_reasoning_end_only_tag():
    # DeepSeek-R1 templates open <think> in the prompt: the completion
    # starts mid-reasoning and only the closing tag appears.
    r, rest = parse_reasoning("chain of thought...</think>The answer.",
                              fmt="deepseek_r1")
    assert r == "chain of thought..."
    assert rest == "The answer."


def test_mistral_reasoning():
    r, rest = parse_reasoning("[THINK]hmm[/THINK]done", fmt="mistral")
    assert r == "hmm" and rest == "done"


def test_hunyuan_reasoning():
    r, rest = parse_reasoning(
        "<think>\nplan\n</think>\n<answer>\nresult\n</answer>",
        fmt="hunyuan_a13b")
    assert r == "plan" and rest == "result"


def test_seed_oss_reasoning():
    r, rest = parse_reasoning("<seed:think>t</seed:think>out",
                              fmt="seed_oss")
    assert r == "t" and rest == "out"


def test_gpt_oss_reasoning():
    text = ("<|channel|>analysis<|message|>let me think<|end|>"
            "<|start|>assistant<|channel|>final<|message|>Paris<|return|>")
    r, rest = parse_reasoning(text, fmt="gpt_oss")
    assert r == "let me think" and rest == "Paris"


def test_granite_reasoning():
    r, rest = parse_reasoning(
        "Here is my thought process: think hard. "
        "Here is my response: the answer.", fmt="granite")
    assert r == "think hard." and rest == "the answer."
