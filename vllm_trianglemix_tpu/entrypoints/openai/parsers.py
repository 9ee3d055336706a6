"""Tool-call and reasoning parsers for chat completions.

Registry-style equivalent of the reference's tool parser / reasoning parser
plugin registries (vllm/entrypoints/openai/tool_parsers/ — 26 parsers;
vllm/reasoning/ — 12 parsers). Each tool format is a function
``text -> (list[(name, args)], remaining_text)``; each reasoning format is
``text -> (reasoning or None, remaining_text)``. The formats reproduce the
reference parsers' *wire grammars* (marker tokens + payload layout), parsed
non-streaming on the finished message — the single place this server emits
assistant messages.

Select with ``--tool-call-parser`` / ``--reasoning-parser`` on `vtt serve`
(reference: the same flags on `vllm serve`).
"""

from __future__ import annotations

import ast
import json
import re
import uuid
from typing import Callable, Optional

# --------------------------------------------------------------------------
# helpers


def _wire_call(name: str, args) -> dict:
    if not isinstance(args, str):
        args = json.dumps(args, ensure_ascii=False)
    return {
        "id": f"chatcmpl-tool-{uuid.uuid4().hex[:24]}",
        "type": "function",
        "function": {"name": name, "arguments": args},
    }


def _json_or_none(s: str):
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        return None


def _block_extractor(start: str, end: str,
                     payload: Callable) -> Callable:
    """Build a parser that finds ``start...end`` blocks, feeds each body to
    ``payload`` (body -> list[(name, args)] or None to keep the block as
    plain text), and strips parsed blocks from the text."""
    rx = re.compile(re.escape(start) + r"(.*?)" + re.escape(end), re.DOTALL)

    def parse(text: str):
        calls: list[tuple] = []

        def repl(m: "re.Match[str]") -> str:
            got = payload(m.group(1))
            if got is None:
                return m.group(0)
            calls.extend(got)
            return ""

        rest = rx.sub(repl, text)
        return calls, rest.strip()

    return parse


def _json_obj_payload(body: str):
    """One JSON object {"name": ..., "arguments"/"parameters": ...}."""
    payload = _json_or_none(body.strip())
    if not isinstance(payload, dict) or "name" not in payload:
        return None
    return [(payload["name"],
             payload.get("arguments", payload.get("parameters", {})))]


def _json_list_payload(body: str):
    """A JSON array of {"name": ..., "arguments": ...} objects."""
    payload = _json_or_none(body.strip())
    if not isinstance(payload, list):
        return None
    out = []
    for p in payload:
        if not isinstance(p, dict) or "name" not in p:
            return None
        out.append((p["name"],
                    p.get("arguments", p.get("parameters", {}))))
    return out


# --------------------------------------------------------------------------
# tool formats


def _parse_hermes(text: str):
    """Qwen2.5/Qwen3/Hermes: <tool_call>{...}</tool_call> blocks."""
    return _block_extractor("<tool_call>", "</tool_call>",
                            _json_obj_payload)(text)


def _parse_llama3(text: str):
    """Llama 3.x json: the whole message is one JSON object (optionally
    after <|python_tag|>; reference llama_tool_parser also splits multiple
    calls on ';')."""
    body = text.strip()
    if body.startswith("<|python_tag|>"):
        body = body[len("<|python_tag|>"):]
    # Single object first — a ';' inside a JSON string (e.g. arguments
    # containing "a; b") must not split the call.
    got = _json_obj_payload(body)
    if got is not None:
        return got, ""
    # Multi-call form: ';'-separated objects. Walk with raw_decode so
    # separators inside strings are respected.
    calls = []
    pos = 0
    dec = json.JSONDecoder()
    while pos < len(body):
        while pos < len(body) and body[pos] in " \t\r\n;":
            pos += 1
        if pos >= len(body):
            break
        try:
            payload, end = dec.raw_decode(body, pos)
        except ValueError:
            return [], text
        if not isinstance(payload, dict) or "name" not in payload:
            return [], text
        calls.append((payload["name"],
                      payload.get("arguments", payload.get("parameters",
                                                           {}))))
        pos = end
    if not calls:
        return [], text
    return calls, ""


def _parse_mistral(text: str):
    """Mistral: [TOOL_CALLS] [{...}, ...] prefix blocks."""
    rx = re.compile(r"\[TOOL_CALLS\]\s*(\[.*?\])(?=\s|$)", re.DOTALL)
    calls: list[tuple] = []

    def repl(m):
        got = _json_list_payload(m.group(1))
        if got is None:
            return m.group(0)
        calls.extend(got)
        return ""

    rest = rx.sub(repl, text)
    return calls, rest.strip()


_PYTHONIC_RX = re.compile(r"\[\s*[a-zA-Z_]\w*\(.*\)\s*\]", re.DOTALL)


def _parse_pythonic(text: str):
    """Llama-4 / pythonic: [foo(a=1, b="x"), bar()] — a Python list of
    calls with keyword arguments (reference pythonic_tool_parser)."""
    m = _PYTHONIC_RX.search(text.strip())
    if m is None or m.group(0) != text.strip():
        return [], text
    try:
        node = ast.parse(m.group(0), mode="eval").body
        if not isinstance(node, ast.List):
            return [], text
        calls = []
        for el in node.elts:
            if not (isinstance(el, ast.Call)
                    and isinstance(el.func, ast.Name) and not el.args):
                return [], text
            kwargs = {kw.arg: ast.literal_eval(kw.value)
                      for kw in el.keywords}
            calls.append((el.func.id, kwargs))
    except (SyntaxError, ValueError):
        return [], text
    return calls, ""


_DSV3_RX = re.compile(
    "<｜tool▁call▁begin｜>(.*?)<｜tool▁sep｜>(.*?)\n```json\n(.*?)\n```"
    "<｜tool▁call▁end｜>", re.DOTALL)
_DSV31_RX = re.compile(
    "<｜tool▁call▁begin｜>(.*?)<｜tool▁sep｜>(.*?)<｜tool▁call▁end｜>",
    re.DOTALL)
_DS_WRAP_RX = re.compile(
    "<｜tool▁calls▁begin｜>.*?(?:<｜tool▁calls▁end｜>|$)", re.DOTALL)


def _parse_deepseek_v3(text: str):
    """DeepSeek-V3: <｜tool▁call▁begin｜>TYPE<｜tool▁sep｜>NAME\\n```json\\n
    ARGS\\n```<｜tool▁call▁end｜> inside a tool▁calls wrapper block."""
    calls = []
    for _typ, name, args in _DSV3_RX.findall(text):
        payload = _json_or_none(args)
        if payload is not None:
            calls.append((name.strip(), payload))
    rest = _DS_WRAP_RX.sub("", text) if calls else text
    return calls, rest.strip()


def _parse_deepseek_v31(text: str):
    """DeepSeek-V3.1: <｜tool▁call▁begin｜>NAME<｜tool▁sep｜>ARGS
    <｜tool▁call▁end｜> (args are bare JSON, no code fence)."""
    calls = []
    for name, args in _DSV31_RX.findall(text):
        payload = _json_or_none(args.strip())
        if payload is not None:
            calls.append((name.strip(), payload))
    rest = _DS_WRAP_RX.sub("", text) if calls else text
    return calls, rest.strip()


def _parse_internlm2(text: str):
    """InternLM2: <|action_start|><|plugin|>{...}<|action_end|>."""
    rx = re.compile(r"<\|action_start\|>\s*<\|plugin\|>(.*?)<\|action_end\|>",
                    re.DOTALL)
    calls: list[tuple] = []

    def repl(m):
        got = _json_obj_payload(m.group(1))
        if got is None:
            return m.group(0)
        calls.extend(got)
        return ""

    rest = rx.sub(repl, text)
    return calls, rest.strip()


def _parse_granite(text: str):
    """Granite 3: <|tool_call|> (or <tool_call>) prefix + JSON list."""
    body = text.strip()
    for tok in ("<|tool_call|>", "<tool_call>"):
        if body.startswith(tok):
            got = _json_list_payload(body[len(tok):])
            return (got, "") if got is not None else ([], text)
    got = _json_list_payload(body)
    return (got, "") if got is not None else ([], text)


def _parse_granite_20b_fc(text: str):
    """Granite 20B function-calling: repeated <function_call> {...}."""
    parts = re.split(r"<function_call>\s*", text)
    calls = []
    for part in parts[1:]:
        got = _json_obj_payload(part)
        if got is None:
            return [], text
        calls.extend(got)
    return (calls, parts[0].strip()) if calls else ([], text)


def _parse_jamba(text: str):
    """Jamba: <tool_calls>[{...}, ...]</tool_calls>."""
    return _block_extractor("<tool_calls>", "</tool_calls>",
                            _json_list_payload)(text)


def _parse_hunyuan(text: str):
    """HunYuan A13B: same wire grammar as Jamba (JSON array inside
    <tool_calls> tags), after the <answer> section is unwrapped by the
    hunyuan reasoning parser."""
    return _parse_jamba(text)


def _parse_xlam(text: str):
    """xLAM: a bare JSON list of calls, possibly in a ```json fence or
    after [TOOL_CALLS]."""
    body = text.strip()
    if body.startswith("[TOOL_CALLS]"):
        body = body[len("[TOOL_CALLS]"):].strip()
    fence = re.match(r"```(?:json)?\s*(.*?)```\s*$", body, re.DOTALL)
    if fence:
        body = fence.group(1).strip()
    got = _json_list_payload(body)
    return (got, "") if got is not None else ([], text)


_KIMI_RX = re.compile(
    r"<\|tool_call_begin\|>\s*(.+?:\d+)\s*<\|tool_call_argument_begin\|>"
    r"\s*(.*?)\s*<\|tool_call_end\|>", re.DOTALL)


def _parse_kimi_k2(text: str):
    """Kimi K2: <|tool_call_begin|>functions.NAME:IDX
    <|tool_call_argument_begin|>{...}<|tool_call_end|>."""
    calls = []
    for call_id, args in _KIMI_RX.findall(text):
        payload = _json_or_none(args)
        if payload is None:
            continue
        name = call_id.split(":")[0]
        name = name.split("functions.")[-1]
        calls.append((name, payload))
    rest = _KIMI_RX.sub("", text)
    rest = re.sub(r"<\|tool_calls_section_(begin|end)\|>", "", rest)
    return calls, rest.strip()


def _xml_function_payload(body: str):
    """<function=NAME><parameter=KEY>VALUE</parameter>...</function> —
    shared by qwen3_xml (Qwen3-Coder) and seed_oss."""
    calls = []
    for fn in re.finditer(r"<function=([^>\n]+)>(.*?)(?:</function>|$)",
                          body, re.DOTALL):
        name, inner = fn.group(1).strip(), fn.group(2)
        args = {}
        for pm in re.finditer(
                r"<parameter=([^>\n]+)>(.*?)(?:</parameter>|$)",
                inner, re.DOTALL):
            val = pm.group(2).strip("\n")
            try:
                args[pm.group(1).strip()] = json.loads(val)
            except json.JSONDecodeError:
                args[pm.group(1).strip()] = val
        calls.append((name, args))
    return calls or None


def _parse_qwen3_xml(text: str):
    """Qwen3-Coder XML: <tool_call><function=NAME><parameter=KEY>VALUE
    </parameter>...</function></tool_call>."""
    return _block_extractor("<tool_call>", "</tool_call>",
                            _xml_function_payload)(text)


def _parse_seed_oss(text: str):
    """Seed-OSS: the qwen3-style XML grammar inside <seed:tool_call>."""
    return _block_extractor("<seed:tool_call>", "</seed:tool_call>",
                            _xml_function_payload)(text)


def _glm4_payload(body: str):
    """NAME\\n<arg_key>K</arg_key><arg_value>V</arg_value>... — GLM-4.5."""
    m = re.match(r"([^\n<]*)\n?(.*)", body, re.DOTALL)
    name = m.group(1).strip()
    if not name:
        return None
    args = {}
    for am in re.finditer(r"<arg_key>(.*?)</arg_key>\s*"
                          r"<arg_value>(.*?)</arg_value>",
                          m.group(2), re.DOTALL):
        val = am.group(2).strip()
        try:
            args[am.group(1).strip()] = json.loads(val)
        except json.JSONDecodeError:
            args[am.group(1).strip()] = val
    return [(name, args)]


def _parse_glm4_moe(text: str):
    return _block_extractor("<tool_call>", "</tool_call>",
                            _glm4_payload)(text)


def _parse_phi4mini(text: str):
    """Phi-4-mini: functools[{...}, ...]."""
    rx = re.compile(r"functools\[(.*?)\]", re.DOTALL)
    calls: list[tuple] = []

    def repl(m):
        got = _json_list_payload("[" + m.group(1) + "]")
        if got is None:
            return m.group(0)
        calls.extend(got)
        return ""

    rest = rx.sub(repl, text)
    return calls, rest.strip()


def _minimax_payload(body: str):
    """Newline-separated JSON objects (MiniMax M1)."""
    calls = []
    for line in body.splitlines():
        line = line.strip()
        if not line:
            continue
        got = _json_obj_payload(line)
        if got is None:
            return None
        calls.extend(got)
    return calls or None


def _parse_minimax(text: str):
    return _block_extractor("<tool_calls>", "</tool_calls>",
                            _minimax_payload)(text)


def _parse_longcat(text: str):
    """LongCat: <longcat_tool_call>{...}</longcat_tool_call>."""
    return _block_extractor("<longcat_tool_call>", "</longcat_tool_call>",
                            _json_obj_payload)(text)


def _steptml_payload(body: str):
    """<steptml:invoke name="N"><steptml:parameter name="K">V
    </steptml:parameter></steptml:invoke> — Step-3."""
    calls = []
    for inv in re.finditer(
            r'<steptml:invoke name="([^"]+)">(.*?)</steptml:invoke>',
            body, re.DOTALL):
        args = {}
        for pm in re.finditer(
                r'<steptml:parameter name="([^"]+)">([^<]*)'
                r"</steptml:parameter>", inv.group(2)):
            val = pm.group(2).strip()
            try:
                args[pm.group(1)] = json.loads(val)
            except json.JSONDecodeError:
                args[pm.group(1)] = val
        calls.append((inv.group(1), args))
    return calls or None


def _parse_step3(text: str):
    return _block_extractor("<｜tool_calls_begin｜>", "<｜tool_calls_end｜>",
                            _steptml_payload)(text)


_HARMONY_TOOL_RX = re.compile(
    r"<\|channel\|>commentary to=functions\.([\w.-]+).*?"
    r"<\|message\|>(.*?)(?:<\|call\|>|$)", re.DOTALL)


def _parse_gpt_oss(text: str):
    """GPT-OSS harmony: <|channel|>commentary to=functions.NAME
    <|constrain|>json<|message|>{...}<|call|> (reference
    openai_tool_parser via the harmony message recipient)."""
    calls = []
    for name, args in _HARMONY_TOOL_RX.findall(text):
        payload = _json_or_none(args.strip())
        if payload is not None:
            calls.append((name, payload))
    rest = _HARMONY_TOOL_RX.sub("", text)
    return calls, rest.strip()


TOOL_FORMATS: dict[str, Callable] = {
    "hermes": _parse_hermes,
    "llama3_json": _parse_llama3,
    "llama3": _parse_llama3,  # back-compat alias
    "llama4_json": _parse_llama3,
    "mistral": _parse_mistral,
    "pythonic": _parse_pythonic,
    "llama4_pythonic": _parse_pythonic,
    "deepseek_v3": _parse_deepseek_v3,
    "deepseek_v31": _parse_deepseek_v31,
    "internlm": _parse_internlm2,
    "granite": _parse_granite,
    "granite-20b-fc": _parse_granite_20b_fc,
    "jamba": _parse_jamba,
    "hunyuan_a13b": _parse_hunyuan,
    "xlam": _parse_xlam,
    "kimi_k2": _parse_kimi_k2,
    "qwen3_xml": _parse_qwen3_xml,
    "qwen3_coder": _parse_qwen3_xml,
    "seed_oss": _parse_seed_oss,
    "glm4_moe": _parse_glm4_moe,
    "phi4_mini_json": _parse_phi4mini,
    "minimax": _parse_minimax,
    "longcat": _parse_longcat,
    "step3": _parse_step3,
    "openai": _parse_gpt_oss,
    "gpt_oss": _parse_gpt_oss,
}

# --------------------------------------------------------------------------
# reasoning formats


def _tag_reasoning(start: str, end: str) -> Callable:
    """<START>...<END> reasoning splitter. Handles: missing start tag
    (DeepSeek-R1 templates open the tag in the prompt — everything before
    END is reasoning) and an unclosed tag (cut off mid-thought)."""
    rx = re.compile(re.escape(start) + r"(.*?)" + re.escape(end), re.DOTALL)
    open_rx = re.compile(re.escape(start) + r"(.*)$", re.DOTALL)

    def parse(text: str):
        segments = rx.findall(text)
        rest = rx.sub("", text)
        if not segments and start not in text and end in text:
            seg, _, rest = text.partition(end)
            segments = [seg]
        m = open_rx.search(rest)
        if m:
            segments.append(m.group(1))
            rest = open_rx.sub("", rest)
        if not segments:
            return None, text
        return "\n".join(s.strip() for s in segments), rest.lstrip("\n")

    return parse


_parse_think = _tag_reasoning("<think>", "</think>")


def _parse_hunyuan_reasoning(text: str):
    """HunYuan: <think>R</think><answer>C</answer> — also unwraps the
    answer tags around the content."""
    reasoning, rest = _parse_think(text)
    m = re.search(r"<answer>(.*?)(?:</answer>|$)", rest, re.DOTALL)
    if m:
        rest = m.group(1).strip()
    return reasoning, rest


_HARMONY_FINAL = "<|channel|>final<|message|>"
_HARMONY_ANALYSIS_RX = re.compile(
    r"<\|channel\|>analysis<\|message\|>(.*?)(?:<\|end\|>|$)", re.DOTALL)


def _parse_gptoss_reasoning(text: str):
    """GPT-OSS harmony: analysis-channel messages are reasoning; the text
    after the last final-channel marker is the content."""
    segments = _HARMONY_ANALYSIS_RX.findall(text)
    idx = text.rfind(_HARMONY_FINAL)
    if idx >= 0:
        rest = text[idx + len(_HARMONY_FINAL):]
        for tok in ("<|end|>", "<|return|>"):
            rest = rest.replace(tok, "")
    elif segments:
        rest = ""
    else:
        return None, text
    if not segments:
        return None, rest.strip()
    return "\n".join(s.strip() for s in segments), rest.strip()


def _parse_granite_reasoning(text: str):
    """Granite: 'Here is my thought process:' R 'Here is my response:' C."""
    m = re.search(r"Here is my thought process:(.*?)"
                  r"Here is my response:(.*)$", text, re.DOTALL)
    if m is None:
        return None, text
    return m.group(1).strip(), m.group(2).strip()


REASONING_FORMATS: dict[str, Callable] = {
    "qwen3": _parse_think,
    "deepseek_r1": _parse_think,
    "glm4_moe": _parse_think,
    "step3": _parse_think,
    "minimax": _parse_think,
    "mistral": _tag_reasoning("[THINK]", "[/THINK]"),
    "hunyuan_a13b": _parse_hunyuan_reasoning,
    "seed_oss": _tag_reasoning("<seed:think>", "</seed:think>"),
    "gpt_oss": _parse_gptoss_reasoning,
    "openai_gptoss": _parse_gptoss_reasoning,
    "granite": _parse_granite_reasoning,
}

# --------------------------------------------------------------------------
# public API


def parse_reasoning(text: str,
                    fmt: str = "qwen3") -> tuple[Optional[str], str]:
    """Split reasoning segments out of the text. Returns
    (reasoning_content or None, remaining_text)."""
    try:
        parser = REASONING_FORMATS[fmt]
    except KeyError:
        raise ValueError(
            f"unknown reasoning parser {fmt!r}; "
            f"choose from {sorted(REASONING_FORMATS)}") from None
    return parser(text)


def parse_tool_calls(text: str,
                     fmt: str = "hermes") -> tuple[list[dict], str]:
    """Extract tool calls in the given model-family format. Returns
    (tool_calls in OpenAI wire format, remaining_text). Malformed
    payloads are left in the text untouched."""
    try:
        parser = TOOL_FORMATS[fmt]
    except KeyError:
        raise ValueError(
            f"unknown tool parser {fmt!r}; "
            f"choose from {sorted(TOOL_FORMATS)}") from None
    calls, rest = parser(text)
    return [_wire_call(n, a) for n, a in calls], rest


def parse_chat_output(text: str, enable_reasoning: bool = True,
                      enable_tools: bool = True,
                      tool_format: str = "hermes",
                      reasoning_format: str = "qwen3") -> dict:
    """Full message parse: returns an OpenAI `message` dict with content,
    optional reasoning_content and tool_calls."""
    reasoning = None
    if enable_reasoning:
        reasoning, text = parse_reasoning(text, reasoning_format)
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


# --------------------------------------------------------------------------
# Streaming (reference: extract_tool_calls_streaming on every tool parser,
# e.g. hermes_tool_parser.py, and the streaming reasoning parsers).
#
# Strategy: re-run the non-streaming parser on the CUMULATIVE text each
# delta — the single source of truth — and diff against what was already
# emitted. Content is held back from the earliest (possibly partial)
# occurrence of a tool-call start marker, so marker text never leaks into
# content deltas; a completed call is emitted as ONE tool_calls delta the
# moment the full parser first finds it. Formats without a marker entry
# buffer and emit everything in the final chunk (safe fallback).

# Markers that may OPEN a tool-call region, per tool format. "{" entries
# apply only at the very start of the (post-reasoning) text (llama3-json
# emits a bare JSON object as the whole message).
STREAM_TOOL_MARKERS: dict[str, list[str]] = {
    "hermes": ["<tool_call>"],
    "mistral": ["[TOOL_CALLS]"],
    "llama3_json": ["<|python_tag|>", "{"],
    "llama3": ["<|python_tag|>", "{"],
    "llama4_json": ["<|python_tag|>", "{"],
}

# (open, close) tags for streamable reasoning blocks. assume-open formats
# treat the whole message as reasoning until the close tag (DeepSeek-R1
# templates open the tag inside the prompt — reference
# deepseek_r1_reasoning_parser streams the same way).
STREAM_REASONING_TAGS: dict[str, tuple[str, str]] = {
    "qwen3": ("<think>", "</think>"),
    "deepseek_r1": ("<think>", "</think>"),
    "glm4_moe": ("<think>", "</think>"),
    "step3": ("<think>", "</think>"),
    "minimax": ("<think>", "</think>"),
    "mistral": ("[THINK]", "[/THINK]"),
    "seed_oss": ("<seed:think>", "</seed:think>"),
}
_ASSUME_OPEN_REASONING = {"deepseek_r1"}


def _partial_suffix_len(text: str, marker: str) -> int:
    """Length of the longest proper prefix of ``marker`` that ends ``text``."""
    for n in range(min(len(marker) - 1, len(text)), 0, -1):
        if text.endswith(marker[:n]):
            return n
    return 0


class ChatStreamParser:
    """Incremental chat-output parser for the SSE path: feed the
    cumulative generated text, get OpenAI ``delta`` dicts back."""

    def __init__(self, enable_tools: bool = False,
                 tool_format: str = "hermes",
                 reasoning_format: str = "qwen3",
                 enable_reasoning: bool = True) -> None:
        self.enable_tools = enable_tools
        self.tool_format = tool_format
        self.reasoning_format = reasoning_format
        self.enable_reasoning = (enable_reasoning
                                 and reasoning_format in
                                 STREAM_REASONING_TAGS)
        self._sent_reasoning = 0
        self._sent_content = 0
        self._sent_calls = 0
        self.emitted_tool_calls = False

    # -- internals ---------------------------------------------------------
    def _split_reasoning(self, text: str, finished: bool):
        """Returns (reasoning_stream_text or None, rest, hold_all)."""
        if not self.enable_reasoning:
            return None, text, False
        open_t, close_t = STREAM_REASONING_TAGS[self.reasoning_format]
        stripped = text.lstrip()
        lead = len(text) - len(stripped)
        if stripped.startswith(open_t):
            inner_start = lead + len(open_t)
            close_at = text.find(close_t, inner_start)
            if close_at < 0:
                inner = text[inner_start:]
                if not finished:
                    inner = inner[:len(inner)
                                  - _partial_suffix_len(inner, close_t)]
                return inner, "", False
            return (text[inner_start:close_at],
                    text[close_at + len(close_t):], False)
        if not finished and open_t.startswith(stripped) and stripped:
            return None, "", False   # partial open tag: hold
        if self.reasoning_format in _ASSUME_OPEN_REASONING:
            close_at = text.find(close_t)
            if close_at < 0:
                if finished:
                    return None, text, False
                safe = len(text) - _partial_suffix_len(text, close_t)
                return text[:safe], "", False
            return text[:close_at], text[close_at + len(close_t):], False
        return None, text, False

    def _safe_content_len(self, rest: str, finished: bool) -> int:
        if finished:
            return len(rest)
        if not self.enable_tools:
            return len(rest)
        markers = STREAM_TOOL_MARKERS.get(self.tool_format)
        if markers is None:
            return 0   # unknown grammar: buffer until finish
        safe = len(rest)
        for m in markers:
            if m == "{":
                # whole-message JSON form: hold only when the message IS
                # a bare object from the start
                if rest.lstrip().startswith("{"):
                    safe = min(safe, len(rest) - len(rest.lstrip()))
                continue
            at = rest.find(m)
            if at >= 0:
                safe = min(safe, at)
            safe = min(safe, len(rest) - _partial_suffix_len(rest, m))
        return safe

    # -- public ------------------------------------------------------------
    def deltas(self, full_text: str, finished: bool = False) -> list[dict]:
        out: list[dict] = []
        reasoning, rest, _ = self._split_reasoning(full_text, finished)
        if reasoning is not None:
            new = reasoning[self._sent_reasoning:]
            if new:
                out.append({"reasoning_content": new})
                self._sent_reasoning = len(reasoning)

        calls: list[dict] = []
        if self.enable_tools:
            calls, rest = parse_tool_calls(rest, self.tool_format)

        safe = self._safe_content_len(rest, finished)
        new_content = rest[self._sent_content:safe]
        if new_content:
            out.append({"content": new_content})
            self._sent_content = safe

        if len(calls) > self._sent_calls:
            out.append({"tool_calls": [
                {"index": i, **call}
                for i, call in enumerate(calls)
            ][self._sent_calls:]})
            self._sent_calls = len(calls)
            self.emitted_tool_calls = True
        return out
