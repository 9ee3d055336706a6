"""EBNF (Lark/GBNF-style) grammar -> regex translation.

Role of the reference's guided_grammar path
(vllm/v1/structured_output/backend_xgrammar.py compiles Lark-style EBNF
via xgrammar). The TPU engine constrains sampling with a DFA token-mask
(regex_engine.py), so context-free grammars are compiled the same way
recursive JSON schemas are (json_schema.py): recursion is unrolled to a
bounded depth, with recursive alternatives pruned at the limit so
self-referential grammars terminate with their base cases. This covers
practical guided-output grammars (bounded-nesting expressions, tagged
formats, JSON dialects); truly unbounded center-recursion deeper than
``depth`` is rejected at generation time by the DFA, not mid-string.

Accepted syntax (the intersection people actually write):
- rules:       ``name: body`` (Lark) or ``name ::= body`` (GBNF),
               one per line; later lines without a rule head continue
               the previous rule
- terminals:   ``"literal"`` (escaped), ``/regex/`` (passed through to
               the regex engine), ``[a-z0-9]`` character classes
- operators:   concatenation, ``|`` alternation, ``( )`` grouping,
               ``[ ]``-wrapped optional groups (Lark), postfix
               ``* + ?``
- root rule:   ``root`` (xgrammar), else ``start`` (Lark), else the
               first rule defined
- comments:    ``// ...`` and ``# ...`` to end of line
"""

from __future__ import annotations

import re

_RULE_HEAD = re.compile(r"^\s*([A-Za-z_][\w.]*)\s*(::=|:)\s*(.*)$")
_COMMENT = re.compile(r"//[^\n]*|(?<!\S)#[^\n]*")


class GrammarError(ValueError):
    pass


# --- tokenizer -------------------------------------------------------------

_TOK = re.compile(
    r'''("(?:[^"\\]|\\.)*")     # quoted literal
      | (/(?:[^/\\]|\\.)+/)     # /regex/ terminal
      | (\[(?:[^\]\\\s"/]|\\.)+\])  # character class (no spaces/quotes —
                                    # those mark Lark optional groups)
      | ([A-Za-z_][\w.]*)       # rule / terminal reference
      | ([()|*+?])              # operators
      | (\s+)                   # whitespace
    ''', re.VERBOSE)


def _tokenize(body: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(body):
        m = _TOK.match(body, pos)
        if m is None:
            # Lark optional group brackets: "[" ... "]" with inner spaces
            # are caught by the char-class branch only when bracket
            # contents have no spaces; treat a stray "[" / "]" as
            # optional-group delimiters.
            ch = body[pos]
            if ch in "[]":
                out.append(("opt" if ch == "[" else "optend", ch))
                pos += 1
                continue
            raise GrammarError(f"can't tokenize grammar at: "
                               f"{body[pos:pos + 20]!r}")
        pos = m.end()
        lit, rx, cls, ref, op, ws = m.groups()
        if ws:
            continue
        if lit is not None:
            out.append(("lit", lit))
        elif rx is not None:
            out.append(("rx", rx))
        elif cls is not None:
            out.append(("cls", cls))
        elif ref is not None:
            out.append(("ref", ref))
        else:
            out.append(("op", op))
    return out


# --- AST -------------------------------------------------------------------
# nodes: ("lit", regex_src) | ("ref", name) | ("cat", [nodes])
#      | ("alt", [nodes]) | ("rep", node, suffix)


class _P:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self):
        node = self.alt()
        if self.i != len(self.toks):
            raise GrammarError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def alt(self):
        parts = [self.cat()]
        while self.peek() == ("op", "|"):
            self.take()
            parts.append(self.cat())
        return parts[0] if len(parts) == 1 else ("alt", parts)

    def cat(self):
        parts = []
        while True:
            kind, val = self.peek()
            if kind is None or (kind == "op" and val in ")|") \
                    or kind == "optend":
                break
            parts.append(self.item())
        if not parts:
            return ("lit", "")
        return parts[0] if len(parts) == 1 else ("cat", parts)

    def item(self):
        kind, val = self.take()
        if kind == "lit":
            body = _unquote(val)
            node = ("lit", re.escape(body))
        elif kind == "rx":
            node = ("lit", val[1:-1])
        elif kind == "cls":
            node = ("lit", val)
        elif kind == "ref":
            node = ("ref", val)
        elif kind == "op" and val == "(":
            node = self.alt()
            if self.take() != ("op", ")"):
                raise GrammarError("unbalanced parentheses")
        elif kind == "opt":
            node = self.alt()
            if self.take()[0] != "optend":
                raise GrammarError("unbalanced optional brackets")
            node = ("rep", node, "?")
        else:
            raise GrammarError(f"unexpected token {val!r}")
        while self.peek()[0] == "op" and self.peek()[1] in "*+?":
            node = ("rep", node, self.take()[1])
        return node


def _unquote(quoted: str) -> str:
    body = quoted[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            n = body[i + 1]
            out.append({"n": "\n", "t": "\t", "r": "\r"}.get(n, n))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


# --- grammar parse ---------------------------------------------------------

def parse_grammar(src: str) -> dict[str, object]:
    src = _COMMENT.sub("", src)
    rules: dict[str, str] = {}
    current = None
    for line in src.splitlines():
        if not line.strip():
            continue
        if line.lstrip().startswith("%"):
            raise GrammarError(
                f"Lark directives are not supported: {line.strip()!r}")
        m = _RULE_HEAD.match(line)
        if m:
            current = m.group(1)
            rules[current] = m.group(3)
        elif current is not None:
            rules[current] += " " + line.strip()
        else:
            raise GrammarError(f"text before first rule: {line.strip()!r}")
    if not rules:
        raise GrammarError("empty grammar")
    return {name: _P(_tokenize(body)).parse()
            for name, body in rules.items()}


# --- regex emission with bounded recursion --------------------------------

def _refs_of(node) -> set[str]:
    kind = node[0]
    if kind == "ref":
        return {node[1]}
    if kind in ("cat", "alt"):
        out = set()
        for c in node[1]:
            out |= _refs_of(c)
        return out
    if kind == "rep":
        return _refs_of(node[1])
    return set()


class _Prune(Exception):
    """This branch needs recursion deeper than the depth budget."""


def _emit(node, rules, stack: tuple, depth: int) -> str:
    kind = node[0]
    if kind == "lit":
        return f"({node[1]})" if node[1] else ""
    if kind == "cat":
        return "".join(_emit(c, rules, stack, depth) for c in node[1])
    if kind == "alt":
        parts = []
        for c in node[1]:
            try:
                parts.append(_emit(c, rules, stack, depth))
            except _Prune:
                continue   # recursive alternative pruned at the limit
        if not parts:
            raise _Prune
        return "(" + "|".join(parts) + ")"
    if kind == "rep":
        try:
            inner = _emit(node[1], rules, stack, depth)
        except _Prune:
            if node[2] in "?*":
                return ""  # zero repetitions still legal
            raise
        return f"({inner}){node[2]}"
    if kind == "ref":
        name = node[1]
        if name not in rules:
            raise GrammarError(f"undefined rule {name!r}")
        # Recursion budget: each re-entry of a rule already on the stack
        # spends one depth level (mirrors json_schema.py unrolling).
        if name in stack:
            if depth <= 0:
                raise _Prune
            return _emit(rules[name], rules, stack + (name,), depth - 1)
        return _emit(rules[name], rules, stack + (name,), depth)
    raise GrammarError(f"bad node {node!r}")


def grammar_to_regex(src: str, depth: int = 6) -> str:
    """Compile a Lark/GBNF-style EBNF grammar to a regex for the DFA
    engine, unrolling recursion ``depth`` levels deep."""
    rules = parse_grammar(src)
    for root in ("root", "start"):
        if root in rules:
            break
    else:
        root = next(iter(rules))
    try:
        return _emit(("ref", root), rules, (), depth)
    except _Prune:
        raise GrammarError(
            "grammar has no non-recursive base case within the "
            f"recursion budget (depth={depth})") from None
