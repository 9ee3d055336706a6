"""Regex -> NFA -> DFA engine with vectorized token-mask rows.

The role xgrammar/outlines play in the reference (compile a constraint to
an automaton, then per step produce an allowed-token bitmask) implemented
from scratch:

- recursive-descent parser for a practical regex subset: literals, ``.``,
  ``[...]`` classes (ranges, negation), escapes (``\\d \\w \\s \\n \\t``
  and literal escapes), ``* + ? {m} {m,} {m,n}``, alternation, groups;
- Thompson NFA construction, subset construction to a DFA over a
  *character-class alphabet* (chars partitioned so the DFA table stays
  tiny regardless of unicode), dead-state pruning to states that can
  still reach an accept;
- ``TokenMask``: per-DFA-state rows (allowed bool[V], next_state int[V])
  computed with one vectorized numpy walk over the whole vocabulary's
  char matrix and cached — the hot path cost per decode step is a dict
  lookup.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

# --- AST ----------------------------------------------------------------------


@dataclass
class Node:
    pass


@dataclass
class Lit(Node):
    chars: frozenset  # set of ints (codepoints); None entry = "any other"
    negated: bool = False
    any: bool = False  # '.'


@dataclass
class Concat(Node):
    parts: list


@dataclass
class Alt(Node):
    options: list


@dataclass
class Repeat(Node):
    node: Node
    lo: int
    hi: Optional[int]  # None = unbounded


_CLASS_ESCAPES = {
    "d": set(range(ord("0"), ord("9") + 1)),
    "w": set(range(ord("a"), ord("z") + 1))
    | set(range(ord("A"), ord("Z") + 1))
    | set(range(ord("0"), ord("9") + 1)) | {ord("_")},
    "s": {ord(" "), ord("\t"), ord("\n"), ord("\r"), ord("\f"), 11},
}
_CHAR_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "f": "\f", "0": "\0"}


class RegexParseError(ValueError):
    pass


class _Parser:

    def __init__(self, pattern: str) -> None:
        self.p = pattern
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def take(self) -> str:
        c = self.p[self.i]
        self.i += 1
        return c

    def parse(self) -> Node:
        node = self.alt()
        if self.i != len(self.p):
            raise RegexParseError(f"trailing input at {self.i}: {self.p}")
        return node

    def alt(self) -> Node:
        options = [self.concat()]
        while self.peek() == "|":
            self.take()
            options.append(self.concat())
        return options[0] if len(options) == 1 else Alt(options)

    def concat(self) -> Node:
        parts = []
        while self.peek() is not None and self.peek() not in "|)":
            parts.append(self.repeat())
        if not parts:
            return Concat([])
        return parts[0] if len(parts) == 1 else Concat(parts)

    def repeat(self) -> Node:
        node = self.atom()
        while True:
            c = self.peek()
            if c == "*":
                self.take()
                node = Repeat(node, 0, None)
            elif c == "+":
                self.take()
                node = Repeat(node, 1, None)
            elif c == "?":
                self.take()
                node = Repeat(node, 0, 1)
            elif c == "{":
                save = self.i
                self.take()
                spec = ""
                while self.peek() is not None and self.peek() != "}":
                    spec += self.take()
                if self.peek() != "}":
                    self.i = save
                    break
                self.take()
                try:
                    if "," in spec:
                        lo_s, hi_s = spec.split(",", 1)
                        lo = int(lo_s) if lo_s else 0
                        hi = int(hi_s) if hi_s.strip() else None
                    else:
                        lo = hi = int(spec)
                except ValueError as e:
                    raise RegexParseError(f"bad repeat {{{spec}}}") from e
                node = Repeat(node, lo, hi)
            else:
                break
        return node

    def atom(self) -> Node:
        c = self.peek()
        if c is None:
            raise RegexParseError("unexpected end")
        if c == "(":
            self.take()
            if self.p[self.i:self.i + 2] == "?:":
                self.i += 2
            node = self.alt()
            if self.peek() != ")":
                raise RegexParseError("unclosed group")
            self.take()
            return node
        if c == "[":
            return self.char_class()
        if c == ".":
            self.take()
            return Lit(frozenset(), any=True)
        if c == "\\":
            self.take()
            e = self.take()
            if e in _CLASS_ESCAPES:
                return Lit(frozenset(_CLASS_ESCAPES[e]))
            if e.lower() in _CLASS_ESCAPES and e.isupper():
                return Lit(frozenset(_CLASS_ESCAPES[e.lower()]),
                           negated=True)
            return Lit(frozenset({self._escape_codepoint(e)}))
        if c in "*+?{":
            raise RegexParseError(f"dangling quantifier at {self.i}")
        self.take()
        return Lit(frozenset({ord(c)}))

    def _escape_codepoint(self, e: str) -> int:
        """Codepoint of an escape whose introducer char was consumed."""
        if e == "x":
            h = self.take() + self.take()
            return int(h, 16)
        if e == "u":
            h = "".join(self.take() for _ in range(4))
            return int(h, 16)
        return ord(_CHAR_ESCAPES.get(e, e))

    def char_class(self) -> Node:
        assert self.take() == "["
        negated = False
        if self.peek() == "^":
            self.take()
            negated = True
        chars: set[int] = set()
        first = True
        while True:
            c = self.peek()
            if c is None:
                raise RegexParseError("unclosed [")
            if c == "]" and not first:
                self.take()
                break
            first = False
            if c == "\\":
                self.take()
                e = self.take()
                if e in _CLASS_ESCAPES:
                    chars |= _CLASS_ESCAPES[e]
                    continue
                lo = self._escape_codepoint(e)
            else:
                lo = ord(self.take())
            if self.peek() == "-" and self.i + 1 < len(self.p) \
                    and self.p[self.i + 1] != "]":
                self.take()
                nxt = self.take()
                hi = (self._escape_codepoint(self.take())
                      if nxt == "\\" else ord(nxt))
                chars |= set(range(lo, hi + 1))
            else:
                chars.add(lo)
        return Lit(frozenset(chars), negated=negated)


# --- NFA ----------------------------------------------------------------------


class _NFA:
    """Thompson construction. Transitions on character-class ids."""

    def __init__(self) -> None:
        self.eps: list[list[int]] = []
        self.edges: list[list[tuple[int, int]]] = []  # (class_id, dst)

    def new_state(self) -> int:
        self.eps.append([])
        self.edges.append([])
        return len(self.eps) - 1


def _collect_char_sets(node: Node, sets: list) -> None:
    if isinstance(node, Lit):
        sets.append(node)
    elif isinstance(node, Concat):
        for p in node.parts:
            _collect_char_sets(p, sets)
    elif isinstance(node, Alt):
        for o in node.options:
            _collect_char_sets(o, sets)
    elif isinstance(node, Repeat):
        _collect_char_sets(node.node, sets)


class Alphabet:
    """Partition of all codepoints into equivalence classes w.r.t. the
    pattern's literals. Class 0 is 'any char not mentioned'."""

    def __init__(self, lits: list[Lit]) -> None:
        mentioned: set[int] = set()
        for lit in lits:
            mentioned |= set(lit.chars)
        # signature per char: which lits accept it
        sig_to_class: dict[tuple, int] = {}
        self.char_class: dict[int, int] = {}
        # class 0 = unmentioned chars
        other_sig = tuple(self._accepts(lit, None) for lit in lits)
        sig_to_class[other_sig] = 0
        self._lits = lits
        for ch in sorted(mentioned):
            sig = tuple(self._accepts(lit, ch) for lit in lits)
            cls = sig_to_class.setdefault(sig, len(sig_to_class))
            self.char_class[ch] = cls
        self.num_classes = len(sig_to_class)
        # class -> whether each lit accepts it
        self.class_sig: list[tuple] = [None] * self.num_classes
        for sig, cls in sig_to_class.items():
            self.class_sig[cls] = sig

    @staticmethod
    def _accepts(lit: Lit, ch: Optional[int]) -> bool:
        if lit.any:
            return True
        if ch is None:  # the "other" char
            return lit.negated
        inside = ch in lit.chars
        return inside != lit.negated

    def classify(self, ch: str) -> int:
        return self.char_class.get(ord(ch), 0)

    def lit_classes(self, lit_idx: int) -> list[int]:
        return [c for c in range(self.num_classes)
                if self.class_sig[c][lit_idx]]


def _build_nfa(node: Node, nfa: _NFA, alphabet: Alphabet,
               lit_index: dict) -> tuple[int, int]:
    """Returns (start, end) states; end has no outgoing edges."""
    if isinstance(node, Lit):
        s, e = nfa.new_state(), nfa.new_state()
        for cls in alphabet.lit_classes(lit_index[id(node)]):
            nfa.edges[s].append((cls, e))
        return s, e
    if isinstance(node, Concat):
        s = e = nfa.new_state()
        for part in node.parts:
            ps, pe = _build_nfa(part, nfa, alphabet, lit_index)
            nfa.eps[e].append(ps)
            e = pe
        return s, e
    if isinstance(node, Alt):
        s, e = nfa.new_state(), nfa.new_state()
        for opt in node.options:
            os_, oe = _build_nfa(opt, nfa, alphabet, lit_index)
            nfa.eps[s].append(os_)
            nfa.eps[oe].append(e)
        return s, e
    if isinstance(node, Repeat):
        lo, hi = node.lo, node.hi
        s = e = nfa.new_state()
        for _ in range(lo):
            ps, pe = _build_nfa(node.node, nfa, alphabet, lit_index)
            nfa.eps[e].append(ps)
            e = pe
        if hi is None:
            ps, pe = _build_nfa(node.node, nfa, alphabet, lit_index)
            nfa.eps[e].append(ps)
            nfa.eps[pe].append(ps)
            new_e = nfa.new_state()
            nfa.eps[e].append(new_e)
            nfa.eps[pe].append(new_e)
            return s, new_e
        new_e = nfa.new_state()
        nfa.eps[e].append(new_e)
        for _ in range(hi - lo):
            ps, pe = _build_nfa(node.node, nfa, alphabet, lit_index)
            nfa.eps[e].append(ps)
            e = pe
            nfa.eps[e].append(new_e)
        return s, new_e
    raise TypeError(node)


# --- DFA ----------------------------------------------------------------------

DEAD = -1


@dataclass
class DFA:
    trans: np.ndarray          # int32[S, C]; DEAD = -1
    accept: np.ndarray         # bool[S]
    alphabet: Alphabet
    start: int = 0

    @property
    def num_states(self) -> int:
        return self.trans.shape[0]

    def step_char(self, state: int, ch: str) -> int:
        if state == DEAD:
            return DEAD
        return int(self.trans[state, self.alphabet.classify(ch)])

    def step_string(self, state: int, s: str) -> int:
        for ch in s:
            state = self.step_char(state, ch)
            if state == DEAD:
                return DEAD
        return state

    def matches(self, s: str) -> bool:
        state = self.step_string(self.start, s)
        return state != DEAD and bool(self.accept[state])


_MAX_DFA_STATES = 20_000


def compile_regex(pattern: str) -> DFA:
    ast = _Parser(pattern).parse()
    lits: list[Lit] = []
    _collect_char_sets(ast, lits)
    alphabet = Alphabet(lits)
    lit_index = {id(lit): i for i, lit in enumerate(lits)}
    nfa = _NFA()
    start, end = _build_nfa(ast, nfa, alphabet, lit_index)

    def eclose(states: frozenset) -> frozenset:
        stack, seen = list(states), set(states)
        while stack:
            s = stack.pop()
            for t in nfa.eps[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    C = alphabet.num_classes
    start_set = eclose(frozenset({start}))
    ids: dict[frozenset, int] = {start_set: 0}
    rows: list[list[int]] = []
    accepts: list[bool] = []
    work = [start_set]
    while work:
        cur = work.pop()
        i = ids[cur]
        while len(rows) <= i:
            rows.append([DEAD] * C)
            accepts.append(False)
        accepts[i] = end in cur
        by_class: dict[int, set] = {}
        for s in cur:
            for cls, dst in nfa.edges[s]:
                by_class.setdefault(cls, set()).add(dst)
        for cls, dsts in by_class.items():
            nxt = eclose(frozenset(dsts))
            if nxt not in ids:
                if len(ids) >= _MAX_DFA_STATES:
                    raise RegexParseError(
                        f"DFA exceeds {_MAX_DFA_STATES} states")
                ids[nxt] = len(ids)
                work.append(nxt)
            rows[i][cls] = ids[nxt]
    trans = np.asarray(rows, np.int32).reshape(len(rows), C)
    accept = np.asarray(accepts, bool)

    # Prune states that cannot reach an accept (generating into them would
    # dead-end the constraint).
    S = len(rows)
    can_accept = accept.copy()
    changed = True
    while changed:
        changed = False
        reach = (trans >= 0) & can_accept[np.clip(trans, 0, S - 1)]
        new = can_accept | reach.any(axis=1)
        if (new != can_accept).any():
            can_accept = new
            changed = True
    remap = np.full(S, DEAD, np.int32)
    keep = np.where(can_accept)[0]
    remap[keep] = np.arange(len(keep), dtype=np.int32)
    if remap[0] == DEAD:
        raise RegexParseError("pattern matches nothing")
    new_trans = np.full((len(keep), C), DEAD, np.int32)
    for new_i, old_i in enumerate(keep):
        row = trans[old_i]
        valid = row >= 0
        mapped = np.where(valid, remap[np.clip(row, 0, S - 1)], DEAD)
        new_trans[new_i] = mapped
    return DFA(trans=new_trans, accept=accept[keep], alphabet=alphabet,
               start=int(remap[0]))


# --- vectorized token masks ---------------------------------------------------


class TokenMask:
    """Per-state allowed-token rows for a DFA over a tokenizer vocab."""

    def __init__(self, dfa: DFA, vocab_strings: list[str],
                 eos_token_id: int, vocab_cp=None) -> None:
        self.dfa = dfa
        self.eos_token_id = eos_token_id
        V = len(vocab_strings)
        self.V = V
        if vocab_cp is not None:
            # Vectorized classification over a precomputed codepoint
            # matrix (built once per engine): O(V*max_len) numpy ops per
            # grammar compile instead of a Python loop over every vocab
            # character — the 151k-vocab path.
            cp_mat, too_long, empty = vocab_cp
            cc = dfa.alphabet.char_class
            if cc:
                keys = np.fromiter(sorted(cc), np.int64, len(cc))
                vals = np.asarray([cc[k] for k in keys], np.int32)
                idx = np.clip(np.searchsorted(keys, cp_mat), 0,
                              len(keys) - 1)
                hit = keys[idx] == cp_mat
                mat = np.where(hit, vals[idx], 0).astype(np.int32)
            else:
                mat = np.zeros(cp_mat.shape, np.int32)
            mat[cp_mat < 0] = -1
            self.mat = mat
            self._too_long = dict(too_long)
            self._empty = empty
        else:
            max_len = max((len(s) for s in vocab_strings if s), default=1)
            max_len = min(max_len, 64)
            mat = np.full((V, max_len), -1, np.int32)
            self._too_long = {}
            self._empty = np.zeros(V, bool)
            for t, s in enumerate(vocab_strings):
                if not s:
                    self._empty[t] = True
                    continue
                if len(s) > max_len:
                    self._too_long[t] = s
                    continue
                for j, ch in enumerate(s):
                    mat[t, j] = dfa.alphabet.classify(ch)
            self.mat = mat
        self._rows: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def row(self, state: int) -> tuple[np.ndarray, np.ndarray]:
        """(allowed bool[V], next_state int32[V]) for a DFA state."""
        cached = self._rows.get(state)
        if cached is not None:
            return cached
        trans = self.dfa.trans
        cur = np.full(self.V, state, np.int32)
        for j in range(self.mat.shape[1]):
            cls = self.mat[:, j]
            active = (cls >= 0) & (cur != DEAD)
            stepped = trans[np.clip(cur, 0, None), np.clip(cls, 0, None)]
            cur = np.where(active, stepped, cur)
        allowed = cur != DEAD
        # empty-string tokens never advance the constraint: disallow
        allowed &= ~self._empty
        for t, s in self._too_long.items():
            ns = self.dfa.step_string(state, s)
            allowed[t] = ns != DEAD
            cur[t] = ns
        # EOS is allowed exactly when the current state accepts.
        if 0 <= self.eos_token_id < self.V:
            allowed[self.eos_token_id] = bool(self.dfa.accept[state])
            cur[self.eos_token_id] = state
        result = (allowed, cur.astype(np.int32))
        self._rows[state] = result
        return result
