"""Regex engine: DFA match semantics vs Python re, token-mask soundness."""

import re

import numpy as np
import pytest

from vllm_trianglemix_tpu.structured_output.regex_engine import (
    DEAD,
    TokenMask,
    compile_regex,
)

CASES = [
    (r"abc", ["abc"], ["ab", "abcd", "abd", ""]),
    (r"a*", ["", "a", "aaaa"], ["b", "ab"]),
    (r"a+b?", ["a", "ab", "aaab"], ["b", "", "abb"]),
    (r"(ab|cd)+", ["ab", "cdab", "ababcd"], ["a", "abc", ""]),
    (r"[0-9]{2,4}", ["12", "1234"], ["1", "12345", "ab"]),
    (r"-?(0|[1-9][0-9]*)", ["0", "-7", "123"], ["00", "-", "01"]),
    (r"[a-c]x[^y]z", ["axbz", "cx_z"], ["axyz", "dxbz"]),
    (r"\d+\.\d+", ["3.14", "10.0"], ["3.", ".5", "3"]),
    (r"a.c", ["abc", "azc", "a.c"], ["ac", "abbc"]),
    (r"(yes|no)", ["yes", "no"], ["maybe", "y", ""]),
    (r'"([^"\\]|\\.)*"', ['""', '"hi"', '"a\\"b"'], ['"', '"a', 'hi']),
    (r"a{3}", ["aaa"], ["aa", "aaaa"]),
    (r"(a|b){1,2}c", ["ac", "abc", "bbc"], ["c", "aaac"]),
]


@pytest.mark.parametrize("pattern,good,bad", CASES)
def test_match_semantics(pattern, good, bad):
    dfa = compile_regex(pattern)
    for s in good:
        assert dfa.matches(s), (pattern, s)
        assert re.fullmatch(pattern, s), ("case is wrong", pattern, s)
    for s in bad:
        assert not dfa.matches(s), (pattern, s)
        assert not re.fullmatch(pattern, s), ("case is wrong", pattern, s)


def test_dead_state_pruning():
    # after 'x' the only continuation is 'y': states that can't reach an
    # accept must be DEAD so generation can't dead-end.
    dfa = compile_regex(r"xy")
    s = dfa.step_string(dfa.start, "x")
    assert s != DEAD
    assert dfa.step_char(s, "z") == DEAD


def brute_force_allowed(dfa, vocab, state):
    out = []
    for s in vocab:
        ns = dfa.step_string(state, s) if s else DEAD
        out.append(ns != DEAD)
    return np.asarray(out)


def test_token_mask_matches_brute_force():
    vocab = ["a", "b", "ab", "ba", "abc", "c", "", "aa", "bc", "x",
             "abcabc", "<eos>"]
    eos_id = len(vocab) - 1
    dfa = compile_regex(r"(abc)+")
    tm = TokenMask(dfa, vocab, eos_id)
    state = dfa.start
    allowed, nxt = tm.row(state)
    expected = brute_force_allowed(dfa, vocab, state)
    expected[eos_id] = bool(dfa.accept[state])  # EOS rule
    np.testing.assert_array_equal(allowed, expected)
    # walk "a" then verify next-state consistency
    a_id = vocab.index("a")
    assert nxt[a_id] == dfa.step_string(dfa.start, "a")
    allowed2, _ = tm.row(int(nxt[a_id]))
    expected2 = brute_force_allowed(dfa, vocab, int(nxt[a_id]))
    expected2[eos_id] = False  # mid-pattern: can't stop
    np.testing.assert_array_equal(allowed2, expected2)


def test_eos_only_when_accepting():
    vocab = ["a", "b", "<eos>"]
    dfa = compile_regex(r"ab")
    tm = TokenMask(dfa, vocab, 2)
    allowed0, nxt0 = tm.row(dfa.start)
    assert allowed0[0] and not allowed0[1] and not allowed0[2]
    s1 = int(nxt0[0])
    allowed1, nxt1 = tm.row(s1)
    assert allowed1[1] and not allowed1[0] and not allowed1[2]
    s2 = int(nxt1[1])
    allowed2, _ = tm.row(s2)
    assert allowed2[2] and not allowed2[0] and not allowed2[1]


def test_unicode_other_class():
    dfa = compile_regex(r"[^x]+")
    assert dfa.matches("héllo→")
    assert not dfa.matches("ax")
