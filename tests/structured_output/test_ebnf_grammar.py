"""EBNF guided_grammar (VERDICT r3 missing #4): compiler units + engine e2e.

Reference: guided_grammar accepts Lark-style EBNF via xgrammar
(vllm/v1/structured_output/backend_xgrammar.py); here it compiles to the
DFA token mask with bounded recursion unrolling
(structured_output/ebnf.py).
"""

import re

import pytest

from vllm_trianglemix_tpu.structured_output.ebnf import (
    GrammarError,
    grammar_to_regex,
)
from vllm_trianglemix_tpu.structured_output.regex_engine import compile_regex

ARITH = """
// an arithmetic expression grammar (recursive via parentheses)
root: expr
expr: term (("+" | "-") term)*
term: /[0-9]+/ | "(" expr ")"
"""

JSON_G = """
root ::= obj
obj ::= "{" pair ("," pair)* "}" | "{}"
pair ::= str ":" val
str ::= /"[a-z]+"/
val ::= /[0-9]+/ | obj | str
"""


@pytest.mark.parametrize("grammar,good,bad", [
    (ARITH,
     ["7", "12+34", "(1+2)-3", "((4))", "1+2+3-4"],
     ["", "1+", "+1", "maybe", "()", "(1+2"]),
    (JSON_G,
     ['{}', '{"a":1}', '{"a":{"b":2}}', '{"a":"x","b":3}'],
     ['{', '{"a"}', '{"a":}', '{a:1}']),
    ('start: "a"+ [ "-" /[0-9]/ ]',
     ["a", "aaa", "aa-7"],
     ["", "-7", "a-", "b"]),
    ('root: [a-c]+ "!"', ["ab!", "c!"], ["d!", "!", "ab"]),
])
def test_grammar_dfa_semantics(grammar, good, bad):
    dfa = compile_regex(grammar_to_regex(grammar))
    for s in good:
        assert dfa.matches(s), s
    for s in bad:
        assert not dfa.matches(s), s


def test_matches_stdlib_re():
    rx = grammar_to_regex(ARITH)
    pat = re.compile("(?:" + rx + r")\Z")
    assert pat.match("(1+2)-3")
    assert not pat.match("1+")


def test_depth_prunes_recursion():
    # depth bounds parenthesis nesting, base cases survive
    rx = grammar_to_regex(ARITH, depth=2)
    dfa = compile_regex(rx)
    assert dfa.matches("(1)+2")
    assert not dfa.matches("((((((1))))))")


def test_errors():
    with pytest.raises(GrammarError):
        grammar_to_regex("root: undefined_rule")
    with pytest.raises(GrammarError):
        grammar_to_regex("root: root")  # no base case at any depth
    with pytest.raises(GrammarError):
        grammar_to_regex("%import common.NUMBER\nroot: NUMBER")
    with pytest.raises(GrammarError):
        grammar_to_regex("")


# --- engine e2e ---------------------------------------------------------------

def test_guided_grammar_e2e(tiny_model_dir):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48)
    tok = llm.llm_engine.tokenizer

    grammar = """
root: "yes" | "no" | num
num: /[0-9]/ /[0-9]/?
"""
    out = llm.generate([[5, 6, 7]],
                       SamplingParams(max_tokens=8, temperature=0.0,
                                      guided_grammar=grammar))[0]
    text = "".join(tok.decode([t], skip_special_tokens=True)
                   for t in out.outputs[0].token_ids)
    assert text in {"yes", "no"} or re.fullmatch(r"[0-9]{1,2}", text), text
    assert out.outputs[0].finish_reason == "stop"

    # the arithmetic grammar from the VERDICT ask, with sampling
    out = llm.generate([[9, 8, 7]],
                       SamplingParams(max_tokens=20, temperature=0.9,
                                      seed=7, guided_grammar=ARITH))[0]
    text = "".join(tok.decode([t], skip_special_tokens=True)
                   for t in out.outputs[0].token_ids)
    pat = re.compile("(?:" + grammar_to_regex(ARITH) + r")\Z")
    assert pat.match(text), text
