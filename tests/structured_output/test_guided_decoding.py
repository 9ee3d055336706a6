"""Guided decoding: schema->regex translation and engine e2e.

The e2e checks reconstruct text by concatenating per-token strings (the
semantics the grammar constrains); whitespace-joining tokenizers like the
WordLevel test tokenizer would re-insert spaces in decode()."""

import json

import pytest

from vllm_trianglemix_tpu.structured_output.json_schema import (
    free_json_regex,
    schema_to_regex,
)
from vllm_trianglemix_tpu.structured_output.regex_engine import compile_regex


@pytest.mark.parametrize("schema,good,bad", [
    ({"type": "integer"}, ["0", "-12", "345"], ["01", "1.5", "x"]),
    ({"type": "number"}, ["1.5", "-2e3", "0.25"], ["--1", "1."]),
    ({"type": "boolean"}, ["true", "false"], ["True", "1"]),
    ({"type": "string"}, ['"hi"', '""'], ['hi', '"']),
    ({"enum": ["a", "b", 3]}, ['"a"', '"b"', "3"], ['"c"', "4"]),
    ({"const": {"k": 1}}, ['{"k": 1}'], ['{"k": 2}']),
    ({"type": "array", "items": {"type": "integer"}},
     ["[]", "[1]", "[1, 2, 3]"], ["[1,]", "[true]"]),
    ({"type": "array", "items": {"type": "boolean"}, "minItems": 1,
      "maxItems": 2},
     ["[true]", "[true, false]"], ["[]", "[true, true, true]"]),
    ({"type": "object",
      "properties": {"a": {"type": "integer"},
                     "b": {"type": "boolean"}},
      "required": ["a", "b"]},
     ['{"a": 1, "b": true}', '{ "a" : -2 , "b" : false }'],
     ['{"b": true, "a": 1}', '{"a": 1}', "{}"]),
    ({"type": "object",
      "properties": {"a": {"type": "integer"},
                     "b": {"type": "boolean"}},
      "required": ["a"]},
     ['{"a": 1}', '{"a": 1, "b": true}'], ['{"b": true}']),
    ({"anyOf": [{"type": "integer"}, {"type": "boolean"}]},
     ["5", "true"], ['"x"']),
])
def test_schema_to_regex(schema, good, bad):
    dfa = compile_regex(schema_to_regex(schema))
    for s in good:
        assert dfa.matches(s), (schema, s)
    for s in bad:
        assert not dfa.matches(s), (schema, s)


def test_free_json_regex_accepts_nested():
    dfa = compile_regex(free_json_regex(depth=3))
    for s in ["1", '"x"', "[1, 2]", '{"a": [true, null]}',
              '{"a": {"b": {"c": 1}}}']:
        assert dfa.matches(s), s
    for s in ["{", "[1,]", "tru"]:
        assert not dfa.matches(s), s


# --- engine e2e ---------------------------------------------------------------

def make_llm(tiny_model_dir, **kw):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    return LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48,
               **kw)


@pytest.fixture(scope="module")
def llm(tiny_model_dir):
    return make_llm(tiny_model_dir)


def concat_text(llm, token_ids):
    tok = llm.llm_engine.tokenizer
    return "".join(tok.decode([t], skip_special_tokens=True)
                   for t in token_ids)


def test_guided_choice(llm):
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    out = llm.generate([[5, 6, 7]],
                       SamplingParams(max_tokens=8, temperature=0.0,
                                      guided_choice=["yes", "no"]))[0]
    text = concat_text(llm, out.outputs[0].token_ids)
    assert text in ("yes", "no")
    assert out.outputs[0].finish_reason == "stop"  # EOS forced by grammar


def test_guided_regex(llm):
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    out = llm.generate([[9, 9, 9]],
                       SamplingParams(max_tokens=10, temperature=0.0,
                                      guided_regex=r"-?[0-9]{2,4}"))[0]
    import re

    text = concat_text(llm, out.outputs[0].token_ids)
    assert re.fullmatch(r"-?[0-9]{2,4}", text), text


def test_guided_json_schema(llm):
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    # finite language => the grammar forces EOS after the closing brace
    # (random weights would otherwise pad unbounded integers to the cap)
    schema = {"type": "object",
              "properties": {"name": {"enum": ["a", "b"]},
                             "n": {"enum": [1, 2, 3]}},
              "required": ["name", "n"]}
    out = llm.generate([[4, 5, 6]],
                       SamplingParams(max_tokens=30, temperature=0.8,
                                      seed=3, guided_json=schema))[0]
    text = concat_text(llm, out.outputs[0].token_ids)
    data = json.loads(text)
    assert data["name"] in ("a", "b")
    assert isinstance(data["n"], int)


def test_guided_and_unconstrained_mixed_batch(llm):
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    params = [
        SamplingParams(max_tokens=6, temperature=0.0,
                       guided_choice=["hello", "world"]),
        SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True),
    ]
    outs = llm.generate([[3, 4], [5, 6]], params)
    text0 = concat_text(llm, outs[0].outputs[0].token_ids)
    assert text0 in ("hello", "world")
    assert len(outs[1].outputs[0].token_ids) == 6


def test_multi_step_disabled_for_guided(tiny_model_dir):
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    llm = make_llm(tiny_model_dir, multi_step_decode=4)
    out = llm.generate([[7, 8]],
                       SamplingParams(max_tokens=8, temperature=0.0,
                                      guided_choice=["yes", "no"]))[0]
    text = concat_text(llm, out.outputs[0].token_ids)
    assert text in ("yes", "no")
