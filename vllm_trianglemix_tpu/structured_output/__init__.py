"""Structured (guided) decoding.

Role of the reference's vllm/v1/structured_output/ (manager + grammar
backends + per-step vocab bitmask). The environment has no xgrammar/
outlines/guidance, so the grammar machinery is built from scratch:

- ``regex_engine``   — regex -> NFA -> DFA with vectorized (numpy) token
  transition rows: one O(V x maxlen) table walk per *novel* DFA state,
  cached, instead of per-token Python loops.
- ``json_schema``    — JSON-Schema / free-JSON -> regex translation
  (depth-limited recursion), feeding the same DFA engine.
- ``StructuredOutputManager`` — per-request grammar state + per-step
  allowed-token bitmask assembly for the sampler.
"""

from vllm_trianglemix_tpu.structured_output.manager import (  # noqa: F401
    StructuredOutputManager,
    StructuredOutputRequest,
)
