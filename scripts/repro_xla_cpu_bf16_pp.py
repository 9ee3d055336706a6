#!/usr/bin/env python
"""Upstream-bug repro: XLA:CPU check-fail on the bf16 pp x tp path.

Running the engine with dtype=bfloat16, pipeline_parallel_size=2 and
tensor_parallel_size=2 on a forced-host-platform CPU mesh aborts inside
the XLA:CPU compiler:

    F... hlo_instruction.cc:1585] Invalid binary instruction opcode copy
    *** Check failure stack trace: ***  (SIGABRT, jax 0.9.0)

The same engine path runs fine in float32 on CPU, and in bf16 at pp=1
(any tp) or tp=1 (any pp); a minimal shard_map(ppermute)+auto-tp matmul
does NOT reproduce it — the trigger needs the full pp_forward structure
(scanned layers + donated KV + microbatched ppermute under partial-auto
shard_map). TPU compiles this path through a different backend and is
not affected by this CPU-only check-fail; the multichip dryrun
(__graft_entry__.py) therefore validates pp x tp in float32 on CPU
(structure is dtype-independent) while real-chip runs use bf16.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python scripts/repro_xla_cpu_bf16_pp.py
Expected: SIGABRT with the check-fail above (bug present), or the token
ids printed (fixed upstream — then drop the float32 fallback in
__graft_entry__.py).
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from vllm_trianglemix_tpu.entrypoints.llm import LLM
from vllm_trianglemix_tpu.sampling_params import SamplingParams

cfg = dict(architectures=["Qwen3ForCausalLM"], vocab_size=512,
           hidden_size=64, intermediate_size=128, num_hidden_layers=2,
           num_attention_heads=8, num_key_value_heads=8, head_dim=8,
           rms_norm_eps=1e-6, rope_theta=1e6, tie_word_embeddings=True,
           max_position_embeddings=256)
with tempfile.TemporaryDirectory() as d:
    json.dump(cfg, open(f"{d}/config.json", "w"))
    llm = LLM(model=d, dtype="bfloat16", max_model_len=128, block_size=16,
              max_num_seqs=4, max_num_batched_tokens=128, num_kv_blocks=32,
              skip_tokenizer_init=True, load_format="dummy",
              pipeline_parallel_size=2, tensor_parallel_size=2,
              multiprocess_engine=False)
    outs = llm.generate([[1, 2, 3, 4, 5], [9, 8, 7]],
                        SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True))
    print("bf16 pp2xtp2 OK:", [list(o.outputs[0].token_ids) for o in outs])
