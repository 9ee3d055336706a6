"""Gemma-2 numerics parity vs HuggingFace + hybrid KV-group engine run.

Pins: gemma RMSNorm (1+w, fp32), sqrt(D) embedding scale, sandwich
norms, GeGLU, query_pre_attn_scalar scaling, attention + final logit
soft-capping, and the alternating sliding/full layer windows (HF
masking_utils sliding semantics: q - k < window).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import Gemma2Config as HFGemma2Config  # noqa: E402
from transformers import Gemma2ForCausalLM  # noqa: E402

from vllm_trianglemix_tpu.config import TriangleMixConfig  # noqa: E402
from vllm_trianglemix_tpu.models import gemma2  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402
from tests.models.test_qwen3_vs_hf import single_seq_metadata  # noqa: E402

BASE = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    sliding_window=8,
    query_pre_attn_scalar=16.0,
    attn_logit_softcapping=50.0,
    final_logit_softcapping=30.0,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=256,
    tie_word_embeddings=True,
)


def build(seed=0):
    torch.manual_seed(seed)
    hf = Gemma2ForCausalLM(HFGemma2Config(
        **BASE, attn_implementation="eager")).eval().float()
    cfg = gemma2.Gemma2Config.from_hf_config(BASE)
    assert cfg.period == 2
    assert cfg.group_order == ["sliding_attention", "full_attention"]
    params = gemma2.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    return hf, cfg, params


def test_gemma2_prefill_matches_hf():
    hf, cfg, params = build()
    rng = np.random.default_rng(0)
    # 33 tokens > sliding_window=8: windows actually bite
    token_ids = rng.integers(3, BASE["vocab_size"], size=33).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()

    block_size = 8
    num_blocks = 8
    kv = jnp.zeros((cfg.num_hidden_layers,
                    num_blocks, block_size, 2 * cfg.num_key_value_heads,
                    cfg.head_dim), jnp.float32)
    md = single_seq_metadata(len(token_ids), block_size, num_blocks)
    tri = jnp.zeros(cfg.num_hidden_layers, bool)
    hidden, kv = gemma2.forward(params, cfg, TriangleMixConfig(),
                                jnp.asarray(token_ids, jnp.int32), kv, md,
                                tri)
    ours = np.asarray(gemma2.compute_logits(params, cfg, hidden))
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-3)


def test_gemma2_engine_e2e_hybrid_groups(tmp_path):
    """Full engine path with TWO KV-cache groups (per-group block tables,
    sliding group reclaiming blocks) vs HF greedy generate past the
    window."""
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    hf, cfg, _ = build(seed=1)
    d = tmp_path / "g2"
    d.mkdir()
    hf_cfg = json.loads(hf.config.to_json_string())
    hf_cfg["architectures"] = ["Gemma2ForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(hf_cfg, f)
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"},
              str(d / "model.safetensors"))

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              block_size=8, max_num_seqs=2, max_num_batched_tokens=64,
              num_kv_blocks=64, skip_tokenizer_init=True)
    core = llm.llm_engine.engine_core
    mgr = core.scheduler.kv_cache_manager
    assert mgr.n_groups == 2

    rng = np.random.default_rng(1)
    prompts = [rng.integers(3, BASE["vocab_size"], size=n).tolist()
               for n in (21, 40)]  # both beyond the 8-token window
    params = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = [o.outputs[0].token_ids for o in llm.generate(prompts, params)]

    hf.generation_config.eos_token_id = None
    for prompt, got in zip(prompts, outs):
        with torch.no_grad():
            ref = hf.generate(torch.tensor([prompt]), do_sample=False,
                              max_new_tokens=10)[0, len(prompt):].tolist()
        assert got == ref


def test_hybrid_sliding_group_reclaims_blocks():
    """The sliding group frees out-of-window blocks into the SHARED pool
    while the full group keeps the whole context (coordinator role,
    reference single_type_kv_cache_manager.py:304 + kv_cache_coordinator)."""
    from vllm_trianglemix_tpu.core.kv_cache_interface import KVCacheConfig
    from vllm_trianglemix_tpu.core.kv_cache_manager import KVCacheManager
    from vllm_trianglemix_tpu.request import Request
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    cfg = gemma2.Gemma2Config(**dict(BASE, vocab_size=256))
    groups = tuple(gemma2.kv_cache_group_specs(cfg, block_size=4))
    kv_config = KVCacheConfig(num_blocks=64, kv_cache_groups=groups)
    mgr = KVCacheManager(kv_config, max_model_len=128)
    assert not mgr.enable_caching  # hybrid: prefix caching off

    req = Request(request_id="r", prompt_token_ids=list(range(40)),
                  sampling_params=SamplingParams(max_tokens=4),
                  eos_token_id=None)
    blocks = mgr.allocate_slots(req, 40)
    ids = blocks.get_block_ids()
    assert len(ids) == 2  # per-group lists
    assert len(ids[0]) == len(ids[1]) == 10  # 40 tokens / 4-token blocks

    # advance: all 40 computed; window=8 keeps only the last ~3 blocks
    req.num_computed_tokens = 40
    free_before = mgr.get_num_free_blocks()
    mgr.allocate_slots(req, 1)
    sliding_ids, full_ids = (
        mgr.get_block_ids("r")[0], mgr.get_block_ids("r")[1])
    # group 0 = sliding: leading out-of-window entries become the null
    # block; group 1 = full attention keeps real blocks
    assert sliding_ids[0] == 0 and 0 not in full_ids[:10]
    assert mgr.get_num_free_blocks() > free_before - 3  # blocks came back
    mgr.free(req)
