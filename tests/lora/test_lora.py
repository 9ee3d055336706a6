"""Multi-LoRA: loader layout, math vs merged weights, engine selection,
prefix-cache isolation."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp


def write_adapter(path, num_layers, hidden, heads, head_dim, rank=4,
                  alpha=8, modules=("q_proj", "v_proj"), seed=0,
                  intermediate=128, kv_heads=None):
    """Create an HF/peft-format adapter directory with random weights."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(seed)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({"r": rank, "lora_alpha": alpha,
                   "target_modules": list(modules),
                   "peft_type": "LORA"}, f)
    qkv = heads * head_dim
    kv = (kv_heads if kv_heads is not None else heads) * head_dim
    shapes = {"q_proj": (hidden, qkv), "k_proj": (hidden, kv),
              "v_proj": (hidden, kv), "o_proj": (qkv, hidden),
              "gate_proj": (hidden, intermediate),
              "up_proj": (hidden, intermediate),
              "down_proj": (intermediate, hidden)}
    tensors = {}
    raw = {}
    for li in range(num_layers):
        for m in modules:
            din, dout = shapes[m]
            a = (rng.standard_normal((rank, din)) * 0.05).astype(np.float32)
            b = (rng.standard_normal((dout, rank)) * 0.05).astype(np.float32)
            base = f"base_model.model.model.layers.{li}.self_attn.{m}" \
                if m in ("q_proj", "k_proj", "v_proj", "o_proj") \
                else f"base_model.model.model.layers.{li}.mlp.{m}"
            tensors[f"{base}.lora_A.weight"] = a
            tensors[f"{base}.lora_B.weight"] = b
            raw[(li, m)] = (a, b)
    save_file(tensors, os.path.join(path, "adapter_model.safetensors"))
    return raw, alpha / rank


@pytest.fixture(scope="module")
def tiny_dims():
    return dict(num_layers=2, hidden=64, heads=4, head_dim=16)


def test_loader_layout(tmp_path, tiny_dims):
    from vllm_trianglemix_tpu.lora.loader import load_lora_stacks

    raw, scaling = write_adapter(tmp_path / "ad1", **tiny_dims)
    d = tiny_dims
    shapes = {"q_proj": (64, 64), "v_proj": (64, 64)}
    stacks, slot_map, max_rank = load_lora_stacks(
        {"ad1": str(tmp_path / "ad1")}, d["num_layers"], shapes,
        dtype=jnp.float32)
    assert slot_map == {"ad1": 1}
    assert max_rank == 4
    A, B = stacks["q_proj"]
    assert A.shape == (2, 2, 64, 4) and B.shape == (2, 2, 4, 64)
    # slot 0 must be zero
    assert np.abs(np.asarray(A[:, 0])).max() == 0
    a0, b0 = raw[(0, "q_proj")]
    np.testing.assert_allclose(np.asarray(A[0, 1]), a0.T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(B[0, 1]), b0.T * scaling,
                               rtol=1e-6)


def test_forward_matches_merged_weights(tmp_path, tiny_dims):
    """LoRA-applied forward == forward with W + scaling*(B@A) merged."""
    from vllm_trianglemix_tpu.attention.backend import kv_cache_shape
    from vllm_trianglemix_tpu.config import TriangleMixConfig
    from vllm_trianglemix_tpu.lora.loader import load_lora_stacks
    from vllm_trianglemix_tpu.models import qwen3
    from tests.models.test_qwen3_vs_hf import single_seq_metadata

    d = tiny_dims
    raw, scaling = write_adapter(tmp_path / "ad2", **d,
                                 modules=("q_proj", "v_proj", "down_proj"),
                                 seed=3)
    cfg = qwen3.Qwen3Config(vocab_size=256, hidden_size=64,
                            intermediate_size=128, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4,
                            head_dim=16)
    params = qwen3.init_random(cfg, seed=0, dtype=jnp.float32)
    shapes = {"q_proj": (64, 64), "v_proj": (64, 64),
              "down_proj": (128, 64)}
    stacks, slot_map, _ = load_lora_stacks({"ad2": str(tmp_path / "ad2")},
                                           2, shapes, dtype=jnp.float32)

    token_ids = np.arange(24) % 256
    block_size, num_blocks = 8, 6
    md = single_seq_metadata(24, block_size, num_blocks)

    def run(p, lora):
        kv = jnp.zeros((2, *kv_cache_shape(num_blocks, block_size, 4, 16)),
                       jnp.float32)
        h, _ = qwen3.forward(p, cfg, TriangleMixConfig(),
                             jnp.asarray(token_ids, jnp.int32), kv, md,
                             jnp.zeros(2, bool), lora=lora)
        return np.asarray(qwen3.compute_logits(p, cfg, h))

    lora = {"stacks": stacks,
            "idx": jnp.full(24, slot_map["ad2"], jnp.int32)}
    with_lora = run(params, lora)

    merged = {k: v for k, v in params.items()}
    merged["layers"] = dict(params["layers"])
    for m in ("q_proj", "v_proj", "down_proj"):
        w = np.asarray(params["layers"][m])  # [L, Din, Dout]
        for li in range(2):
            a, b = raw[(li, m)]
            w = w.at[li].add(scaling * (b @ a).T) if hasattr(w, "at") else w
        w2 = np.array(np.asarray(params["layers"][m]))
        for li in range(2):
            a, b = raw[(li, m)]
            w2[li] += scaling * (b @ a).T
        merged["layers"][m] = jnp.asarray(w2)
    merged_out = run(merged, None)
    np.testing.assert_allclose(with_lora, merged_out, atol=2e-4, rtol=2e-3)

    # slot 0 (no adapter) must equal the base model exactly
    base_out = run(params, None)
    lora0 = {"stacks": stacks, "idx": jnp.zeros(24, jnp.int32)}
    np.testing.assert_allclose(run(params, lora0), base_out,
                               atol=1e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def lora_llm(tiny_model_dir, tmp_path_factory):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    d = tmp_path_factory.mktemp("adapters")
    write_adapter(d / "a1", num_layers=2, hidden=64, heads=4, head_dim=16,
                  seed=7, modules=("q_proj", "v_proj"), kv_heads=2)
    write_adapter(d / "a2", num_layers=2, hidden=64, heads=4, head_dim=16,
                  seed=8, modules=("q_proj", "v_proj"), kv_heads=2)
    return LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48,
               lora_modules={"a1": str(d / "a1"), "a2": str(d / "a2")})


def test_engine_adapter_selection(lora_llm):
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    p = [[5, 6, 7, 8]] * 3
    params = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    outs = lora_llm.generate(p, params, lora_request=[None, "a1", "a2"])
    toks = [o.outputs[0].token_ids for o in outs]
    # different adapters should (with overwhelming probability on random
    # weights) produce different continuations
    assert toks[0] != toks[1] or toks[0] != toks[2]


def test_unknown_adapter_treated_as_base(lora_llm):
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    p = [[9, 10, 11]]
    params = SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
    a = lora_llm.generate(p, params, lora_request=None)[0]
    b = lora_llm.generate(p, params, lora_request="nope")[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_prefix_cache_isolated_per_adapter(lora_llm):
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    pool = lora_llm.llm_engine.engine_core.scheduler \
        .kv_cache_manager.block_pool
    prompt = list(range(30, 70))
    params = SamplingParams(max_tokens=2, temperature=0.0, ignore_eos=True)
    lora_llm.generate([prompt], params, lora_request="a1")
    hits_before = pool.hit_queries
    # same prompt, different adapter: must NOT hit a1's cached blocks
    lora_llm.generate([prompt], params, lora_request="a2")
    assert pool.hit_queries == hits_before
    # same prompt, same adapter: must hit
    lora_llm.generate([prompt], params, lora_request="a2")
    assert pool.hit_queries > hits_before
