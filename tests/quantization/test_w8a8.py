"""W8A8 activation quantization (VERDICT round-1 item 5).

Reference: vllm/model_executor/layers/quantization/fp8.py:71-1092 (FP8
W8A8, dynamic per-token activations) and tpu_int8.py:19-117 /
compressed_tensors int8 (INT8 W8A8). Covers: matmul numerics vs dense,
compressed-tensors + fp8 checkpoint detection/ingest, and e2e engine
generation under both methods.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_trianglemix_tpu.quantization.ingest import (
    detect_checkpoint_quantization,
    load_w8a8_linear,
)
from vllm_trianglemix_tpu.quantization.linear import (
    ActQuantLinear,
    apply_linear,
    quantize_fp8_w8a8,
    quantize_int8_w8a8,
    quantize_params,
)


def rel_err(a, b):
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


@pytest.mark.parametrize("quantizer,tol", [
    (quantize_int8_w8a8, 3e-2),
    (quantize_fp8_w8a8, 1.2e-1),
])
def test_w8a8_matmul_matches_dense(quantizer, tol):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 96)).astype(np.float32)
    x = rng.standard_normal((8, 64)).astype(np.float32)
    q = quantizer(jnp.asarray(w))
    assert isinstance(q, ActQuantLinear)
    y = np.asarray(apply_linear(jnp.asarray(x), q))
    assert rel_err(y, x @ w) < tol


def test_int8_w8a8_per_token_scales_beat_per_tensor():
    # A batch with wildly different row magnitudes: per-token activation
    # scaling must keep the small-magnitude row accurate.
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    x = rng.standard_normal((2, 64)).astype(np.float32)
    x[1] *= 1e-3
    y = np.asarray(apply_linear(jnp.asarray(x),
                                quantize_int8_w8a8(jnp.asarray(w))))
    dense = x @ w
    assert rel_err(y[1], dense[1]) < 3e-2


def test_quantize_params_w8a8_tree():
    rng = np.random.default_rng(2)
    params = {
        "embed_tokens": jnp.asarray(rng.standard_normal((32, 16)),
                                    jnp.float32),
        "layers": {
            "q_proj": jnp.asarray(rng.standard_normal((2, 16, 24)),
                                  jnp.float32),
            "input_layernorm": jnp.ones((2, 16), jnp.float32),
        },
        "norm": jnp.ones(16, jnp.float32),
    }
    out = quantize_params(params, "int8_w8a8")
    assert isinstance(out["layers"]["q_proj"], ActQuantLinear)
    assert out["layers"]["q_proj"].qweight.dtype == jnp.int8
    # norms/embeddings untouched
    assert out["layers"]["input_layernorm"].dtype == jnp.float32


def test_detect_compressed_tensors_and_fp8():
    ct = {"quantization_config": {
        "quant_method": "compressed-tensors",
        "config_groups": {"group_0": {
            "weights": {"num_bits": 8, "type": "int", "symmetric": True},
            "input_activations": {"num_bits": 8, "dynamic": True},
        }},
    }}
    assert detect_checkpoint_quantization(ct) == {"method": "int8_w8a8"}
    ctf = {"quantization_config": {
        "quant_method": "compressed-tensors",
        "config_groups": {"group_0": {
            "weights": {"num_bits": 8, "type": "float"},
        }},
    }}
    assert detect_checkpoint_quantization(ctf) == {"method": "fp8_w8a8"}
    fp8 = {"quantization_config": {"quant_method": "fp8",
                                   "activation_scheme": "dynamic"}}
    assert detect_checkpoint_quantization(fp8) == {"method": "fp8_w8a8"}
    assert detect_checkpoint_quantization({}) is None


def test_load_w8a8_linear_layouts():
    rng = np.random.default_rng(3)
    w = rng.integers(-127, 127, size=(24, 16)).astype(np.int8)  # [out, in]
    scale = rng.uniform(0.01, 0.1, size=(24, 1)).astype(np.float32)
    tensors = {"m.weight": w, "m.weight_scale": scale}
    q, s = load_w8a8_linear(tensors.__getitem__, "m")
    assert q.shape == (16, 24) and s.shape == (1, 24)
    np.testing.assert_array_equal(q, w.T)
    # scalar scale broadcast
    tensors2 = {"m.weight": w,
                "m.weight_scale": np.float32(0.05)}
    q2, s2 = load_w8a8_linear(tensors2.__getitem__, "m")
    assert s2.shape == (1, 24) and np.allclose(s2, 0.05)


def _tiny_ct_checkpoint(tmp_path):
    """Build a compressed-tensors INT8 W8A8 Qwen3 checkpoint on disk."""
    from safetensors.numpy import save_file

    cfg = {
        "architectures": ["Qwen3ForCausalLM"],
        "vocab_size": 128,
        "hidden_size": 32,
        "intermediate_size": 64,
        "num_hidden_layers": 2,
        "num_attention_heads": 2,
        "num_key_value_heads": 2,
        "head_dim": 16,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "tie_word_embeddings": True,
        "max_position_embeddings": 256,
        "quantization_config": {
            "quant_method": "compressed-tensors",
            "config_groups": {"group_0": {
                "weights": {"num_bits": 8, "type": "int",
                            "symmetric": True, "strategy": "channel"},
                "input_activations": {"num_bits": 8, "dynamic": True},
            }},
        },
    }
    d = str(tmp_path / "ct_ckpt")
    os.makedirs(d)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)

    rng = np.random.default_rng(7)
    D, I, H = 32, 64, 2 * 16
    tensors = {
        "model.embed_tokens.weight":
            rng.standard_normal((128, 32)).astype(np.float32),
        "model.norm.weight": np.ones(32, np.float32),
    }
    shapes = {
        "self_attn.q_proj": (H, D), "self_attn.k_proj": (H, D),
        "self_attn.v_proj": (H, D), "self_attn.o_proj": (D, H),
        "mlp.gate_proj": (I, D), "mlp.up_proj": (I, D),
        "mlp.down_proj": (D, I),
    }
    for layer in range(2):
        base = f"model.layers.{layer}"
        tensors[f"{base}.input_layernorm.weight"] = np.ones(D, np.float32)
        tensors[f"{base}.post_attention_layernorm.weight"] = \
            np.ones(D, np.float32)
        tensors[f"{base}.self_attn.q_norm.weight"] = np.ones(16, np.float32)
        tensors[f"{base}.self_attn.k_norm.weight"] = np.ones(16, np.float32)
        for name, (dout, din) in shapes.items():
            wq = rng.integers(-127, 127, (dout, din)).astype(np.int8)
            sc = rng.uniform(0.005, 0.02, (dout, 1)).astype(np.float32)
            tensors[f"{base}.{name}.weight"] = wq
            tensors[f"{base}.{name}.weight_scale"] = sc
    save_file(tensors, os.path.join(d, "model.safetensors"))
    return d


def test_e2e_compressed_tensors_checkpoint(tmp_path):
    """Engine loads a compressed-tensors W8A8 checkpoint and generates."""
    d = _tiny_ct_checkpoint(tmp_path)
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    llm = LLM(model=d, dtype="float32", max_model_len=64, block_size=16,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=16,
              skip_tokenizer_init=True)
    runner = llm.llm_engine.engine_core.executor.worker.model_runner
    assert runner.quant_method == "int8_w8a8"
    assert isinstance(runner.params["layers"]["q_proj"], ActQuantLinear)
    out = llm.generate([[5, 9, 17, 3]], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True))
    assert len(out[0].outputs[0].token_ids) == 6


@pytest.mark.parametrize("method", ["int8_w8a8", "fp8_w8a8"])
def test_e2e_quantize_at_load(tiny_model_dir, method):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=64,
              block_size=16, max_num_seqs=2, max_num_batched_tokens=64,
              num_kv_blocks=16, skip_tokenizer_init=True,
              quantization=method)
    out = llm.generate([[5, 9, 17, 3]], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True))
    assert len(out[0].outputs[0].token_ids) == 6
