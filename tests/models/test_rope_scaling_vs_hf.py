"""RoPE scaling variants (llama3 / yarn / dynamic-NTK / linear) vs HF.

Reference: vllm/model_executor/layers/rotary_embedding/ (llama3_rope.py,
yarn_scaling_rope.py, dynamic_ntk_scaling_rope.py, linear_scaling_rope.py).
Without these, scaled checkpoints (e.g. Llama-3.1) are silently numerically
wrong (VERDICT round-1 item #4). Numerics follow HF transformers
modeling_rope_utils.py, so a seeded random HF model with `rope_scaling`
set is the ground truth — same HfRunner-vs-VllmRunner strategy as the
other parity suites.

original_max_position_embeddings is set BELOW the prompt length so the
scaling path is actually exercised (positions past the original window).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig as HFLlamaConfig  # noqa: E402
from transformers import LlamaForCausalLM  # noqa: E402

from vllm_trianglemix_tpu.models import llama  # noqa: E402
from vllm_trianglemix_tpu.models.decoder import RopeScalingConfig  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402
from tests.models.test_model_families_vs_hf import COMMON, run_prefill  # noqa: E402

PROMPT_LEN = 48  # > original_max_position_embeddings=32: scaling is live

SCALINGS = {
    "llama3": dict(rope_type="llama3", factor=8.0, low_freq_factor=1.0,
                   high_freq_factor=4.0,
                   original_max_position_embeddings=32),
    "yarn": dict(rope_type="yarn", factor=4.0,
                 original_max_position_embeddings=32),
    "yarn_attn_factor": dict(rope_type="yarn", factor=4.0,
                             attention_factor=1.3,
                             original_max_position_embeddings=32),
    "dynamic": dict(rope_type="dynamic", factor=4.0),
    "linear": dict(rope_type="linear", factor=4.0),
}


@pytest.mark.parametrize("name", sorted(SCALINGS))
def test_rope_scaled_prefill_matches_hf(name):
    rs = SCALINGS[name]
    # Dynamic NTK's reference length is config.max_position_embeddings
    # itself (HF semantics); set it BELOW the prompt so HF's on-demand
    # growth kicks in, and mirror it with eval_len on our side (the
    # model runner sets eval_len = max_model_len in the engine).
    mpe = 32 if name == "dynamic" else PROMPT_LEN
    hf_kw = dict(COMMON, rope_theta=10_000.0, tie_word_embeddings=False,
                 attention_bias=False, rope_scaling=dict(rs),
                 max_position_embeddings=mpe)
    torch.manual_seed(7)
    hf = LlamaForCausalLM(HFLlamaConfig(**hf_kw)).eval().float()

    cfg = llama.LlamaConfig.from_hf_config(hf_kw)
    assert cfg.rope_scaling is not None
    assert cfg.rope_scaling.rope_type == rs["rope_type"]
    if name == "dynamic":
        from dataclasses import replace
        cfg = replace(cfg, rope_scaling=replace(cfg.rope_scaling,
                                                eval_len=PROMPT_LEN))
    params = llama.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)

    rng = np.random.default_rng(7)
    token_ids = rng.integers(0, hf_kw["vocab_size"],
                             size=PROMPT_LEN).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours = run_prefill(llama, cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=2e-3)


def test_default_and_mrope_configs_are_noops():
    assert RopeScalingConfig.from_hf(None) is None
    assert RopeScalingConfig.from_hf({}) is None
    assert RopeScalingConfig.from_hf({"rope_type": "default"}) is None
    # mrope (multimodal sections) falls back to base RoPE for text tokens
    assert RopeScalingConfig.from_hf({"rope_type": "mrope"}) is None


def test_unknown_type_raises():
    from vllm_trianglemix_tpu.layers.common import scaled_inv_freq

    with pytest.raises(ValueError):
        scaled_inv_freq(64, 1e4, RopeScalingConfig(rope_type="bogus"),
                        128)
