"""PaliGemma (SigLIP tower + Gemma + bidirectional prompt prefix) vs
HuggingFace torch: vision-feature parity, full prefix-LM prefill logits,
and engine-e2e greedy equality."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import (  # noqa: E402
    GemmaConfig as HFGemmaConfig,
    PaliGemmaConfig as HFPaliGemmaConfig,
    PaliGemmaForConditionalGeneration,
    SiglipVisionConfig as HFSiglipVisionConfig,
)

from vllm_trianglemix_tpu.models import paligemma  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402

VISION_KW = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                 num_attention_heads=2, image_size=28, patch_size=14,
                 projection_dim=48)
TEXT_KW = dict(hidden_size=48, intermediate_size=96, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2,
               head_dim=12, vocab_size=512,
               max_position_embeddings=256, rope_theta=10000.0)
IMAGE_TOKEN = 500
TOKENS_PER_IMAGE = 4  # (28/14)^2


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = HFPaliGemmaConfig(
        vision_config=HFSiglipVisionConfig(**VISION_KW),
        text_config=HFGemmaConfig(**TEXT_KW),
        image_token_index=IMAGE_TOKEN,
        projection_dim=VISION_KW["projection_dim"])
    return PaliGemmaForConditionalGeneration(cfg).eval().float()


@pytest.fixture(scope="module")
def our_setup(hf_model):
    cfg = paligemma.PaliGemmaConfig.from_hf_config(
        hf_model.config.to_dict())
    params = paligemma.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf_model.state_dict()),
        dtype=jnp.float32)
    return cfg, params


def test_vision_features_match_hf(hf_model, our_setup):
    cfg, params = our_setup
    assert cfg.text.prefix_lm and cfg.text.gemma_norm
    torch.manual_seed(1)
    px = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        ref = hf_model.get_image_features(px)
    if isinstance(ref, (list, tuple)):
        ref = torch.stack(list(ref))
    # HF pre-divides by sqrt(text hidden) and Gemma re-multiplies after
    # the scatter; our encode_images returns the net (raw projector) rows
    ref = ref.numpy() * TEXT_KW["hidden_size"] ** 0.5
    ours = np.asarray(paligemma.encode_images(params, cfg,
                                              jnp.asarray(px.numpy())))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_prefix_lm_prefill_logits_match_hf(hf_model, our_setup):
    """HF inference masking attends bidirectionally over the WHOLE
    prompt (modeling_paligemma _update_causal_mask); our prefix_lm
    attention predicate must reproduce the logits everywhere."""
    from tests.models.test_llava_vs_hf import _prefill_metadata
    from vllm_trianglemix_tpu.attention.backend import kv_cache_shape
    from vllm_trianglemix_tpu.config import TriangleMixConfig

    cfg, params = our_setup
    torch.manual_seed(2)
    px = torch.randn(1, 3, 28, 28)
    token_ids = [2, 7] + [IMAGE_TOKEN] * TOKENS_PER_IMAGE + [9, 11, 13]
    with torch.no_grad():
        ref = hf_model(input_ids=torch.tensor([token_ids]),
                       pixel_values=px).logits[0].numpy()

    T = len(token_ids)
    bs = 8
    num_blocks = -(-T // bs) + 2
    kv = jnp.zeros((cfg.num_hidden_layers,
                    *kv_cache_shape(num_blocks, bs,
                                    cfg.num_key_value_heads,
                                    cfg.head_dim)), jnp.float32)
    md = _prefill_metadata(T, bs, num_blocks)
    feats = paligemma.encode_images(params, cfg, jnp.asarray(px.numpy()))
    mm_pos = jnp.arange(2, 2 + TOKENS_PER_IMAGE, dtype=jnp.int32)
    hidden, _ = paligemma.forward(
        params, cfg, TriangleMixConfig(),
        jnp.asarray(token_ids, jnp.int32), kv, md,
        jnp.zeros(cfg.num_hidden_layers, bool),
        mm_scatter=(mm_pos, feats.reshape(-1, cfg.hidden_size)))
    ours = np.asarray(paligemma.compute_logits(params, cfg, hidden))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=2e-3)


def test_engine_greedy_matches_hf(hf_model, tmp_path):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.multimodal.processor import preprocess_image
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    d = tmp_path / "tiny_paligemma"
    hf_model.save_pretrained(str(d), safe_serialization=True)
    llm = LLM(str(d), dtype="float32", max_model_len=128, block_size=8,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=32,
              skip_tokenizer_init=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)
    ids = [2, 7, IMAGE_TOKEN, 9, 11]
    out = llm.generate(
        [{"prompt_token_ids": ids, "multi_modal_data": {"image": [img]}}],
        SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True))[0]
    ours = list(out.outputs[0].token_ids)

    px = torch.tensor(preprocess_image(img, 28, crop=False))[None]
    full = [2, 7] + [IMAGE_TOKEN] * TOKENS_PER_IMAGE + [9, 11]
    with torch.no_grad():
        ref = hf_model.generate(input_ids=torch.tensor([full]),
                                pixel_values=px, max_new_tokens=6,
                                do_sample=False)
    assert ours == ref[0, len(full):].tolist()
