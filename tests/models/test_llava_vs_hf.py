"""Numerics parity: our JAX LLaVA (CLIP tower + projector + decoder) vs
HuggingFace torch (fp32), random tiny weights.

Reference analogue: vllm tests/models/multimodal generation tests
(HfRunner-vs-VllmRunner); no trained checkpoints in this airgapped env.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import (  # noqa: E402
    CLIPVisionConfig,
    LlamaConfig,
    LlavaConfig as HFLlavaConfig,
    LlavaForConditionalGeneration,
)

from vllm_trianglemix_tpu.attention.backend import kv_cache_shape  # noqa: E402
from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata  # noqa: E402
from vllm_trianglemix_tpu.config import TriangleMixConfig  # noqa: E402
from vllm_trianglemix_tpu.models import llava  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402

VISION_KW = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                 num_attention_heads=2, image_size=28, patch_size=14,
                 projection_dim=16)
TEXT_KW = dict(hidden_size=48, intermediate_size=96, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
               max_position_embeddings=256, rope_theta=10000.0)
IMAGE_TOKEN = 500
TOKENS_PER_IMAGE = 4  # (28/14)^2


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = HFLlavaConfig(vision_config=CLIPVisionConfig(**VISION_KW),
                        text_config=LlamaConfig(**TEXT_KW),
                        image_token_index=IMAGE_TOKEN)
    return LlavaForConditionalGeneration(cfg).eval().float()


@pytest.fixture(scope="module")
def our_setup(hf_model):
    cfg = llava.LlavaConfig.from_hf_config(hf_model.config.to_dict())
    params = llava.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf_model.state_dict()),
        dtype=jnp.float32)
    return cfg, params


def test_vision_features_match_hf(hf_model, our_setup):
    cfg, params = our_setup
    torch.manual_seed(1)
    px = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        ref = hf_model.get_image_features(px)
    if isinstance(ref, (list, tuple)):
        ref = torch.stack(list(ref))
    ref = ref.numpy().reshape(2, TOKENS_PER_IMAGE, TEXT_KW["hidden_size"])
    ours = np.asarray(llava.encode_images(params, cfg,
                                          jnp.asarray(px.numpy())))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def _prefill_metadata(T, block_size, num_blocks):
    positions = np.arange(T, dtype=np.int32)
    bt = np.zeros((1, num_blocks - 1), np.int32)
    needed = -(-T // block_size)
    bt[0, :needed] = np.arange(1, needed + 1)
    slots = bt[0, positions // block_size] * block_size \
        + positions % block_size
    return AttentionMetadata(
        positions=jnp.asarray(positions),
        req_idx=jnp.zeros(T, jnp.int32),
        slot_mapping=jnp.asarray(slots),
        block_tables=jnp.asarray(bt),
        seq_lens=jnp.asarray([T], jnp.int32),
        prompt_lens=jnp.asarray([T], jnp.int32),
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        logits_indices=jnp.asarray([T - 1], jnp.int32),
        num_reqs=jnp.asarray(1, jnp.int32),
    )


def test_prefill_logits_match_hf(hf_model, our_setup):
    """Full multimodal prefill: image embeddings scattered over the
    placeholder span must reproduce HF logits on every position."""
    cfg, params = our_setup
    torch.manual_seed(2)
    px = torch.randn(1, 3, 28, 28)
    token_ids = [1, 7] + [IMAGE_TOKEN] * TOKENS_PER_IMAGE + [9, 11, 13]
    with torch.no_grad():
        ref = hf_model(input_ids=torch.tensor([token_ids]),
                       pixel_values=px).logits[0].numpy()

    T = len(token_ids)
    bs = 8
    num_blocks = -(-T // bs) + 2
    kv = jnp.zeros((cfg.num_hidden_layers,
                    *kv_cache_shape(num_blocks, bs, cfg.num_key_value_heads,
                                    cfg.head_dim)), jnp.float32)
    md = _prefill_metadata(T, bs, num_blocks)
    feats = llava.encode_images(params, cfg, jnp.asarray(px.numpy()))
    mm_pos = jnp.arange(2, 2 + TOKENS_PER_IMAGE, dtype=jnp.int32)
    hidden, _ = llava.forward(
        params, cfg, TriangleMixConfig(),
        jnp.asarray(token_ids, jnp.int32), kv, md,
        jnp.zeros(cfg.num_hidden_layers, bool),
        mm_scatter=(mm_pos, feats.reshape(-1, cfg.hidden_size)))
    ours = np.asarray(llava.compute_logits(params, cfg, hidden))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=2e-3)


def test_old_style_checkpoint_keys(hf_model, our_setup):
    """Pre-4.52 key layout (language_model.model.*, vision_tower.*) loads
    to the same parameters."""
    cfg, params_new = our_setup
    sd = hf_model.state_dict()
    renamed = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            nk = "language_model.model." + k[len("model.language_model."):]
        elif k == "lm_head.weight":
            nk = "language_model.lm_head.weight"
        elif k.startswith("model."):
            nk = k[len("model."):]
        else:
            nk = k
        renamed[nk] = v
    params_old = llava.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(renamed), dtype=jnp.float32)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(params_new),
                    jax.tree_util.tree_leaves(params_old)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
