"""Multimodal engine e2e: LLaVA through the full scheduler/runner stack.

Covers the reference's multimodal semantics (vllm/v1 encoder scheduling +
EncoderCacheManager + MM-aware prefix caching):
- greedy engine output == HF generate with the same pixels;
- identical images share prefix-cache blocks; different images with
  identical token ids must NOT (content-hash extra keys);
- chunked prefill across an image's placeholder span;
- encoder budget smaller than the batch's image load still finishes
  (chunks truncate at image boundaries and retry).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import (  # noqa: E402
    CLIPVisionConfig,
    LlamaConfig,
    LlavaConfig as HFLlavaConfig,
    LlavaForConditionalGeneration,
)

from vllm_trianglemix_tpu.multimodal.processor import (  # noqa: E402
    preprocess_image,
)
from vllm_trianglemix_tpu.sampling_params import SamplingParams  # noqa: E402

IMAGE_TOKEN = 500
TOKENS_PER_IMAGE = 4


@pytest.fixture(scope="module")
def llava_dir(tmp_path_factory):
    torch.manual_seed(0)
    cfg = HFLlavaConfig(
        vision_config=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=2, image_size=28, patch_size=14,
            projection_dim=16),
        text_config=LlamaConfig(
            hidden_size=48, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
            max_position_embeddings=256, rope_theta=10000.0),
        image_token_index=IMAGE_TOKEN)
    model = LlavaForConditionalGeneration(cfg).eval().float()
    d = tmp_path_factory.mktemp("tiny_llava")
    model.save_pretrained(str(d), safe_serialization=True)
    return str(d), model


def _image(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)


def _prompt(images: list[np.ndarray], extra: int = 0) -> dict:
    ids = [1, 7]
    for _ in images:
        ids += [IMAGE_TOKEN] + [9, 11]
    ids += [13 + (i % 40) for i in range(extra)]
    return {"prompt_token_ids": ids,
            "multi_modal_data": {"image": images}}


def _llm(llava_dir, **kw):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    kw.setdefault("dtype", "float32")
    kw.setdefault("max_model_len", 128)
    kw.setdefault("block_size", 8)
    kw.setdefault("max_num_seqs", 8)
    kw.setdefault("max_num_batched_tokens", 64)
    kw.setdefault("num_kv_blocks", 64)
    return LLM(llava_dir[0], **kw)


def test_greedy_matches_hf(llava_dir):
    path, hf = llava_dir
    llm = _llm(llava_dir)
    img = _image(0)
    out = llm.generate(
        [_prompt([img])],
        SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True))[0]
    ours = list(out.outputs[0].token_ids)

    px = torch.tensor(preprocess_image(img, 28, crop=False))[None]
    ids = [1, 7] + [IMAGE_TOKEN] * TOKENS_PER_IMAGE + [9, 11]
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor([ids]), pixel_values=px,
                          max_new_tokens=8, do_sample=False)
    ref_new = ref[0, len(ids):].tolist()
    assert ours == ref_new


def test_identical_images_share_prefix_different_do_not(llava_dir):
    llm = _llm(llava_dir)
    img_a, img_b = _image(1), _image(2)
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)

    # Long shared prompt so full blocks get cached.
    out_a1 = llm.generate([_prompt([img_a], extra=30)], sp)[0]
    pool = llm.llm_engine.engine_core.scheduler.kv_cache_manager.block_pool
    q0, h0 = pool.total_queries, pool.hit_queries
    out_a2 = llm.generate([_prompt([img_a], extra=30)], sp)[0]
    assert list(out_a1.outputs[0].token_ids) == \
        list(out_a2.outputs[0].token_ids)
    assert pool.hit_queries > h0, "identical image should hit prefix cache"

    # Same token ids, different image: outputs must equal a cache-free run.
    out_b = llm.generate([_prompt([img_b], extra=30)], sp)[0]
    llm_fresh = _llm(llava_dir, enable_prefix_caching=False)
    ref_b = llm_fresh.generate([_prompt([img_b], extra=30)], sp)[0]
    assert list(out_b.outputs[0].token_ids) == \
        list(ref_b.outputs[0].token_ids)


def test_chunked_prefill_across_image(llava_dir):
    """A token budget smaller than the prompt forces chunk boundaries
    inside/around placeholder spans; outputs must match the unchunked
    run."""
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    imgs = [_image(3), _image(4)]
    prompt = _prompt(imgs, extra=40)

    big = _llm(llava_dir, max_num_batched_tokens=128)
    ref = big.generate([prompt], sp)[0]
    small = _llm(llava_dir, max_num_batched_tokens=16)
    out = small.generate([prompt], sp)[0]
    assert list(out.outputs[0].token_ids) == list(ref.outputs[0].token_ids)


def test_encoder_budget_truncation(llava_dir):
    """Encoder cache budget of ONE image forces per-image scheduling for a
    multi-image batch; results still match the roomy engine."""
    sp = SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
    prompts = [_prompt([_image(10 + i), _image(20 + i)], extra=6)
               for i in range(3)]

    roomy = _llm(llava_dir)
    ref = roomy.generate(prompts, sp)
    tight = _llm(llava_dir, encoder_cache_size=TOKENS_PER_IMAGE)
    outs = tight.generate(prompts, sp)
    for o, r in zip(outs, ref):
        assert list(o.outputs[0].token_ids) == list(r.outputs[0].token_ids)


def test_mm_block_hash_extra_keys():
    """Chain hashing with extra keys: blocks before the image match,
    the image block and every later block diverge."""
    from vllm_trianglemix_tpu.core.kv_cache_utils import hash_request_tokens

    tokens = list(range(64))
    base = hash_request_tokens(8, tokens)
    with_a = hash_request_tokens(8, tokens, extra_keys_at={2: ("imgA",)})
    with_b = hash_request_tokens(8, tokens, extra_keys_at={2: ("imgB",)})
    assert [h.hash_value for h in base[:2]] == \
        [h.hash_value for h in with_a[:2]]
    for i in range(2, 8):
        assert with_a[i].hash_value != base[i].hash_value
        assert with_a[i].hash_value != with_b[i].hash_value
    # resuming a chain reproduces the from-scratch hashes
    resumed = hash_request_tokens(8, tokens, start_block=4,
                                  parent_hash=with_a[3].hash_value,
                                  extra_keys_at={2: ("imgA",)})
    assert [h.hash_value for h in resumed] == \
        [h.hash_value for h in with_a[4:]]
