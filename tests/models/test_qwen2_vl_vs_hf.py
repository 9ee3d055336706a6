"""Qwen2-VL numerics parity vs HuggingFace: vision tower, mrope position
tables, and full engine e2e with an image.

Pins models/qwen2_vl.py (ViT + 2D vision rotary + PatchMerger + mrope
decoder) against HF modeling_qwen2_vl.py at a fixed image resolution.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import Qwen2VLConfig as HFCfg  # noqa: E402
from transformers import Qwen2VLForConditionalGeneration  # noqa: E402

from vllm_trianglemix_tpu.models import qwen2_vl  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402

S = 16          # fixed image size: grid 4x4 patches -> 2x2 merged tokens
IMG_TOK = 500

HF_KW = dict(
    vision_config={"depth": 2, "embed_dim": 32, "num_heads": 4,
                   "patch_size": 4, "temporal_patch_size": 2,
                   "spatial_merge_size": 2, "in_channels": 3,
                   # the merger projects into this (must equal the text
                   # hidden size, as in real checkpoints)
                   "hidden_size": 64,
                   "image_size": S},
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    rms_norm_eps=1e-6,
    rope_theta=1_000_000.0,
    tie_word_embeddings=False,
    rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
    image_token_id=IMG_TOK,
    vision_start_token_id=501,
    vision_end_token_id=502,
    bos_token_id=1,
    eos_token_id=2,
)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(HFCfg(**HF_KW)).eval().float()
    cfg_dict = json.loads(hf.config.to_json_string())
    cfg_dict.setdefault("vision_config", {})["image_size"] = S
    cfg = qwen2_vl.Qwen2VLConfig.from_hf_config(cfg_dict)
    params = qwen2_vl.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    return hf, cfg, params


def hf_patches(img: np.ndarray, cfg):
    """Raw [3, S, S] image -> the HF processor's flattened-patch layout
    + grid (fixed size, no resize)."""
    p = cfg.vision.patch_size
    tps = cfg.vision.temporal_patch_size
    ms = cfg.vision.spatial_merge_size
    g = S // p
    x = np.tile(img[None], (tps, 1, 1, 1))           # [tps, 3, S, S]
    x = x.reshape(tps, 3, g // ms, ms, p, g // ms, ms, p)
    x = x.transpose(2, 5, 3, 6, 1, 0, 4, 7)          # gh',gw',ms,ms,C,tps,p,p
    x = x.reshape(g * g, 3 * tps * p * p)
    return torch.tensor(x), torch.tensor([[1, g, g]])


def test_config_parse(models):
    _, cfg, _ = models
    assert cfg.text.mrope_section == (2, 3, 3)
    assert cfg.text.use_qkv_bias
    assert cfg.vision.grid == 4 and cfg.vision.llm_grid == 2
    assert cfg.tokens_per_image == 4
    assert cfg.image_token_index == IMG_TOK


def test_vision_tower_matches_hf(models):
    hf, cfg, params = models
    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, S, S)).astype(np.float32)

    pixel_values, grid = hf_patches(img, cfg)
    with torch.no_grad():
        ref = hf.model.visual(pixel_values, grid_thw=grid).numpy()

    ours = np.asarray(qwen2_vl.encode_images(
        params, cfg, jnp.asarray(img[None])))[0]
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=2e-3)


def test_mrope_table_matches_hf(models):
    hf, cfg, _ = models
    # text, vision_start, image span (4 merged tokens), vision_end, text
    # (HF's get_rope_index finds images via vision_start_token_id, so the
    # template markers must be present for a like-for-like comparison)
    ids = [7, 8, 501] + [IMG_TOK] * 4 + [502, 12]
    table, nxt = qwen2_vl.mrope_position_table(ids, IMG_TOK,
                                               cfg.vision.llm_grid)
    pos, delta = hf.model.get_rope_index(
        torch.tensor([ids]), image_grid_thw=torch.tensor([[1, 4, 4]]))
    ref = pos[:, 0].numpy()                           # [3, len]
    np.testing.assert_array_equal(table, ref)
    # decode resumes at max+1: HF returns the rope delta vs seq len
    assert nxt == ref.max() + 1
    assert nxt - len(ids) == int(delta[0])


def test_engine_e2e_with_image(models, tmp_path):
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    hf, cfg, _ = models
    d = tmp_path / "qwen2vl"
    d.mkdir()
    cfg_dict = json.loads(hf.config.to_json_string())
    cfg_dict.setdefault("vision_config", {})["image_size"] = S
    cfg_dict["architectures"] = ["Qwen2VLForConditionalGeneration"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    save_file({k: v.clone().contiguous() for k, v in
               hf.state_dict().items()}, str(d / "model.safetensors"))

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=32,
              skip_tokenizer_init=True, encoder_cache_size=64)

    rng = np.random.default_rng(1)
    raw = rng.uniform(0, 255, size=(S, S, 3)).astype(np.uint8)
    prompt = {"prompt_token_ids": [7, 501, IMG_TOK, 502, 11],
              "multi_modal_data": {"image": raw}}
    out = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True))[0]
    got = list(out.outputs[0].token_ids)

    # HF reference: same preprocessing (resize is identity at S x S,
    # CLIP mean/std normalization), expanded placeholder span.
    from vllm_trianglemix_tpu.multimodal.processor import preprocess_image

    img = preprocess_image(raw, S)
    pixel_values, grid = hf_patches(img.astype(np.float32), cfg)
    ids = [7, 501] + [IMG_TOK] * cfg.tokens_per_image + [502, 11]
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=pixel_values, image_grid_thw=grid,
            do_sample=False, max_new_tokens=6,
            eos_token_id=None)[0, len(ids):].tolist()
    assert got == ref
