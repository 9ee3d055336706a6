"""Qwen2.5-VL parity vs HuggingFace: windowed ViT tower + engine e2e.

Pins models/qwen2_5_vl.py (RMSNorm blocks, gated SiLU vision MLP,
window/full attention split, window-order permutations) against HF
modeling_qwen2_5_vl at a fixed resolution where the grid divides into
windows evenly (32x32 px -> 8x8 patches -> 2x2 windows of 4x4 patches).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import Qwen2_5_VLConfig as HFCfg  # noqa: E402
from transformers import Qwen2_5_VLForConditionalGeneration  # noqa: E402

from vllm_trianglemix_tpu.models import qwen2_5_vl  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402

S = 32          # 8x8 patches -> 4x4 merge blocks -> 2x2 windows
IMG_TOK = 500

HF_KW = dict(
    vision_config={"depth": 2, "hidden_size": 32, "num_heads": 4,
                   "intermediate_size": 48,
                   "patch_size": 4, "temporal_patch_size": 2,
                   "spatial_merge_size": 2, "in_channels": 3,
                   "window_size": 16,           # 4x4-patch windows
                   "fullatt_block_indexes": [1],
                   "out_hidden_size": 64,
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
    video_token_id=499,
    vision_start_token_id=501,
    vision_end_token_id=502,
    bos_token_id=1,
    eos_token_id=2,
)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    hf = Qwen2_5_VLForConditionalGeneration(
        HFCfg(**HF_KW)).eval().float()
    cfg_dict = json.loads(hf.config.to_json_string())
    cfg_dict.setdefault("vision_config", {})["image_size"] = S
    cfg = qwen2_5_vl.Qwen25VLConfig.from_hf_config(cfg_dict)
    params = qwen2_5_vl.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    return hf, cfg, params


def hf_patches(img: np.ndarray, cfg):
    p = cfg.vision.patch_size
    tps = cfg.vision.temporal_patch_size
    ms = cfg.vision.spatial_merge_size
    g = S // p
    x = np.tile(img[None], (tps, 1, 1, 1))
    x = x.reshape(tps, 3, g // ms, ms, p, g // ms, ms, p)
    x = x.transpose(2, 5, 3, 6, 1, 0, 4, 7)
    x = x.reshape(g * g, 3 * tps * p * p)
    return torch.tensor(x), torch.tensor([[1, g, g]])


def test_config_parse(models):
    _, cfg, _ = models
    assert cfg.vision.grid == 8 and cfg.vision.llm_grid == 4
    assert cfg.vision.window_blocks == 2
    assert cfg.vision.fullatt_block_indexes == (1,)
    assert cfg.tokens_per_image == 16


def test_vision_tower_matches_hf(models):
    hf, cfg, params = models
    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, S, S)).astype(np.float32)
    pixel_values, grid = hf_patches(img, cfg)
    with torch.no_grad():
        ref = hf.model.visual(pixel_values, grid_thw=grid).numpy()
    ours = np.asarray(qwen2_5_vl.encode_images(
        params, cfg, jnp.asarray(img[None])))[0]
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=2e-3)


def test_engine_e2e_with_image(models, tmp_path):
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    hf, cfg, _ = models
    d = tmp_path / "qwen25vl"
    d.mkdir()
    cfg_dict = json.loads(hf.config.to_json_string())
    cfg_dict.setdefault("vision_config", {})["image_size"] = S
    cfg_dict["architectures"] = ["Qwen2_5_VLForConditionalGeneration"]
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


def test_video_e2e_matches_hf(models, tmp_path):
    """Qwen2.5-VL video inputs: windowed tower over real frame pairs +
    the tokens_per_second temporal mrope scaling, engine-vs-HF-generate
    token identical (VERDICT r4 next #4)."""
    import numpy as np
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.multimodal.processor import preprocess_image
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    hf, cfg, _ = models
    vid_tok = hf.config.video_token_id
    d = tmp_path / "qwen25vl_vid"
    d.mkdir()
    cfg_dict = json.loads(hf.config.to_json_string())
    cfg_dict.setdefault("vision_config", {})["image_size"] = S
    cfg_dict["architectures"] = ["Qwen2_5_VLForConditionalGeneration"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    save_file({k: v.clone().contiguous() for k, v in
               hf.state_dict().items()}, str(d / "model.safetensors"))

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=32,
              skip_tokenizer_init=True, encoder_cache_size=64)

    rng = np.random.default_rng(3)
    raw = rng.uniform(0, 255, size=(4, S, S, 3)).astype(np.uint8)
    prompt = {"prompt_token_ids": [7, 501, vid_tok, 502, 11],
              "multi_modal_data": {"video": raw}}
    out = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True))[0]
    got = list(out.outputs[0].token_ids)

    # HF reference with the same frames
    p = cfg.vision.patch_size
    tps = cfg.vision.temporal_patch_size
    ms = cfg.vision.spatial_merge_size
    g = S // p
    frames = np.stack([preprocess_image(raw[i], S) for i in range(4)])
    t = frames.shape[0] // tps
    x = frames.reshape(t, tps, 3, g // ms, ms, p, g // ms, ms, p)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8).reshape(
        t * g * g, 3 * tps * p * p)
    per = cfg.tokens_per_image
    ids = [7, 501] + [vid_tok] * (t * per) + [502, 11]
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values_videos=torch.tensor(x.astype(np.float32)),
            video_grid_thw=torch.tensor([[t, g, g]]),
            second_per_grid_ts=torch.tensor([1.0]),
            do_sample=False, max_new_tokens=6,
            eos_token_id=None)[0, len(ids):].tolist()
    assert got == ref
