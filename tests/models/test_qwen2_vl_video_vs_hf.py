"""Qwen2-VL VIDEO inputs vs HuggingFace (VERDICT r4 next #4): the video
tower (real temporal frame pairs through patch_embed, reference
Qwen2VLVideoPixelInputs), the video mrope table (t advances per temporal
slice), and full engine e2e with a synthetic video."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import Qwen2VLConfig as HFCfg  # noqa: E402
from transformers import Qwen2VLForConditionalGeneration  # noqa: E402

from vllm_trianglemix_tpu.models import qwen2_vl  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402

S = 16
IMG_TOK, VID_TOK = 500, 499

HF_KW = dict(
    vision_config={"depth": 2, "embed_dim": 32, "num_heads": 4,
                   "patch_size": 4, "temporal_patch_size": 2,
                   "spatial_merge_size": 2, "in_channels": 3,
                   "hidden_size": 64, "image_size": S},
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
    video_token_id=VID_TOK,
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


def hf_video_patches(frames: np.ndarray, cfg):
    """[F, 3, S, S] real frames -> HF flattened video patches + grid."""
    p = cfg.vision.patch_size
    tps = cfg.vision.temporal_patch_size
    ms = cfg.vision.spatial_merge_size
    g = S // p
    t = frames.shape[0] // tps
    x = frames.reshape(t, tps, 3, S, S)
    x = x.reshape(t, tps, 3, g // ms, ms, p, g // ms, ms, p)
    # HF processor order per slice: gh', gw', ms, ms, C, tps, p, p
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    x = x.reshape(t * g * g, 3 * tps * p * p)
    return torch.tensor(x), torch.tensor([[t, g, g]])


def test_config_has_video_token(models):
    _, cfg, _ = models
    assert cfg.video_token_index == VID_TOK


def test_video_tower_matches_hf(models):
    hf, cfg, params = models
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(4, 3, S, S)).astype(np.float32)  # 2 slices

    pixel_values, grid = hf_video_patches(frames, cfg)
    with torch.no_grad():
        ref = hf.model.visual(pixel_values, grid_thw=grid).numpy()

    px = frames.reshape(2, 2, 3, S, S)                # [slices, tps, ...]
    ours = np.asarray(qwen2_vl.encode_video_slices(
        params, cfg, jnp.asarray(px)))
    np.testing.assert_allclose(ours.reshape(ref.shape), ref,
                               atol=3e-4, rtol=2e-3)


def test_mrope_table_video_matches_hf(models):
    hf, cfg, _ = models
    per = cfg.tokens_per_image
    # text, vision_start, video span (2 slices x 4 merged), vision_end
    ids = [7, 8, 501] + [VID_TOK] * (2 * per) + [502, 12]
    table, nxt = qwen2_vl.mrope_position_table(
        ids, IMG_TOK, cfg.vision.llm_grid, video_token_id=VID_TOK)
    pos, delta = hf.model.get_rope_index(
        torch.tensor([ids]), video_grid_thw=torch.tensor([[2, 4, 4]]))
    ref = pos[:, 0].numpy()
    np.testing.assert_array_equal(table, ref)
    assert nxt == ref.max() + 1
    assert nxt - len(ids) == int(delta[0])


def test_engine_e2e_with_video(models, tmp_path):
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    hf, cfg, _ = models
    d = tmp_path / "qwen2vl_vid"
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
    raw = rng.uniform(0, 255, size=(4, S, S, 3)).astype(np.uint8)
    prompt = {"prompt_token_ids": [7, 501, VID_TOK, 502, 11],
              "multi_modal_data": {"video": raw}}
    out = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True))[0]
    got = list(out.outputs[0].token_ids)

    from vllm_trianglemix_tpu.multimodal.processor import preprocess_image

    frames = np.stack([preprocess_image(raw[i], S) for i in range(4)])
    pixel_values, grid = hf_video_patches(frames.astype(np.float32), cfg)
    per = cfg.tokens_per_image
    ids = [7, 501] + [VID_TOK] * (2 * per) + [502, 11]
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values_videos=pixel_values, video_grid_thw=grid,
            do_sample=False, max_new_tokens=6,
            eos_token_id=None)[0, len(ids):].tolist()
    assert got == ref


def test_chat_video_url_content_parts():
    """/v1/chat/completions video_url parts decode (animated GIF via a
    data: URL) into multi-frame media and a <video> marker."""
    import base64
    import io

    from PIL import Image

    from vllm_trianglemix_tpu.entrypoints.openai.api_server import (
        _extract_chat_images,
    )
    from vllm_trianglemix_tpu.multimodal.processor import video_frames

    frames = [Image.new("RGB", (8, 8), (i * 40, 0, 0)) for i in range(4)]
    buf = io.BytesIO()
    frames[0].save(buf, format="GIF", save_all=True,
                   append_images=frames[1:], duration=100)
    url = "data:image/gif;base64," + base64.b64encode(
        buf.getvalue()).decode()

    messages = [{"role": "user", "content": [
        {"type": "text", "text": "describe"},
        {"type": "video_url", "video_url": {"url": url}},
    ]}]
    images, videos = _extract_chat_images(messages)
    assert not images and len(videos) == 1
    assert "<video>" in messages[0]["content"]
    assert len(video_frames(videos[0])) == 4
