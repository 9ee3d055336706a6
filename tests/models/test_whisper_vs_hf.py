"""Whisper encoder-decoder parity vs HuggingFace torch.

Covers the three new pieces: the audio encoder numerics, the
CrossAttentionManager block lifecycle, and the full engine path (audio
item -> encoder -> cross-KV fill -> paged decode) against HF greedy
generation.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from vllm_trianglemix_tpu.models import whisper  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402

HF_KW = dict(
    vocab_size=512,
    d_model=64,
    encoder_layers=2,
    encoder_attention_heads=4,
    decoder_layers=2,
    decoder_attention_heads=4,
    encoder_ffn_dim=128,
    decoder_ffn_dim=128,
    num_mel_bins=80,
    max_source_positions=1500,
    max_target_positions=128,
    decoder_start_token_id=5,
    eos_token_id=3,
    bos_token_id=3,
    pad_token_id=3,
)


@pytest.fixture(scope="module")
def models():
    from transformers import WhisperConfig as HFCfg
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(HFCfg(**HF_KW)).eval().float()
    cfg = whisper.WhisperConfig.from_hf_config(HF_KW)
    params = whisper.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    return hf, cfg, params


def _mel(seed=0):
    rng = np.random.default_rng(seed)
    wav = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=HF_KW["num_mel_bins"])
    return wav, fe(wav, sampling_rate=16000,
                   return_tensors="np").input_features[0].astype(
                       np.float32)


def test_encoder_matches_hf(models):
    hf, cfg, params = models
    _, mel = _mel(0)
    with torch.no_grad():
        ref = hf.model.encoder(
            torch.tensor(mel[None])).last_hidden_state[0].numpy()
    ours = np.asarray(whisper.encode_images(params, cfg, jnp.asarray(
        mel[None])))[0]
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_cross_attention_manager():
    from vllm_trianglemix_tpu.core.block_pool import BlockPool
    from vllm_trianglemix_tpu.core.kv_cache_interface import (
        CrossAttentionSpec,
    )
    from vllm_trianglemix_tpu.core.single_type_kv_cache_manager import (
        CrossAttentionManager,
        get_manager_for_kv_cache_spec,
    )

    spec = CrossAttentionSpec(block_size=128, num_kv_heads=4,
                              head_size=128, dtype_bytes=2,
                              num_encoder_tokens=1500)
    pool = BlockPool(64, enable_caching=False)
    mgr = get_manager_for_kv_cache_spec(spec, pool)
    assert isinstance(mgr, CrossAttentionManager)
    # allocation ignores decoder token counts: 12 cross blocks up front
    assert mgr.get_num_blocks_to_allocate("r1", 3, []) == 12
    blocks = mgr.allocate_new_blocks("r1", 3)
    assert len(blocks) == 12
    # no growth as the decoder generates
    assert mgr.get_num_blocks_to_allocate("r1", 200, []) == 0
    assert mgr.allocate_new_blocks("r1", 200) == []
    # never prefix-cached
    assert mgr.find_longest_cache_hit([], 10) == []
    free_before = pool.get_num_free_blocks()
    mgr.free("r1")
    assert pool.get_num_free_blocks() == free_before + 12
    assert spec.max_memory_usage_bytes(99999) == 12 * spec.page_size_bytes


def test_engine_e2e_transcription(models, tmp_path):
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    hf, cfg, _ = models
    d = tmp_path / "whisper"
    d.mkdir()
    cfg_dict = json.loads(hf.config.to_json_string())
    cfg_dict["architectures"] = ["WhisperForConditionalGeneration"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    save_file({k: v.clone().contiguous()
               for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))

    # default block_size is 16 -> the cross-KV group alone needs
    # ceil(1500/16) = 94 blocks per request
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64,
              num_kv_blocks=256, skip_tokenizer_init=True)

    def hf_greedy(mel, n=8):
        # manual loop: hf.generate() injects begin_suppress_tokens /
        # forced-id processors from the default generation config, which
        # a raw greedy engine comparison must not include
        ids = [HF_KW["decoder_start_token_id"]]
        with torch.no_grad():
            enc = hf.model.encoder(torch.tensor(mel[None]))
            for _ in range(n):
                o = hf(decoder_input_ids=torch.tensor([ids]),
                       encoder_outputs=enc)
                ids.append(int(o.logits[0, -1].argmax()))
        return ids[1:]

    start = HF_KW["decoder_start_token_id"]
    wav, mel = _mel(1)
    out = llm.generate(
        [{"prompt_token_ids": [start],
          "multi_modal_data": {"audio": wav}}],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))[0]
    assert list(out.outputs[0].token_ids) == hf_greedy(mel)

    # Second request with DIFFERENT audio: cross-KV pages are
    # per-request, encoder outputs keyed by content hash.
    wav2, mel2 = _mel(2)
    out2 = llm.generate(
        [{"prompt_token_ids": [start],
          "multi_modal_data": {"audio": wav2}}],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))[0]
    assert list(out2.outputs[0].token_ids) == hf_greedy(mel2)


def test_registered():
    from vllm_trianglemix_tpu.models.registry import resolve_architecture

    module, cfg_cls = resolve_architecture(
        "WhisperForConditionalGeneration")
    assert module.IS_ENCODER_DECODER and module.IS_MULTIMODAL
    assert hasattr(module, "fill_cross_kv")


def test_default_decoder_prompt():
    cfg = whisper.WhisperConfig(
        decoder_start_token_id=50258,
        forced_decoder_ids=((1, 50259), (2, 50359), (3, 50363)))
    assert cfg.default_decoder_prompt() == [50258, 50259, 50359, 50363]
