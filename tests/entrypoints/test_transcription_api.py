"""/v1/audio/transcriptions + translations over a tiny Whisper engine.

Covers the multipart audio upload path: WAV decode, resampling, the
default decoder prompt from generation_config forced ids, and the
task-token swap for translations.
"""

import asyncio
import io
import json
import struct
import wave

import numpy as np
import pytest
import torch
from aiohttp.test_utils import TestClient, TestServer

from vllm_trianglemix_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)

SOT, LANG_EN, TRANSCRIBE, TRANSLATE, LANG_DE = 5, 6, 7, 8, 9


@pytest.fixture(scope="module")
def whisper_dir(tmp_path_factory):
    from safetensors.torch import save_file
    from transformers import WhisperConfig as HFCfg
    from transformers import WhisperForConditionalGeneration

    d = tmp_path_factory.mktemp("tiny_whisper")
    hf_kw = dict(
        vocab_size=512, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, decoder_layers=2,
        decoder_attention_heads=4, encoder_ffn_dim=128,
        decoder_ffn_dim=128, num_mel_bins=80, max_source_positions=1500,
        max_target_positions=128, decoder_start_token_id=SOT,
        eos_token_id=3, bos_token_id=3, pad_token_id=3)
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(HFCfg(**hf_kw)).eval().float()
    cfg = json.loads(hf.config.to_json_string())
    cfg["architectures"] = ["WhisperForConditionalGeneration"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    with open(d / "generation_config.json", "w") as f:
        json.dump({"forced_decoder_ids": [[1, LANG_EN], [2, TRANSCRIBE]]},
                  f)
    save_file({k: v.clone().contiguous()
               for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))

    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {f"t{i}": i for i in range(512)}
    for name, tid in (("<eos>", 3), ("<unk>", 4),
                      ("<|startoftranscript|>", SOT), ("<|en|>", LANG_EN),
                      ("<|transcribe|>", TRANSCRIBE),
                      ("<|translate|>", TRANSLATE), ("<|de|>", LANG_DE)):
        del vocab[f"t{tid}"]
        vocab[name] = tid
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(d / "tokenizer.json"))
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "eos_token": "<eos>", "unk_token": "<unk>"}, f)
    return str(d)


@pytest.fixture(scope="module")
def serve(whisper_dir):
    import threading

    from vllm_trianglemix_tpu.engine.async_llm import AsyncLLM
    from vllm_trianglemix_tpu.entrypoints.openai.api_server import (
        build_app,
    )

    loop = asyncio.new_event_loop()
    thread = threading.Thread(target=loop.run_forever, daemon=True)
    thread.start()
    holder = {}

    async def setup():
        config = EngineConfig(
            model=ModelConfig(model=whisper_dir, dtype="float32",
                              max_model_len=32),
            cache=CacheConfig(block_size=16, num_gpu_blocks=256),
            scheduler=SchedulerConfig(max_num_seqs=2,
                                      max_num_batched_tokens=64),
        )
        engine = AsyncLLM.from_engine_config(config)
        client = TestClient(TestServer(build_app(engine, "tiny-whisper")))
        await client.start_server()
        holder["engine"] = engine
        holder["client"] = client

    asyncio.run_coroutine_threadsafe(setup(), loop).result(timeout=600)

    def run(coro_fn, timeout=600):
        return asyncio.run_coroutine_threadsafe(
            coro_fn(holder["client"]), loop).result(timeout=timeout)

    yield run

    async def teardown():
        await holder["client"].close()
        holder["engine"].shutdown()

    asyncio.run_coroutine_threadsafe(teardown(), loop).result(timeout=30)
    loop.call_soon_threadsafe(loop.stop)
    thread.join(timeout=10)


def _wav_bytes(seed=0, sr=8000, seconds=0.5):
    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(int(sr * seconds)) * 3000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _form(**extra):
    import aiohttp

    form = aiohttp.FormData()
    form.add_field("file", _wav_bytes(), filename="audio.wav",
                   content_type="audio/wav")
    for k, v in extra.items():
        form.add_field(k, v)
    return form


def test_transcription(serve):
    async def body(client):
        r = await client.post("/v1/audio/transcriptions", data=_form())
        assert r.status == 200, await r.text()
        payload = await r.json()
        assert isinstance(payload["text"], str)
        return payload["text"]

    text1 = serve(body)
    # deterministic at temperature 0
    assert serve(body) == text1


def test_transcription_text_format(serve):
    async def body(client):
        r = await client.post(
            "/v1/audio/transcriptions",
            data=_form(response_format="text"))
        assert r.status == 200
        assert r.content_type == "text/plain"
        return await r.text()

    assert isinstance(serve(body), str)


def test_translation_and_language(serve):
    async def body(client):
        r = await client.post(
            "/v1/audio/translations",
            data=_form(language="de", response_format="verbose_json"))
        assert r.status == 200, await r.text()
        payload = await r.json()
        assert payload["task"] == "translate"
        assert payload["language"] == "de"
        assert payload["duration"] > 0
        return payload

    serve(body)


def test_bad_audio_rejected(serve):
    async def body(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("file", b"not a wav", filename="x.mp3")
        r = await client.post("/v1/audio/transcriptions", data=form)
        assert r.status == 400

    serve(body)
