"""Qwen2 sequence-classification head vs HuggingFace (pooler classify
task: last-token hidden -> score head -> softmax)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import Qwen2Config as HFQwen2Config  # noqa: E402
from transformers import Qwen2ForSequenceClassification  # noqa: E402


def test_classify_matches_hf(tmp_path):
    torch.manual_seed(0)
    hf = Qwen2ForSequenceClassification(HFQwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_labels=3, pad_token_id=0)).eval().float()

    from safetensors.torch import save_file

    d = tmp_path / "cls"
    d.mkdir()
    cfg = json.loads(hf.config.to_json_string())
    cfg["architectures"] = ["Qwen2ForSequenceClassification"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))

    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=16,
              skip_tokenizer_init=True)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 256, size=n).tolist() for n in (7, 12)]
    outs = llm.classify(prompts)

    for prompt, out in zip(prompts, outs):
        with torch.no_grad():
            logits = hf(torch.tensor([prompt])).logits[0]
            ref = torch.softmax(logits, -1).numpy()
        np.testing.assert_allclose(np.asarray(out.pooled), ref,
                                   rtol=1e-4, atol=1e-5)
