"""Encoder-only embedding models (BERT / XLM-R) vs HuggingFace.

Pins models/bert_embed.py — post-norm blocks, learned positions,
bidirectional ragged-batch attention — and the engine's one-shot-prefill
+ pooling flow against HF BertModel / XLMRobertaModel last_hidden_state.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from vllm_trianglemix_tpu.models import bert_embed  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402

BASE = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    max_position_embeddings=128,
    type_vocab_size=2,
    layer_norm_eps=1e-12,
    hidden_act="gelu",
)


def ragged_md(lens):
    from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata

    T = sum(lens)
    positions, req_idx, qsl = [], [], [0]
    for r, n in enumerate(lens):
        positions.extend(range(n))
        req_idx.extend([r] * n)
        qsl.append(qsl[-1] + n)
    R = len(lens)
    return AttentionMetadata(
        positions=jnp.asarray(positions, jnp.int32),
        req_idx=jnp.asarray(req_idx, jnp.int32),
        slot_mapping=jnp.zeros(T, jnp.int32),
        block_tables=jnp.zeros((R, 2), jnp.int32),
        seq_lens=jnp.asarray(lens, jnp.int32),
        prompt_lens=jnp.asarray(lens, jnp.int32),
        query_start_loc=jnp.asarray(qsl, jnp.int32),
        logits_indices=jnp.asarray([q - 1 for q in qsl[1:]], jnp.int32),
        num_reqs=jnp.asarray(R, jnp.int32),
    )


def test_bert_hidden_matches_hf():
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    hf = BertModel(BertConfig(**BASE)).eval().float()
    cfg = bert_embed.BertEmbedConfig.from_hf_config(
        dict(BASE, architectures=["BertModel"]))
    assert cfg.position_offset == 0
    params = bert_embed.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    s1 = rng.integers(1, 256, size=13).tolist()
    s2 = rng.integers(1, 256, size=7).tolist()
    md = ragged_md([13, 7])
    hidden, _ = bert_embed.forward(
        params, cfg, None, jnp.asarray(s1 + s2, jnp.int32),
        jnp.zeros((2, 4, 1)), md, None)
    ours = np.asarray(hidden)
    with torch.no_grad():
        r1 = hf(torch.tensor([s1])).last_hidden_state[0].numpy()
        r2 = hf(torch.tensor([s2])).last_hidden_state[0].numpy()
    np.testing.assert_allclose(ours[:13], r1, atol=3e-4, rtol=2e-3)
    np.testing.assert_allclose(ours[13:], r2, atol=3e-4, rtol=2e-3)


def test_xlm_roberta_hidden_matches_hf():
    from transformers import XLMRobertaConfig, XLMRobertaModel

    torch.manual_seed(1)
    kw = dict(BASE, pad_token_id=1)
    hf = XLMRobertaModel(XLMRobertaConfig(**kw)).eval().float()
    cfg = bert_embed.BertEmbedConfig.from_hf_config(
        dict(kw, architectures=["XLMRobertaModel"]))
    assert cfg.position_offset == 2
    params = bert_embed.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    s1 = rng.integers(2, 256, size=11).tolist()
    md = ragged_md([11])
    hidden, _ = bert_embed.forward(
        params, cfg, None, jnp.asarray(s1, jnp.int32),
        jnp.zeros((2, 4, 1)), md, None)
    with torch.no_grad():
        ref = hf(torch.tensor([s1])).last_hidden_state[0].numpy()
    np.testing.assert_allclose(np.asarray(hidden), ref, atol=3e-4,
                               rtol=2e-3)


def test_engine_embeddings_e2e(tmp_path):
    from safetensors.torch import save_file
    from transformers import BertConfig, BertModel

    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    torch.manual_seed(2)
    hf = BertModel(BertConfig(**BASE)).eval().float()
    d = tmp_path / "bert"
    d.mkdir()
    cfg_d = json.loads(hf.config.to_json_string())
    cfg_d["architectures"] = ["BertModel"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg_d, f)
    save_file({k: v.clone().contiguous()
               for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))

    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=48, num_kv_blocks=16,
              skip_tokenizer_init=True)
    prompts = [[101, 7, 8, 9, 102], [101, 20, 21, 102]]
    outs = llm.encode(prompts)
    vecs = [o.pooled for o in outs]
    assert len(vecs) == 2 and len(vecs[0]) == 64

    with torch.no_grad():
        ref = hf(torch.tensor([prompts[0]])).last_hidden_state[0, 0]
    ref = (ref / ref.norm()).numpy()          # CLS pooling + normalize
    np.testing.assert_allclose(np.asarray(vecs[0]), ref, atol=3e-4,
                               rtol=2e-3)


def test_oversized_encoder_prompt_rejected(tmp_path):
    from safetensors.torch import save_file
    from transformers import BertConfig, BertModel

    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    torch.manual_seed(3)
    hf = BertModel(BertConfig(**BASE)).eval().float()
    d = tmp_path / "bert2"
    d.mkdir()
    cfg_d = json.loads(hf.config.to_json_string())
    cfg_d["architectures"] = ["BertModel"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg_d, f)
    save_file({k: v.clone().contiguous()
               for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=16, num_kv_blocks=16,
              skip_tokenizer_init=True)
    with pytest.raises(ValueError, match="cannot chunk"):
        llm.encode([list(range(1, 33))])
