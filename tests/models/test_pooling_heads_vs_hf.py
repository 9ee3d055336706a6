"""Round-5c pooling/classification/reward heads vs HuggingFace:
BERT/XLM-R cross-encoder classifiers (CLS pooling + dense->tanh->linear
heads), GPT-2 classification (last pooling + bias-less score), Qwen2
reward models (dense->relu->linear, raw value / softmax), and the
RobertaForMaskedLM prefixed-checkpoint embedding path."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def serve(tmp_path, hf, arch, name="m", **llm_kw):
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    d = tmp_path / name
    d.mkdir()
    cfg = json.loads(hf.config.to_json_string())
    cfg["architectures"] = [arch]
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file({k: v.clone().contiguous()
               for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))
    kw = dict(dtype="float32", max_model_len=64, max_num_seqs=2,
              max_num_batched_tokens=64, num_kv_blocks=16,
              skip_tokenizer_init=True)
    kw.update(llm_kw)
    return LLM(model=str(d), **kw)


BERT_GEOM = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                 num_hidden_layers=2, num_attention_heads=4,
                 max_position_embeddings=128, type_vocab_size=2,
                 num_labels=3, pad_token_id=0)


def test_bert_classifier_matches_hf(tmp_path):
    from transformers import BertConfig, BertForSequenceClassification

    torch.manual_seed(0)
    hf = BertForSequenceClassification(
        BertConfig(**BERT_GEOM)).eval().float()
    llm = serve(tmp_path, hf, "BertForSequenceClassification")
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 256, size=n).tolist() for n in (7, 12)]
    outs = llm.classify(prompts)
    for prompt, out in zip(prompts, outs):
        with torch.no_grad():
            ref = torch.softmax(
                hf(torch.tensor([prompt])).logits[0], -1).numpy()
        np.testing.assert_allclose(np.asarray(out.pooled), ref,
                                   rtol=1e-4, atol=1e-5)


def test_xlm_roberta_classifier_matches_hf(tmp_path):
    from transformers import (
        XLMRobertaConfig,
        XLMRobertaForSequenceClassification,
    )

    torch.manual_seed(1)
    hf = XLMRobertaForSequenceClassification(
        XLMRobertaConfig(**{**BERT_GEOM, "pad_token_id": 1,
                            "num_labels": 2})).eval().float()
    llm = serve(tmp_path, hf, "XLMRobertaForSequenceClassification")
    rng = np.random.default_rng(1)
    prompts = [rng.integers(2, 256, size=n).tolist() for n in (9, 5)]
    outs = llm.classify(prompts)
    for prompt, out in zip(prompts, outs):
        with torch.no_grad():
            ref = torch.softmax(
                hf(torch.tensor([prompt])).logits[0], -1).numpy()
        np.testing.assert_allclose(np.asarray(out.pooled), ref,
                                   rtol=1e-4, atol=1e-5)


def test_roberta_masked_lm_embeds_match_hf(tmp_path):
    """Prefixed ('roberta.') checkpoint through the embedding path."""
    from transformers import RobertaConfig, RobertaForMaskedLM

    geom = {k: v for k, v in BERT_GEOM.items() if k != "num_labels"}
    torch.manual_seed(2)
    hf = RobertaForMaskedLM(
        RobertaConfig(**{**geom, "pad_token_id": 1})).eval().float()
    assert any(k.startswith("roberta.") for k in hf.state_dict())
    llm = serve(tmp_path, hf, "RobertaForMaskedLM")
    from vllm_trianglemix_tpu.pooling_params import PoolingParams

    prompt = list(range(4, 16))
    out = llm.encode([prompt], PoolingParams(pooling_type="cls",
                                             normalize=False))[0]
    with torch.no_grad():
        ref = hf.roberta(torch.tensor([prompt])
                         ).last_hidden_state[0, 0].numpy()
    np.testing.assert_allclose(np.asarray(out.pooled), ref,
                               rtol=1e-4, atol=1e-4)


def test_gpt2_classifier_matches_hf(tmp_path):
    from transformers import GPT2Config, GPT2ForSequenceClassification

    torch.manual_seed(3)
    hf = GPT2ForSequenceClassification(GPT2Config(
        vocab_size=256, n_embd=64, n_inner=128, n_layer=2, n_head=4,
        n_positions=128, num_labels=3, pad_token_id=0)).eval().float()
    llm = serve(tmp_path, hf, "GPT2ForSequenceClassification")
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 256, size=n).tolist() for n in (6, 11)]
    outs = llm.classify(prompts)
    for prompt, out in zip(prompts, outs):
        with torch.no_grad():
            # HF pools at the last non-pad token == last token here
            ref = torch.softmax(
                hf(torch.tensor([prompt])).logits[0], -1).numpy()
        np.testing.assert_allclose(np.asarray(out.pooled), ref,
                                   rtol=1e-4, atol=1e-5)


def _qwen2_with_reward_head(num_labels, seed):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(seed)
    hf = Qwen2ForCausalLM(Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, pad_token_id=0)).eval().float()
    sd = {k: v for k, v in hf.state_dict().items() if k != "lm_head.weight"}
    head = {
        "score.0.weight": torch.randn(64, 64) * 0.1,
        "score.0.bias": torch.randn(64) * 0.1,
        "score.2.weight": torch.randn(num_labels, 64) * 0.1,
        "score.2.bias": torch.randn(num_labels) * 0.1,
    }
    sd.update(head)
    return hf, sd, head


def _reward_ref(hf, head, prompt, num_labels):
    with torch.no_grad():
        h = hf.model(torch.tensor([prompt]),
                     output_hidden_states=True).hidden_states[-1][0, -1]
        z = torch.relu(h @ head["score.0.weight"].T + head["score.0.bias"])
        return (z @ head["score.2.weight"].T + head["score.2.bias"]).numpy()


def test_qwen2_reward_model_raw_value(tmp_path):
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    hf, sd, head = _qwen2_with_reward_head(num_labels=1, seed=4)
    d = tmp_path / "rm"
    d.mkdir()
    cfg = json.loads(hf.config.to_json_string())
    cfg["architectures"] = ["Qwen2ForRewardModel"]
    cfg["num_labels"] = 1
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file({k: v.clone().contiguous() for k, v in sd.items()},
              str(d / "model.safetensors"))
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=16,
              skip_tokenizer_init=True)
    prompt = list(range(5, 17))
    out = llm.classify([prompt])[0]
    ref = _reward_ref(hf, head, prompt, 1)
    np.testing.assert_allclose(np.asarray(out.pooled), ref,
                               rtol=1e-4, atol=1e-5)


def test_qwen2_process_reward_softmax(tmp_path):
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    hf, sd, head = _qwen2_with_reward_head(num_labels=2, seed=5)
    d = tmp_path / "prm"
    d.mkdir()
    cfg = json.loads(hf.config.to_json_string())
    cfg["architectures"] = ["Qwen2ForProcessRewardModel"]
    cfg["num_labels"] = 2
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file({k: v.clone().contiguous() for k, v in sd.items()},
              str(d / "model.safetensors"))
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=16,
              skip_tokenizer_init=True)
    prompt = list(range(5, 14))
    out = llm.classify([prompt])[0]
    logits = _reward_ref(hf, head, prompt, 2)
    ref = np.exp(logits - logits.max())
    ref = ref / ref.sum()
    np.testing.assert_allclose(np.asarray(out.pooled), ref,
                               rtol=1e-4, atol=1e-5)


def test_internlm2_reward_model_raw_value(tmp_path):
    """InternLM2 name shim + v_head: reward = v_head @ h_last, checked
    against a hand-renamed llama with hand-computed head output."""
    from safetensors.torch import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    geom = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=256,
                rms_norm_eps=1e-6, rope_theta=10_000.0,
                tie_word_embeddings=False, eos_token_id=3, bos_token_id=2)
    torch.manual_seed(6)
    hf = LlamaForCausalLM(LlamaConfig(**geom)).eval().float()
    sd = dict(hf.state_dict())
    # rename into InternLM2's scheme (fused wqkv per-kv-head groups)
    out = {"model.tok_embeddings.weight": sd.pop(
               "model.embed_tokens.weight"),
           "model.norm.weight": sd.pop("model.norm.weight")}
    sd.pop("lm_head.weight")
    kh, g, hd, d = 2, 2, 16, 64
    for i in range(geom["num_hidden_layers"]):
        p = f"model.layers.{i}"
        q = sd.pop(f"{p}.self_attn.q_proj.weight").reshape(kh, g, hd, d)
        k = sd.pop(f"{p}.self_attn.k_proj.weight").reshape(kh, 1, hd, d)
        v = sd.pop(f"{p}.self_attn.v_proj.weight").reshape(kh, 1, hd, d)
        out[f"{p}.attention.wqkv.weight"] = torch.cat(
            [q, k, v], dim=1).reshape(kh * (g + 2) * hd, d)
        out[f"{p}.attention.wo.weight"] = sd.pop(
            f"{p}.self_attn.o_proj.weight")
        out[f"{p}.attention_norm.weight"] = sd.pop(
            f"{p}.input_layernorm.weight")
        out[f"{p}.ffn_norm.weight"] = sd.pop(
            f"{p}.post_attention_layernorm.weight")
        out[f"{p}.feed_forward.w1.weight"] = sd.pop(
            f"{p}.mlp.gate_proj.weight")
        out[f"{p}.feed_forward.w3.weight"] = sd.pop(
            f"{p}.mlp.up_proj.weight")
        out[f"{p}.feed_forward.w2.weight"] = sd.pop(
            f"{p}.mlp.down_proj.weight")
    assert not sd, sd.keys()
    v_head = torch.randn(1, 64) * 0.1
    out["v_head.weight"] = v_head

    d2 = tmp_path / "ilm2rm"
    d2.mkdir()
    cfg = json.loads(hf.config.to_json_string())
    cfg.update(architectures=["InternLM2ForRewardModel"], bias=False)
    with open(d2 / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file({k: v.clone().contiguous() for k, v in out.items()},
              str(d2 / "model.safetensors"))
    llm = LLM(model=str(d2), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=16,
              skip_tokenizer_init=True)
    prompt = list(range(5, 16))
    got = llm.classify([prompt])[0]
    with torch.no_grad():
        h = hf.model(torch.tensor([prompt]),
                     output_hidden_states=True).hidden_states[-1][0, -1]
        ref = (h @ v_head.T).numpy()
    np.testing.assert_allclose(np.asarray(got.pooled), ref,
                               rtol=1e-4, atol=1e-5)


def test_modernbert_embeds_match_hf(tmp_path):
    """ModernBERT: rope encoder with alternating local/global attention
    and GeGLU MLP; CLS-pooled hidden must match HF exactly — the prompt
    is longer than the +-local window so local masking matters."""
    from transformers import ModernBertConfig as HFCfg
    from transformers import ModernBertModel

    from vllm_trianglemix_tpu.pooling_params import PoolingParams

    torch.manual_seed(7)
    hf = ModernBertModel(HFCfg(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4,
        max_position_embeddings=128, global_attn_every_n_layers=3,
        local_attention=8, global_rope_theta=160_000.0,
        local_rope_theta=10_000.0, pad_token_id=0,
        attn_implementation="sdpa",
        reference_compile=False)).eval().float()
    llm = serve(tmp_path, hf, "ModernBertModel", name="modernbert")
    for n, seed in ((23, 0), (6, 1)):
        prompt = np.random.default_rng(seed).integers(
            1, 256, size=n).tolist()
        out = llm.encode([prompt], PoolingParams(pooling_type="cls",
                                                 normalize=False))[0]
        with torch.no_grad():
            ref = hf(torch.tensor([prompt])).last_hidden_state[0, 0]
        np.testing.assert_allclose(np.asarray(out.pooled), ref.numpy(),
                                   rtol=1e-4, atol=2e-4)


def test_bare_qwen2_model_embedder(tmp_path):
    """gte-Qwen2-style bare backbone dump (no "model." prefix, no
    lm_head) serves through the embedding path."""
    from transformers import Qwen2Config, Qwen2Model

    from vllm_trianglemix_tpu.pooling_params import PoolingParams

    torch.manual_seed(8)
    hf = Qwen2Model(Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, pad_token_id=0)).eval().float()
    assert "embed_tokens.weight" in hf.state_dict()
    llm = serve(tmp_path, hf, "Qwen2Model", name="bare_qwen2")
    prompt = list(range(5, 20))
    out = llm.encode([prompt], PoolingParams(pooling_type="last",
                                             normalize=False))[0]
    with torch.no_grad():
        ref = hf(torch.tensor([prompt])).last_hidden_state[0, -1]
    np.testing.assert_allclose(np.asarray(out.pooled), ref.numpy(),
                               rtol=1e-4, atol=2e-4)


def test_bare_gemma2_model_embedder(tmp_path):
    """Bare Gemma2Model dump through the gemma2 loader's prefix
    fallback + hybrid sliding/full groups."""
    from transformers import Gemma2Config, Gemma2Model

    from vllm_trianglemix_tpu.pooling_params import PoolingParams

    torch.manual_seed(9)
    hf = Gemma2Model(Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, sliding_window=8,
        pad_token_id=0)).eval().float()
    assert "embed_tokens.weight" in hf.state_dict()
    llm = serve(tmp_path, hf, "Gemma2Model", name="bare_gemma2",
                num_kv_blocks=32)
    prompt = list(range(5, 20))
    out = llm.encode([prompt], PoolingParams(pooling_type="last",
                                             normalize=False))[0]
    with torch.no_grad():
        ref = hf(torch.tensor([prompt])).last_hidden_state[0, -1]
    np.testing.assert_allclose(np.asarray(out.pooled), ref.numpy(),
                               rtol=1e-4, atol=3e-4)
