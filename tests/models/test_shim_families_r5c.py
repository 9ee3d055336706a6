"""Name-shim families round 5c (QWen v1, ChatGLM, TeleChat2, TeleFLM,
Fairseq2-Llama): semantically the tested qwen2/glm/llama paths under
different checkpoint names/layouts, so parity is checked by RENAMING a
tiny HF checkpoint of the semantic twin into each family's scheme and
asserting token-identical engine output to the twin-served original
(reference: vllm qwen.py, chatglm.py, telechat2.py, teleflm.py,
fairseq2_llama.py)."""

import json
import os

import pytest

torch = pytest.importorskip("torch")

from tests.models.test_shim_families import (  # noqa: E402
    GEOM,
    build_llama,
    generate,
    llama_reference,
    save,
)


def test_qwen_v1_rename_parity(tmp_path):
    # twin: Qwen2 (qkv-bias, RMSNorm, SwiGLU, full neox rope), MHA
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(Qwen2Config(
        **{**GEOM, "num_key_value_heads": GEOM["num_attention_heads"],
           "use_sliding_window": False})).eval().float()
    d1 = os.path.join(str(tmp_path), "qwen2")
    cfg = json.loads(hf.config.to_json_string())
    cfg["architectures"] = ["Qwen2ForCausalLM"]
    save(d1, hf.state_dict(), cfg)
    ref = generate(d1)

    sd = dict(hf.state_dict())
    out = {"transformer.wte.weight": sd.pop("model.embed_tokens.weight"),
           "transformer.ln_f.weight": sd.pop("model.norm.weight"),
           "lm_head.weight": sd.pop("lm_head.weight")}
    for i in range(GEOM["num_hidden_layers"]):
        p, q = f"model.layers.{i}", f"transformer.h.{i}"
        out[f"{q}.attn.c_attn.weight"] = torch.cat(
            [sd.pop(f"{p}.self_attn.{x}_proj.weight") for x in "qkv"])
        out[f"{q}.attn.c_attn.bias"] = torch.cat(
            [sd.pop(f"{p}.self_attn.{x}_proj.bias") for x in "qkv"])
        out[f"{q}.attn.c_proj.weight"] = sd.pop(
            f"{p}.self_attn.o_proj.weight")
        out[f"{q}.ln_1.weight"] = sd.pop(f"{p}.input_layernorm.weight")
        out[f"{q}.ln_2.weight"] = sd.pop(
            f"{p}.post_attention_layernorm.weight")
        out[f"{q}.mlp.w2.weight"] = sd.pop(f"{p}.mlp.gate_proj.weight")
        out[f"{q}.mlp.w1.weight"] = sd.pop(f"{p}.mlp.up_proj.weight")
        out[f"{q}.mlp.c_proj.weight"] = sd.pop(f"{p}.mlp.down_proj.weight")
    assert not sd, sd.keys()
    d2 = os.path.join(str(tmp_path), "qwen1")
    save(d2, out, dict(
        vocab_size=GEOM["vocab_size"], hidden_size=GEOM["hidden_size"],
        # QWen configs state TWICE the ffn width (vllm qwen.py // 2)
        intermediate_size=2 * GEOM["intermediate_size"],
        num_hidden_layers=GEOM["num_hidden_layers"],
        num_attention_heads=GEOM["num_attention_heads"],
        kv_channels=GEOM["hidden_size"] // GEOM["num_attention_heads"],
        seq_length=GEOM["max_position_embeddings"],
        layer_norm_epsilon=GEOM["rms_norm_eps"],
        rotary_emb_base=GEOM["rope_theta"],
        eos_token_id=3, architectures=["QWenLMHeadModel"]))
    assert generate(d2) == ref


def test_chatglm_rename_parity(tmp_path):
    # twin: HF GLM (partial interleaved rotary 0.5, qkv bias, fused
    # gate_up) — what ChatGLM2/3 checkpoints are, renamed
    from transformers import GlmConfig, GlmForCausalLM

    heads, kv = GEOM["num_attention_heads"], 2
    torch.manual_seed(1)
    hf = GlmForCausalLM(GlmConfig(
        **{**GEOM, "num_key_value_heads": kv, "attention_bias": True,
           "partial_rotary_factor": 0.5, "pad_token_id": 0,
           "head_dim": GEOM["hidden_size"] // heads})).eval().float()
    d1 = os.path.join(str(tmp_path), "glm")
    cfg = json.loads(hf.config.to_json_string())
    cfg["architectures"] = ["GlmForCausalLM"]
    save(d1, hf.state_dict(), cfg)
    ref = generate(d1)

    sd = dict(hf.state_dict())
    out = {"transformer.embedding.word_embeddings.weight":
               sd.pop("model.embed_tokens.weight"),
           "transformer.encoder.final_layernorm.weight":
               sd.pop("model.norm.weight"),
           "transformer.output_layer.weight": sd.pop("lm_head.weight")}
    for i in range(GEOM["num_hidden_layers"]):
        p = f"model.layers.{i}"
        q = f"transformer.encoder.layers.{i}"
        out[f"{q}.self_attention.query_key_value.weight"] = torch.cat(
            [sd.pop(f"{p}.self_attn.{x}_proj.weight") for x in "qkv"])
        out[f"{q}.self_attention.query_key_value.bias"] = torch.cat(
            [sd.pop(f"{p}.self_attn.{x}_proj.bias") for x in "qkv"])
        out[f"{q}.self_attention.dense.weight"] = sd.pop(
            f"{p}.self_attn.o_proj.weight")
        out[f"{q}.input_layernorm.weight"] = sd.pop(
            f"{p}.input_layernorm.weight")
        out[f"{q}.post_attention_layernorm.weight"] = sd.pop(
            f"{p}.post_attention_layernorm.weight")
        out[f"{q}.mlp.dense_h_to_4h.weight"] = sd.pop(
            f"{p}.mlp.gate_up_proj.weight")
        out[f"{q}.mlp.dense_4h_to_h.weight"] = sd.pop(
            f"{p}.mlp.down_proj.weight")
    assert not sd, sd.keys()
    d2 = os.path.join(str(tmp_path), "chatglm")
    save(d2, out, dict(
        padded_vocab_size=GEOM["vocab_size"],
        hidden_size=GEOM["hidden_size"],
        ffn_hidden_size=GEOM["intermediate_size"],
        num_layers=GEOM["num_hidden_layers"],
        num_attention_heads=heads,
        multi_query_attention=True, multi_query_group_num=kv,
        add_qkv_bias=True, add_bias_linear=False, rmsnorm=True,
        original_rope=True, rope_ratio=1.0,
        layernorm_epsilon=GEOM["rms_norm_eps"],
        seq_length=GEOM["max_position_embeddings"], eos_token_id=3,
        architectures=["ChatGLMModel"]))
    assert generate(d2) == ref


def test_telechat2_rename_parity(tmp_path):
    # twin: llama with o/down biases only (qkv+gate/up biases zeroed)
    hf = build_llama(tmp_path, kv_heads=GEOM["num_attention_heads"],
                     bias=True)
    # llama attention_bias covers qkv+o; add mlp biases manually is not
    # possible via flag alone -> rebuild with mlp_bias
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(4)
    hf = LlamaForCausalLM(LlamaConfig(
        **{**GEOM, "num_key_value_heads": GEOM["num_attention_heads"],
           "attention_bias": True, "mlp_bias": True})).eval().float()
    sd = dict(hf.state_dict())
    with torch.no_grad():
        for i in range(GEOM["num_hidden_layers"]):
            p = f"model.layers.{i}"
            for k in (f"{p}.self_attn.q_proj.bias",
                      f"{p}.self_attn.k_proj.bias",
                      f"{p}.self_attn.v_proj.bias",
                      f"{p}.mlp.gate_proj.bias",
                      f"{p}.mlp.up_proj.bias"):
                sd[k].zero_()
    ref = llama_reference(
        tmp_path, hf,
        cfg_extra={"attention_bias": True, "mlp_bias": True})

    n, hd = GEOM["num_attention_heads"], \
        GEOM["hidden_size"] // GEOM["num_attention_heads"]
    out = {"transformer.word_embeddings.weight":
               sd.pop("model.embed_tokens.weight"),
           "transformer.ln_f.weight": sd.pop("model.norm.weight"),
           "lm_head.weight": sd.pop("lm_head.weight")}
    for i in range(GEOM["num_hidden_layers"]):
        p, q = f"model.layers.{i}", f"transformer.h.{i}"
        k = sd.pop(f"{p}.self_attn.k_proj.weight").reshape(n, 1, hd, -1)
        v = sd.pop(f"{p}.self_attn.v_proj.weight").reshape(n, 1, hd, -1)
        out[f"{q}.self_attention.key_value.weight"] = torch.cat(
            [k, v], dim=1).reshape(n * 2 * hd, -1)
        out[f"{q}.self_attention.query.weight"] = sd.pop(
            f"{p}.self_attn.q_proj.weight")
        out[f"{q}.self_attention.dense.weight"] = sd.pop(
            f"{p}.self_attn.o_proj.weight")
        out[f"{q}.self_attention.dense.bias"] = sd.pop(
            f"{p}.self_attn.o_proj.bias")
        for name in ("input_layernorm.weight",
                     "post_attention_layernorm.weight",
                     "mlp.gate_proj.weight", "mlp.up_proj.weight",
                     "mlp.down_proj.weight", "mlp.down_proj.bias"):
            out[f"{q}.{name}"] = sd.pop(f"{p}.{name}")
        for drop in ("self_attn.q_proj.bias", "self_attn.k_proj.bias",
                     "self_attn.v_proj.bias", "mlp.gate_proj.bias",
                     "mlp.up_proj.bias"):
            sd.pop(f"{p}.{drop}")
    assert not sd, sd.keys()
    d2 = os.path.join(str(tmp_path), "telechat2")
    save(d2, out, dict(
        vocab_size=GEOM["vocab_size"], hidden_size=GEOM["hidden_size"],
        ffn_hidden_size=GEOM["intermediate_size"],
        n_layer=GEOM["num_hidden_layers"],
        n_head=GEOM["num_attention_heads"],
        layer_norm_epsilon=GEOM["rms_norm_eps"],
        rope_theta=GEOM["rope_theta"],
        seq_length=GEOM["max_position_embeddings"], eos_token_id=3,
        architectures=["TeleChat2ForCausalLM"]))
    assert generate(d2) == ref


def test_teleflm_mup_scaling_parity(tmp_path):
    # input_mult folds into the embedding table; output_mult only scales
    # logits (greedy-invariant) -> TeleFLM(original weights, mup) must
    # equal llama(pre-scaled embeddings)
    hf = build_llama(tmp_path)
    input_mult = 2.0
    sd_scaled = {k: (v * input_mult if k == "model.embed_tokens.weight"
                     else v) for k, v in hf.state_dict().items()}
    d1 = os.path.join(str(tmp_path), "llama_scaled")
    cfg = json.loads(hf.config.to_json_string())
    cfg["architectures"] = ["LlamaForCausalLM"]
    save(d1, sd_scaled, cfg)
    ref = generate(d1)

    d2 = os.path.join(str(tmp_path), "teleflm")
    cfg2 = json.loads(hf.config.to_json_string())
    cfg2.update(architectures=["TeleFLMForCausalLM"], use_mup=True,
                input_mult=input_mult, output_mult=3.0,
                mup_scale_factor=1.5)
    save(d2, hf.state_dict(), cfg2)
    assert generate(d2) == ref


def test_fairseq2_llama_permuted_parity(tmp_path):
    hf = build_llama(tmp_path)
    ref = llama_reference(tmp_path, hf)

    hd = GEOM["hidden_size"] // GEOM["num_attention_heads"]

    def unpermute(w, n_heads):
        # inverse of fairseq2_llama.py permute: rotate-half rows back to
        # the interleaved layout the fairseq2 checkpoint stores
        return (w.reshape(n_heads, 2, hd // 2, -1).transpose(1, 2)
                .reshape(n_heads * hd, -1))

    sd = dict(hf.state_dict())
    out = {"decoder_frontend.embed.weight":
               sd.pop("model.embed_tokens.weight"),
           "decoder.layer_norm.weight": sd.pop("model.norm.weight"),
           "final_proj.weight": sd.pop("lm_head.weight")}
    for i in range(GEOM["num_hidden_layers"]):
        p, q = f"model.layers.{i}", f"decoder.layers.{i}"
        out[f"{q}.self_attn.q_proj.weight"] = unpermute(
            sd.pop(f"{p}.self_attn.q_proj.weight"),
            GEOM["num_attention_heads"])
        out[f"{q}.self_attn.k_proj.weight"] = unpermute(
            sd.pop(f"{p}.self_attn.k_proj.weight"), 2)
        out[f"{q}.self_attn.v_proj.weight"] = sd.pop(
            f"{p}.self_attn.v_proj.weight")
        out[f"{q}.self_attn.output_proj.weight"] = sd.pop(
            f"{p}.self_attn.o_proj.weight")
        out[f"{q}.self_attn_layer_norm.weight"] = sd.pop(
            f"{p}.input_layernorm.weight")
        out[f"{q}.ffn_layer_norm.weight"] = sd.pop(
            f"{p}.post_attention_layernorm.weight")
        out[f"{q}.ffn.gate_proj.weight"] = sd.pop(
            f"{p}.mlp.gate_proj.weight")
        out[f"{q}.ffn.inner_proj.weight"] = sd.pop(
            f"{p}.mlp.up_proj.weight")
        out[f"{q}.ffn.output_proj.weight"] = sd.pop(
            f"{p}.mlp.down_proj.weight")
    assert not sd, sd.keys()
    d2 = os.path.join(str(tmp_path), "fairseq2")
    # the fairseq2 torch-pickle container (model.pt with the model_key
    # wrapper) — exercises the SafetensorsReader .pt fallback
    os.makedirs(d2, exist_ok=True)
    torch.save({"model_key": "llama", "llama": out},
               os.path.join(d2, "model.pt"))
    cfg = json.loads(hf.config.to_json_string())
    cfg["architectures"] = ["Fairseq2LlamaForCausalLM"]
    with open(os.path.join(d2, "config.json"), "w") as f:
        json.dump(cfg, f)
    assert generate(d2) == ref


def test_solar_no_blend_equals_llama(tmp_path):
    # bskcn_tv[1] == 0 -> the skip blends are inert; SOLAR must serve a
    # llama checkpoint identically (validates naming/config intake)
    hf = build_llama(tmp_path)
    ref = llama_reference(tmp_path, hf)
    d = os.path.join(str(tmp_path), "solar0")
    cfg = json.loads(hf.config.to_json_string())
    cfg.update(architectures=["SolarForCausalLM"],
               bskcn_1=[0], bskcn_3=[1], bskcn_tv=[0.9, 0.0])
    save(d, hf.state_dict(), cfg)
    assert generate(d) == ref


def test_solar_full_blend_skips_layers(tmp_path):
    # tv == 1 with snapshot at layer 0's input restored at layer 1's
    # input makes layer 0 a pure no-op: output must equal a 1-layer
    # llama built from layer 1's weights (reference solar.py:341-344)
    hf = build_llama(tmp_path)
    sd = dict(hf.state_dict())
    d = os.path.join(str(tmp_path), "solar1")
    cfg = json.loads(hf.config.to_json_string())
    cfg.update(architectures=["SolarForCausalLM"],
               bskcn_1=[0], bskcn_3=[1], bskcn_tv=[0.9, 1.0])
    save(d, sd, cfg)
    got = generate(d)

    one = {"model.embed_tokens.weight": sd["model.embed_tokens.weight"],
           "model.norm.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    for k, v in sd.items():
        if k.startswith("model.layers.1."):
            one[k.replace("model.layers.1.", "model.layers.0.")] = v
    d2 = os.path.join(str(tmp_path), "llama_l1")
    cfg2 = json.loads(hf.config.to_json_string())
    cfg2.update(architectures=["LlamaForCausalLM"], num_hidden_layers=1)
    save(d2, one, cfg2)
    assert got == generate(d2)


def test_bailing_moe_rename_parity(tmp_path):
    # twin: HF Glm4Moe (dense prefix + sigmoid/correction-bias routing +
    # shared experts, partial rotary 0.5) renamed into Bailing's fused
    # query_key_value / gate_up_proj / word_embeddings scheme
    import torch as _torch
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    geom = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                moe_intermediate_size=32, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                head_dim=16, n_routed_experts=4, n_shared_experts=1,
                num_experts_per_tok=2, first_k_dense_replace=1,
                n_group=2, topk_group=2, routed_scaling_factor=1.5,
                norm_topk_prob=True, partial_rotary_factor=0.5,
                attention_bias=True, use_qk_norm=False,
                rms_norm_eps=1e-5, rope_theta=10_000.0,
                max_position_embeddings=256, pad_token_id=0,
                eos_token_id=3, tie_word_embeddings=False)
    torch.manual_seed(12)
    hf = Glm4MoeForCausalLM(Glm4MoeConfig(**geom)).eval().float()
    d1 = os.path.join(str(tmp_path), "glm4moe")
    cfg1 = json.loads(hf.config.to_json_string())
    cfg1["architectures"] = ["Glm4MoeForCausalLM"]
    save(d1, hf.state_dict(), cfg1)
    ref = generate(d1)

    sd = dict(hf.state_dict())
    out = {}
    for k in list(sd):
        if k not in sd:
            continue            # consumed with a fused partner
        v = sd.pop(k)
        if ".self_attn.q_proj." in k:
            p, leaf = k.rsplit(".self_attn.q_proj.", 1)
            out[f"{p}.attention.query_key_value.{leaf}"] = _torch.cat([
                v, sd.pop(f"{p}.self_attn.k_proj.{leaf}"),
                sd.pop(f"{p}.self_attn.v_proj.{leaf}")])
        elif ".self_attn.o_proj." in k:
            out[k.replace(".self_attn.o_proj.", ".attention.dense.")] = v
        elif k.endswith("mlp.gate_proj.weight"):
            p = k[:-len("gate_proj.weight")]
            out[f"{p}gate_up_proj.weight"] = _torch.cat(
                [v, sd.pop(f"{p}up_proj.weight")])
        elif k.endswith("mlp.shared_experts.gate_proj.weight"):
            p = k[:-len("gate_proj.weight")]
            out[f"{p}gate_up_proj.weight"] = _torch.cat(
                [v, sd.pop(f"{p}up_proj.weight")])
        elif k == "model.embed_tokens.weight":
            out["model.word_embeddings.weight"] = v
        elif k.endswith("mlp.gate.e_score_correction_bias"):
            out[k.replace("e_score_correction_bias", "expert_bias")] = v
        else:
            out[k] = v
    assert not sd, sd.keys()
    d2 = os.path.join(str(tmp_path), "bailing")
    cfg2 = dict(
        vocab_size=geom["vocab_size"], hidden_size=geom["hidden_size"],
        intermediate_size=geom["intermediate_size"],
        moe_intermediate_size=geom["moe_intermediate_size"],
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, num_experts=4,
        num_shared_experts=1, num_experts_per_tok=2,
        first_k_dense_replace=1, n_group=2, topk_group=2,
        routed_scaling_factor=1.5, norm_topk_prob=True,
        partial_rotary_factor=0.5, use_qkv_bias=True, use_bias=False,
        score_function="sigmoid", rms_norm_eps=1e-5,
        rope_theta=10_000.0, max_position_embeddings=256,
        eos_token_id=3, tie_word_embeddings=False,
        architectures=["BailingMoeForCausalLM"])
    save(d2, out, cfg2)
    assert generate(d2) == ref
