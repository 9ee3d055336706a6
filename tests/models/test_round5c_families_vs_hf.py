"""Numerics parity for the round-5c model families vs HuggingFace torch:
Apertus (xIELU non-gated MLP with per-layer learnable alphas + qk-norm),
dots.llm1 (qk-norm + DeepSeek-V3 sigmoid/correction-bias routing).

Same strategy as test_model_families_vs_hf.py: seeded random HF model,
token-level logit comparison through our paged forward.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.models.test_model_families_vs_hf import run_prefill  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402

COMMON = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    eos_token_id=3,
    bos_token_id=2,
)


def check(module, cfg, hf, seq=37, atol=3e-4, seed=0):
    params = module.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    token_ids = rng.integers(0, cfg.vocab_size, size=seq).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours = run_prefill(module, cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=atol, rtol=2e-3)


def test_apertus_prefill_matches_hf():
    from transformers import ApertusConfig as HFCfg
    from transformers import ApertusForCausalLM

    from vllm_trianglemix_tpu.models import apertus

    hf_kw = dict(COMMON, rms_norm_eps=1e-5, rope_theta=12_000_000.0,
                 rope_scaling={"rope_type": "llama3", "factor": 8.0,
                               "original_max_position_embeddings": 64,
                               "low_freq_factor": 1.0,
                               "high_freq_factor": 4.0},
                 attention_bias=False, tie_word_embeddings=False,
                 hidden_act="xielu")
    torch.manual_seed(0)
    hf = ApertusForCausalLM(HFCfg(**hf_kw)).eval().float()
    sd = hf.state_dict()
    assert "model.layers.0.mlp.act_fn.alpha_p" in sd
    assert not any("gate_proj" in k for k in sd)
    cfg = apertus.ApertusConfig.from_hf_config(hf_kw)
    assert not cfg.gated_mlp and cfg.hidden_act == "xielu"
    assert cfg.use_qk_norm and cfg.rope_scaling is not None
    check(apertus, cfg, hf)


def test_apertus_attention_bias_variant_matches_hf():
    from transformers import ApertusConfig as HFCfg
    from transformers import ApertusForCausalLM

    from vllm_trianglemix_tpu.models import apertus

    hf_kw = dict(COMMON, rms_norm_eps=1e-5, rope_theta=10_000.0,
                 rope_scaling=None, attention_bias=True,
                 tie_word_embeddings=True, hidden_act="xielu")
    torch.manual_seed(1)
    hf = ApertusForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert "model.layers.0.self_attn.o_proj.bias" in hf.state_dict()
    cfg = apertus.ApertusConfig.from_hf_config(hf_kw)
    assert cfg.use_qkv_bias and cfg.use_o_bias and cfg.tie_word_embeddings
    check(apertus, cfg, hf)


def _dots1_kw(**over):
    kw = dict(COMMON, rms_norm_eps=1e-6, rope_theta=10_000.0,
              n_routed_experts=4, num_experts_per_tok=2,
              moe_intermediate_size=32, n_shared_experts=1,
              n_group=2, topk_group=2, routed_scaling_factor=2.5,
              norm_topk_prob=True, first_k_dense_replace=1,
              attention_bias=False, tie_word_embeddings=False,
              sliding_window=None,
              layer_types=["full_attention"] * COMMON["num_hidden_layers"])
    kw.update(over)
    return kw


def test_dots1_prefill_matches_hf():
    from transformers import Dots1Config as HFCfg
    from transformers import Dots1ForCausalLM

    from vllm_trianglemix_tpu.models import dots1

    hf_kw = _dots1_kw()
    torch.manual_seed(2)
    hf = Dots1ForCausalLM(HFCfg(**hf_kw)).eval().float()
    sd = hf.state_dict()
    # layer 0 dense, layer 1 MoE with correction bias + shared experts
    assert "model.layers.0.mlp.gate_proj.weight" in sd
    assert "model.layers.1.mlp.gate.e_score_correction_bias" in sd
    assert "model.layers.1.mlp.shared_experts.gate_proj.weight" in sd
    # make the correction bias matter for selection
    with torch.no_grad():
        sd["model.layers.1.mlp.gate.e_score_correction_bias"].copy_(
            torch.tensor([1.0, -1.0, 0.5, -0.5]))
    cfg = dots1.Dots1Config.from_hf_config(hf_kw)
    assert cfg.use_qk_norm and cfg.scoring_func == "sigmoid"
    assert cfg.partial_rotary_factor == 1.0
    check(dots1, cfg, hf)


def test_dots1_all_moe_no_dense_prefix_matches_hf():
    from transformers import Dots1Config as HFCfg
    from transformers import Dots1ForCausalLM

    from vllm_trianglemix_tpu.models import dots1

    hf_kw = _dots1_kw(first_k_dense_replace=0, norm_topk_prob=False,
                      n_group=1, topk_group=1, routed_scaling_factor=1.0)
    torch.manual_seed(3)
    hf = Dots1ForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert "model.layers.0.mlp.gate.weight" in hf.state_dict()
    cfg = dots1.Dots1Config.from_hf_config(hf_kw)
    assert cfg.first_k_dense_replace == 0 and not cfg.norm_topk_prob
    check(dots1, cfg, hf)


def test_dots1_sliding_layer_types_rejected():
    from vllm_trianglemix_tpu.models import dots1

    with pytest.raises(ValueError, match="sliding"):
        dots1.Dots1Config.from_hf_config(
            _dots1_kw(layer_types=["sliding_attention", "full_attention"]))


def _llama4_kw(**over):
    kw = dict(COMMON, head_dim=16, rms_norm_eps=1e-5,
              rope_theta=500_000.0, rope_scaling=None,
              num_hidden_layers=4, no_rope_layer_interval=4,
              interleave_moe_layer_step=2, num_local_experts=4,
              num_experts_per_tok=2, intermediate_size=32,
              intermediate_size_mlp=128, use_qk_norm=True,
              attn_temperature_tuning=True, floor_scale=8.0,
              attn_scale=0.1, attention_chunk_size=16,
              tie_word_embeddings=False, pad_token_id=0)
    kw.update(over)
    return kw


def test_llama4_text_prefill_matches_hf():
    from transformers import Llama4ForCausalLM
    from transformers import Llama4TextConfig as HFCfg

    from vllm_trianglemix_tpu.models import llama4

    hf_kw = _llama4_kw()
    torch.manual_seed(5)
    hf = Llama4ForCausalLM(HFCfg(**hf_kw)).eval().float()
    sd = hf.state_dict()
    # layer 0 dense / layer 1 MoE / layer 3 NoPE-full per the defaults
    assert "model.layers.0.feed_forward.gate_proj.weight" in sd
    assert "model.layers.1.feed_forward.experts.gate_up_proj" in sd
    assert "model.layers.1.feed_forward.shared_expert.gate_proj.weight" in sd
    cfg = llama4.Llama4Config.from_hf_config(hf_kw)
    assert cfg.rope_layers == (1, 1, 1, 0)
    assert cfg.moe_layer_flags == (0, 1, 0, 1)
    assert cfg.layer_types == ("chunked_attention",) * 3 + (
        "full_attention",)
    check(llama4, cfg, hf, seq=37, atol=5e-4)


def test_llama4_text_llama3_rope_and_128e_no_qknorm_matches_hf():
    from transformers import Llama4ForCausalLM
    from transformers import Llama4TextConfig as HFCfg

    from vllm_trianglemix_tpu.models import llama4

    hf_kw = _llama4_kw(
        use_qk_norm=False, interleave_moe_layer_step=1,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "original_max_position_embeddings": 64,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0})
    torch.manual_seed(6)
    hf = Llama4ForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert "model.layers.0.feed_forward.experts.gate_up_proj" \
        in hf.state_dict()
    cfg = llama4.Llama4Config.from_hf_config(hf_kw)
    assert cfg.moe_layer_flags == (1, 1, 1, 1)
    assert not cfg.use_qk_norm and cfg.rope_scaling is not None
    check(llama4, cfg, hf, seq=37, atol=5e-4)


def test_llama4_engine_greedy_matches_hf(tmp_path):
    """e2e: chunked-local + full KV-cache groups through the engine."""
    import json

    from safetensors.torch import save_file
    from transformers import Llama4ForCausalLM
    from transformers import Llama4TextConfig as HFCfg

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    hf_kw = _llama4_kw()
    torch.manual_seed(7)
    hf = Llama4ForCausalLM(HFCfg(**hf_kw)).eval().float()
    d = tmp_path / "llama4"
    d.mkdir()
    cfg_dict = json.loads(hf.config.to_json_string())
    cfg_dict["architectures"] = ["Llama4ForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    save_file({k: v.clone().contiguous()
               for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=32,
              skip_tokenizer_init=True)
    prompt = list(range(5, 30))     # longer than the 16-token chunk
    out = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True))[0]
    got = list(out.outputs[0].token_ids)
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor([prompt]),
                          do_sample=False, max_new_tokens=6,
                          eos_token_id=None)[0, len(prompt):].tolist()
    assert got == ref


def test_hunyuan_moe_prefill_matches_hf():
    from transformers import HunYuanMoEV1Config as HFCfg
    from transformers import HunYuanMoEV1ForCausalLM

    from vllm_trianglemix_tpu.models import hunyuan

    hf_kw = dict(COMMON, head_dim=16, attention_head_dim=16,
                 rope_theta=10_000.0, rms_norm_eps=1e-5,
                 num_experts=4, moe_topk=2, use_mixed_mlp_moe=1,
                 num_shared_expert=1, moe_intermediate_size=32,
                 tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(9)
    hf = HunYuanMoEV1ForCausalLM(HFCfg(**hf_kw)).eval().float()
    sd = hf.state_dict()
    assert "model.layers.0.mlp.gate.wg.weight" in sd
    cfg = hunyuan.HunYuanMoEConfig.from_hf_config(hf_kw)
    assert cfg.num_experts == 4 and cfg.norm_topk_prob
    assert cfg.shared_expert_intermediate_size == COMMON[
        "intermediate_size"]
    check(hunyuan, cfg, hf, seq=33)


def _jais_torch_reference(sd, cfg, token_ids):
    """Independent torch forward for JAIS semantics (vllm jais.py):
    GPT-2 blocks + ALiBi + SwiGLU + muP scales."""
    import math

    from vllm_trianglemix_tpu.models.decoder import (
        alibi_slopes_closest_pow2,
    )

    d, heads = cfg["n_embd"], cfg["n_head"]
    hd = d // heads
    x = torch.tensor(sd["transformer.wte.weight"])[
        torch.tensor(token_ids)] * cfg["embeddings_scale"]
    T = len(token_ids)
    slopes = torch.tensor(alibi_slopes_closest_pow2(heads))
    pos = torch.arange(T)
    # relative form -slope * (q - k); equal to ours by shift-invariance
    bias = -slopes[:, None, None] * (pos[None, None, :] * -1
                                     + pos[None, :, None])
    causal = torch.where(pos[None, :] <= pos[:, None], 0.0, -1e30)
    scale = hd ** (-1.0 if cfg["mup_scale_qk_dot_by_d"] else -0.5)

    def ln(v, w, b):
        return torch.nn.functional.layer_norm(
            v, (d,), torch.tensor(sd[w]), torch.tensor(sd[b]),
            cfg["layer_norm_epsilon"])

    for i in range(cfg["n_layer"]):
        p = f"transformer.h.{i}"
        h = ln(x, f"{p}.ln_1.weight", f"{p}.ln_1.bias")
        qkv = h @ torch.tensor(sd[f"{p}.attn.c_attn.weight"]) \
            + torch.tensor(sd[f"{p}.attn.c_attn.bias"])
        q, k, v = qkv.split(d, dim=-1)
        q = q.view(T, heads, hd).transpose(0, 1)
        k = k.view(T, heads, hd).transpose(0, 1)
        v = v.view(T, heads, hd).transpose(0, 1)
        s = (q @ k.transpose(-1, -2)) * scale + bias + causal[None]
        a = torch.softmax(s, dim=-1) @ v
        a = a.transpose(0, 1).reshape(T, d)
        x = x + a @ torch.tensor(sd[f"{p}.attn.c_proj.weight"]) \
            + torch.tensor(sd[f"{p}.attn.c_proj.bias"])
        h2 = ln(x, f"{p}.ln_2.weight", f"{p}.ln_2.bias")
        up = h2 @ torch.tensor(sd[f"{p}.mlp.c_fc.weight"]) \
            + torch.tensor(sd[f"{p}.mlp.c_fc.bias"])
        gate = h2 @ torch.tensor(sd[f"{p}.mlp.c_fc2.weight"]) \
            + torch.tensor(sd[f"{p}.mlp.c_fc2.bias"])
        m = up * torch.nn.functional.silu(gate)
        x = x + m @ torch.tensor(sd[f"{p}.mlp.c_proj.weight"]) \
            + torch.tensor(sd[f"{p}.mlp.c_proj.bias"])
    x = ln(x, "transformer.ln_f.weight", "transformer.ln_f.bias")
    return (x @ torch.tensor(sd["transformer.wte.weight"]).T
            ) * cfg["width_scale"]


@pytest.mark.parametrize("scale_by_d", [False, True])
def test_jais_prefill_matches_torch_reference(scale_by_d):
    import jax.numpy as jnp

    from vllm_trianglemix_tpu.models import jais

    torch.manual_seed(10)
    d, heads, L, inner, V = 64, 4, 2, 96, 512
    cfg_d = dict(vocab_size=V, n_embd=d, n_head=heads, n_layer=L,
                 n_inner=inner, n_positions=256,
                 layer_norm_epsilon=1e-5, activation_function="swiglu",
                 position_embedding_type="alibi",
                 embeddings_scale=2.5, width_scale=0.4,
                 mup_scale_qk_dot_by_d=scale_by_d,
                 tie_word_embeddings=True, eos_token_id=0)
    sd = {"transformer.wte.weight": torch.randn(V, d) * 0.05,
          "transformer.ln_f.weight": torch.randn(d) * 0.1 + 1,
          "transformer.ln_f.bias": torch.randn(d) * 0.05}
    for i in range(L):
        p = f"transformer.h.{i}"
        sd[f"{p}.ln_1.weight"] = torch.randn(d) * 0.1 + 1
        sd[f"{p}.ln_1.bias"] = torch.randn(d) * 0.05
        sd[f"{p}.ln_2.weight"] = torch.randn(d) * 0.1 + 1
        sd[f"{p}.ln_2.bias"] = torch.randn(d) * 0.05
        sd[f"{p}.attn.c_attn.weight"] = torch.randn(d, 3 * d) * 0.05
        sd[f"{p}.attn.c_attn.bias"] = torch.randn(3 * d) * 0.02
        sd[f"{p}.attn.c_proj.weight"] = torch.randn(d, d) * 0.05
        sd[f"{p}.attn.c_proj.bias"] = torch.randn(d) * 0.02
        sd[f"{p}.mlp.c_fc.weight"] = torch.randn(d, inner) * 0.05
        sd[f"{p}.mlp.c_fc.bias"] = torch.randn(inner) * 0.02
        sd[f"{p}.mlp.c_fc2.weight"] = torch.randn(d, inner) * 0.05
        sd[f"{p}.mlp.c_fc2.bias"] = torch.randn(inner) * 0.02
        sd[f"{p}.mlp.c_proj.weight"] = torch.randn(inner, d) * 0.05
        sd[f"{p}.mlp.c_proj.bias"] = torch.randn(d) * 0.02

    cfg = jais.JaisConfig.from_hf_config(cfg_d)
    assert cfg.alibi_slopes and cfg.embedding_multiplier == 2.5
    assert abs(cfg.logits_scaling - 2.5) < 1e-9
    params = jais.params_from_hf_state_dict(
        cfg, lambda n: sd[n].numpy(), dtype=jnp.float32)
    token_ids = np.random.default_rng(1).integers(
        0, V, size=21).tolist()
    with torch.no_grad():
        ref = _jais_torch_reference(
            {k: v.numpy() for k, v in sd.items()}, cfg_d,
            token_ids).numpy()
    ours = run_prefill(jais, cfg, params, token_ids)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=2e-3)


def _grok1_torch_reference(sd, gcfg, token_ids):
    """Independent torch forward for Grok-1 semantics (vllm grok1.py):
    sandwich RMSNorms, soft-capped attention + router logits,
    renormalized top-2 MoE, muP multipliers."""
    d, heads, kv = gcfg["hidden_size"], gcfg["num_attention_heads"], \
        gcfg["num_key_value_heads"]
    hd = d // heads
    E, K = gcfg["num_experts"], 2
    T = len(token_ids)
    x = torch.tensor(sd["model.embed_tokens.weight"])[
        torch.tensor(token_ids)] * gcfg["embedding_multiplier_scale"]

    def rms(v, w):
        vf = v.float()
        return (vf * torch.rsqrt(vf.pow(2).mean(-1, keepdim=True) + 1e-5)
                * torch.tensor(sd[w]))

    pos = torch.arange(T).float()
    inv = 1.0 / (10_000.0 ** (torch.arange(0, hd, 2).float() / hd))
    ang = pos[:, None] * inv[None, :]
    cos, sin = torch.cos(ang), torch.sin(ang)

    def rope(t, n):
        t = t.view(T, n, hd)
        t1, t2 = t[..., :hd // 2], t[..., hd // 2:]
        return torch.cat([t1 * cos[:, None] - t2 * sin[:, None],
                          t2 * cos[:, None] + t1 * sin[:, None]], -1)

    causal = torch.where(pos[None, :] <= pos[:, None], 0.0, -1e30)
    for i in range(gcfg["num_hidden_layers"]):
        p = f"model.layers.{i}"
        h = rms(x, f"{p}.pre_attn_norm.scale")
        q = rope(h @ torch.tensor(sd[f"{p}.attn.q_proj.weight"]).T, heads)
        k = rope(h @ torch.tensor(sd[f"{p}.attn.k_proj.weight"]).T, kv)
        v = (h @ torch.tensor(sd[f"{p}.attn.v_proj.weight"]).T
             ).view(T, kv, hd)
        g = heads // kv
        kx = k.repeat_interleave(g, dim=1)
        vx = v.repeat_interleave(g, dim=1)
        s = torch.einsum("qhd,khd->hqk", q, kx) * hd ** -0.5
        s = 30.0 * torch.tanh(s / 30.0) + causal[None]
        a = torch.einsum("hqk,khd->qhd", torch.softmax(s, -1), vx)
        a = a.reshape(T, d) @ torch.tensor(
            sd[f"{p}.attn.o_proj.weight"]).T
        a = a * gcfg["attn_output_multiplier"]
        x = x + rms(a, f"{p}.post_attn_norm.scale")
        h2 = rms(x, f"{p}.pre_moe_norm.scale")
        logits = h2 @ torch.tensor(
            sd[f"{p}.moe_block.gate.weight"]).T
        logits = 30.0 * torch.tanh(logits / 30.0)
        probs = torch.softmax(logits, -1)
        topv, topi = torch.topk(probs, K, dim=-1)
        topv = topv / topv.sum(-1, keepdim=True)
        out = torch.zeros_like(h2)
        for e in range(E):
            w1 = torch.tensor(
                sd[f"{p}.moe_block.experts.{e}.linear.weight"])
            wv = torch.tensor(
                sd[f"{p}.moe_block.experts.{e}.linear_v.weight"])
            w2 = torch.tensor(
                sd[f"{p}.moe_block.experts.{e}.linear_1.weight"])
            y = (torch.nn.functional.silu(h2 @ w1.T) * (h2 @ wv.T)) @ w2.T
            wsel = (topi == e).float() * topv
            out = out + wsel.sum(-1, keepdim=True) * y
        x = x + rms(out, f"{p}.post_moe_norm.scale")
    x = rms(x, "model.norm.scale")
    return (x @ torch.tensor(sd["model.embed_tokens.weight"]).T
            ) * gcfg["output_multiplier_scale"]


def test_grok1_prefill_matches_torch_reference():
    import jax.numpy as jnp

    from vllm_trianglemix_tpu.models import grok1

    torch.manual_seed(11)
    d, heads, kv, L, V, E, I = 64, 4, 2, 2, 512, 4, 32
    gcfg = dict(vocab_size=V, hidden_size=d, num_attention_heads=heads,
                num_key_value_heads=kv, num_hidden_layers=L,
                intermediate_size=I, num_experts=E,
                num_experts_per_tok=2, moe_intermediate_size=I,
                rms_norm_eps=1e-5, rope_theta=10_000.0,
                embedding_multiplier_scale=5.0,
                output_multiplier_scale=0.25,
                attn_output_multiplier=0.7,
                attn_logit_softcapping=30.0,
                tie_word_embeddings=True, eos_token_id=2)
    sd = {"model.embed_tokens.weight": torch.randn(V, d) * 0.05,
          "model.norm.scale": torch.randn(d) * 0.1 + 1}
    for i in range(L):
        p = f"model.layers.{i}"
        for n in ("pre_attn_norm", "post_attn_norm", "pre_moe_norm",
                  "post_moe_norm"):
            sd[f"{p}.{n}.scale"] = torch.randn(d) * 0.1 + 1
        sd[f"{p}.attn.q_proj.weight"] = torch.randn(d, d) * 0.05
        sd[f"{p}.attn.k_proj.weight"] = torch.randn(kv * 16, d) * 0.05
        sd[f"{p}.attn.v_proj.weight"] = torch.randn(kv * 16, d) * 0.05
        sd[f"{p}.attn.o_proj.weight"] = torch.randn(d, d) * 0.05
        sd[f"{p}.moe_block.gate.weight"] = torch.randn(E, d) * 0.5
        for e in range(E):
            q = f"{p}.moe_block.experts.{e}"
            sd[f"{q}.linear.weight"] = torch.randn(I, d) * 0.05
            sd[f"{q}.linear_v.weight"] = torch.randn(I, d) * 0.05
            sd[f"{q}.linear_1.weight"] = torch.randn(d, I) * 0.05

    cfg = grok1.Grok1Config.from_hf_config(gcfg)
    assert cfg.sandwich_norm and cfg.attn_soft_cap == 30.0
    assert cfg.router_logit_softcapping == 30.0
    params = grok1.params_from_hf_state_dict(
        cfg, lambda n: sd[n].numpy(), dtype=jnp.float32)
    token_ids = np.random.default_rng(2).integers(0, V, size=19).tolist()
    with torch.no_grad():
        ref = _grok1_torch_reference(
            {k: v.numpy() for k, v in sd.items()}, gcfg,
            token_ids).numpy()
    ours = run_prefill(grok1, cfg, params, token_ids)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=2e-3)
