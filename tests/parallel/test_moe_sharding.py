"""MoE grouped-GEMM under a (dp, tp) mesh.

The expert stacks are ffn-sharded over tp (models/decoder.py
partition_specs); ``lax.ragged_dot`` must partition correctly under the
XLA SPMD partitioner and reproduce the unsharded result.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import vllm_trianglemix_tpu.models.decoder as dec

HF_CFG = {
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 16, "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0, "tie_word_embeddings": True,
    "num_experts": 8, "num_experts_per_tok": 2,
    "moe_intermediate_size": 32, "norm_topk_prob": True,
}


def test_moe_grouped_gemm_sharded_matches_unsharded():
    cfg = dec.DecoderConfig.from_hf_config(HF_CFG)
    params = dec.init_random(cfg, seed=0, dtype=jnp.float32)
    specs = dec.partition_specs(cfg)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    sharded = jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, P))

    lp_sharded = jax.tree.map(lambda a: a[0], sharded["layers"])
    lp_host = jax.tree.map(lambda a: a[0], params["layers"])
    h = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 64)), jnp.float32)

    with jax.set_mesh(mesh):
        out = jax.jit(lambda h, lp: dec._moe_mlp(h, lp, cfg))(h, lp_sharded)
    ref = dec._moe_mlp(h, lp_host, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_moe_routing_only_topk_experts_contribute():
    # Zero out one expert's weights: tokens routed there lose exactly
    # that expert's contribution, others are untouched.
    cfg = dec.DecoderConfig.from_hf_config(HF_CFG)
    params = dec.init_random(cfg, seed=1, dtype=jnp.float32)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    h = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 64)), jnp.float32)

    logits = (h @ lp["moe_gate"]).astype(jnp.float32)
    topi = np.asarray(jax.lax.top_k(jax.nn.softmax(logits, -1), 2)[1])
    dead = 0
    untouched_rows = [i for i in range(8) if dead not in topi[i]]

    out_full = np.asarray(dec._moe_mlp(h, lp, cfg))
    lp2 = dict(lp)
    lp2["down_proj"] = lp["down_proj"].at[dead].set(0.0)
    out_dead = np.asarray(dec._moe_mlp(h, lp2, cfg))
    for i in untouched_rows:
        np.testing.assert_allclose(out_full[i], out_dead[i], atol=1e-6)
