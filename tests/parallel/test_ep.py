"""Expert parallelism (parallel/ep.py): E-axis sharding + routing.

Exactness contract: with capacity_factor=None the EP path must match the
single-device grouped GEMM bit-for-bit semantics (same routing, same
expert math, one psum combine).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import vllm_trianglemix_tpu.models.decoder as dec
from vllm_trianglemix_tpu.parallel.ep import ep_moe_mlp, ep_partition_specs

HF_CFG = {
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 16, "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0, "tie_word_embeddings": True,
    "num_experts": 8, "num_experts_per_tok": 2,
    "moe_intermediate_size": 32, "norm_topk_prob": True,
}


@pytest.fixture(scope="module")
def setup():
    cfg = dec.DecoderConfig.from_hf_config(HF_CFG)
    params = dec.init_random(cfg, seed=0, dtype=jnp.float32)
    lp_host = jax.tree.map(lambda a: a[0], params["layers"])
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    specs = ep_partition_specs("tp")
    lp_ep = dict(lp_host)
    for k, s in specs.items():
        # drop the layer axis of the [L, ...] spec for per-layer slices
        lp_ep[k] = jax.device_put(lp_host[k],
                                  NamedSharding(mesh, P(*s[1:])))
    h = jnp.asarray(np.random.default_rng(0).normal(size=(16, 64)),
                    jnp.float32)
    return cfg, mesh, lp_host, lp_ep, h


def test_ep_exact_matches_single_device(setup):
    cfg, mesh, lp_host, lp_ep, h = setup
    out = jax.jit(lambda h, lp: ep_moe_mlp(h, lp, cfg, mesh))(h, lp_ep)
    ref = dec._moe_mlp(h, lp_host, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ep_capacity_factor_bounds_work(setup):
    cfg, mesh, lp_host, lp_ep, h = setup
    out = jax.jit(lambda h, lp: ep_moe_mlp(
        h, lp, cfg, mesh, capacity_factor=4.0))(h, lp_ep)
    ref = dec._moe_mlp(h, lp_host, cfg)
    # generous capacity: still exact on this small batch
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ep_tiny_capacity_drops_but_stays_finite(setup):
    cfg, mesh, lp_host, lp_ep, h = setup
    out = jax.jit(lambda h, lp: ep_moe_mlp(
        h, lp, cfg, mesh, capacity_factor=0.25))(h, lp_ep)
    assert np.isfinite(np.asarray(out)).all()


def test_ep_through_full_forward(setup):
    # forward(moe_fn=ep path) must match forward(default MoE) end to end.
    from functools import partial

    from tests.models.test_qwen3_vs_hf import single_seq_metadata
    from vllm_trianglemix_tpu.attention.backend import kv_cache_shape
    from vllm_trianglemix_tpu.config import TriangleMixConfig

    cfg, mesh, _, _, _ = setup
    params = dec.init_random(cfg, seed=2, dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(3).integers(0, 128, size=12), jnp.int32)
    block_size = 8
    num_blocks = 4

    def run(moe_fn, p):
        kv = jnp.zeros((cfg.num_hidden_layers,
                        *kv_cache_shape(num_blocks, block_size,
                                        cfg.num_key_value_heads,
                                        cfg.head_dim)), jnp.float32)
        md = single_seq_metadata(12, block_size, num_blocks)
        hidden, _ = dec.forward(p, cfg, TriangleMixConfig(), tokens, kv, md,
                                jnp.zeros(cfg.num_hidden_layers, bool),
                                moe_fn=moe_fn)
        return np.asarray(hidden)

    ref = run(None, params)
    specs = ep_partition_specs("tp")
    p_ep = dict(params)
    p_ep["layers"] = {
        k: (jax.device_put(v, NamedSharding(mesh, specs[k]))
            if k in specs else v)
        for k, v in params["layers"].items()
    }
    got = run(partial(ep_moe_mlp, mesh=mesh, ep_axis="tp"), p_ep)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
