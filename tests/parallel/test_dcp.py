"""Decode context parallelism: sharded-KV attention must equal the
single-device reference exactly (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tests.attention.test_pallas_kernel import build_batch
from vllm_trianglemix_tpu.attention.backend import ragged_paged_attention_xla
from vllm_trianglemix_tpu.parallel.dcp import dcp_ragged_attention


@pytest.mark.parametrize("cp", [2, 4])
def test_dcp_matches_single_device(cp):
    devices = np.array(jax.devices()[:cp])
    mesh = Mesh(devices, ("cp",))

    # decode-heavy ragged batch; pages divisible by cp via max_blocks
    seqs = [(1, 60, 59), (1, 33, 32), (4, 20, 20), (1, 50, 49)]
    q, cache, md = build_batch(seqs, num_kv_heads=4, num_q_heads=8,
                               head_dim=32, max_blocks=4, dtype=jnp.float32)
    scale = 32 ** -0.5
    ref = ragged_paged_attention_xla(q, cache, md, False, scale=scale,
                                    sink=4, window=32, last=64,
                                    dense_threshold=2048)
    with mesh:
        got = dcp_ragged_attention(q, cache, md, mesh, scale=scale)
    T = int(md.query_start_loc[-1])
    np.testing.assert_allclose(np.asarray(got[:T]), np.asarray(ref[:T]),
                               atol=2e-5, rtol=2e-5)


def test_dcp_rejects_odd_pages():
    devices = np.array(jax.devices()[:2])
    mesh = Mesh(devices, ("cp",))
    seqs = [(1, 20, 19)]
    q, cache, md = build_batch(seqs, num_kv_heads=2, num_q_heads=2,
                               head_dim=32, max_blocks=3, dtype=jnp.float32)
    with pytest.raises(ValueError):
        with mesh:
            dcp_ragged_attention(q, cache, md, mesh, scale=1.0)
