"""Pipeline parallelism: decoder layers sharded in stages over a `pp`
mesh axis.

Role of the reference's PP stack (vllm/distributed/parallel_state.py
`_PP` group, `PPMissingLayer` layer-range partitioning in
model_executor/models/utils.py, `IntermediateTensors` send/recv between
ranks, and the engine's batch-queue pipelining, v1/engine/core.py:300) —
re-designed TPU-first:

- Stage s holds layers [s*L/P, (s+1)*L/P): the layer-stacked parameter
  leaves and the [L, ...] KV page pool are simply sharded on their
  leading axis over the `pp` mesh axis (NamedSharding), so per-device
  weight and KV memory scale down P-fold — the main reason to use PP.
- One jitted step runs all stages under `shard_map`: the activation
  flows stage to stage with `lax.ppermute` over ICI/DCN instead of the
  reference's NCCL send/recv threads. Each stage's layer range runs
  through the same `models/decoder.py:scan_layers` core as single-stage
  execution (flat local KV pool, layer-offset block tables).
- Per-stage work is gated by `lax.cond` on `axis_index("pp")`, so a
  device only computes its own stage's tick (no redundant SPMD FLOPs).
- Pipelining across batches comes from JAX's async dispatch: consecutive
  engine steps' programs overlap per-device where data dependencies
  allow (the reference gets the same effect from its engine-level batch
  queue). Intra-batch microbatching is a planned refinement.

Composition (v1): pp requires tp=cp=1 and composes with the dense /
MoE decoder families; LoRA, spec decode, multi-step decode, hybrid KV
groups, and MLA/Mamba layouts raise (worker/model_runner.py gates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from vllm_trianglemix_tpu.layers.common import rms_norm, rope_cos_sin
from vllm_trianglemix_tpu.models.decoder import (
    build_attn_kwargs,
    scan_layers,
)


def pp_partition_specs(specs: dict) -> dict:
    """Rewrite a model's partition specs for pipeline stages: every
    layer-stacked leaf (leading L axis) shards that axis over `pp`,
    keeping any tp sharding on the trailing axes. Embedding / final
    norm / lm_head stay replicated across stages (the first and last
    stages read them; replication is simpler than holding them on one
    stage and broadcasting)."""
    def ppify(s):
        rest = tuple(s)[1:]
        return P("pp", *rest)

    out = dict(specs)
    out["layers"] = {
        k: jax.tree_util.tree_map(ppify, v,
                                  is_leaf=lambda x: isinstance(x, P))
        for k, v in specs["layers"].items()
    }
    return out


def pp_forward(params, cfg, tri_cfg, token_ids, kv_caches, md, tri_flags,
               mesh, *, kv_quant=None, moe_fn=None):
    """One model step with layers pipelined over the mesh's `pp` axis.

    Same contract as decoder.forward's standard path: returns
    (hidden [T, D], updated kv_caches [L, blocks, page, 2KH, D]).
    """
    pp = mesh.shape["pp"]
    L = cfg.num_hidden_layers
    if L % pp != 0:
        raise ValueError(f"num_hidden_layers={L} not divisible by pp={pp}")
    Lp = L // pp
    num_blocks = kv_caches.shape[1]
    eps = cfg.rms_norm_eps

    cos, sin = rope_cos_sin(
        md.positions, cfg.head_dim, cfg.rope_theta,
        dtype=params["embed_tokens"].dtype, scaling=cfg.rope_scaling,
        max_position_embeddings=cfg.max_position_embeddings)
    attn_kwargs = build_attn_kwargs(cfg, tri_cfg, kv_quant)

    x0 = params["embed_tokens"][token_ids]

    layer_specs = jax.tree_util.tree_map(lambda _: P("pp"),
                                         params["layers"])
    md_in_spec = md._replace(**{
        f: (P() if getattr(md, f) is not None else None)
        for f in md._fields})

    def stage_prog(layers_local, x, kv_local, md_local, tri_local,
                   cos_, sin_):
        stage = lax.axis_index("pp")
        flat_kv = kv_local.reshape((Lp * num_blocks,)
                                   + kv_local.shape[2:])

        def run(operands):
            x_in, flat = operands
            return scan_layers(
                layers_local, cfg, x_in, flat, md_local, tri_local,
                cos=cos_, sin=sin_, attn_kwargs=attn_kwargs,
                kv_quant=kv_quant, moe_fn=moe_fn)

        # P ticks: at tick t only stage t computes (lax.cond skips the
        # FLOPs on every other device); the result rotates to stage t+1.
        perm = [(i, (i + 1) % pp) for i in range(pp)]
        for t in range(pp):
            x_new, flat_kv = lax.cond(
                stage == t, run, lambda ops: ops, (x, flat_kv))
            x = lax.ppermute(x_new, "pp", perm)
        # After pp ticks the final activation has rotated back to stage
        # 0; broadcast it to every stage for replicated logits.
        x = lax.psum(jnp.where(stage == 0, x, jnp.zeros_like(x)), "pp")
        return x, flat_kv.reshape(kv_local.shape)

    import inspect

    kw = {"check_vma": False} if "check_vma" in inspect.signature(
        shard_map).parameters else {"check_rep": False}
    hidden, new_kv = shard_map(
        stage_prog,
        mesh=mesh,
        in_specs=(layer_specs, P(), P("pp"), md_in_spec, P("pp"),
                  P(), P()),
        out_specs=(P(), P("pp")),
        **kw,
    )(params["layers"], x0, kv_caches, md, tri_flags, cos, sin)
    hidden = rms_norm(hidden, params["norm"], eps)
    return hidden, new_kv
