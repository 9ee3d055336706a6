"""Pallas KV-cache scatter: new K/V rows -> paged HBM cache, in place.

The role of the reference's csrc/cache_kernels.cu reshape_and_cache and its
TPU counterpart (vllm/attention/ops/pallas_kv_cache_update.py): the host
groups this step's tokens into contiguous (cache_slot, new_row, length)
slices (a run never crosses a page boundary), and the kernel streams each
slice new_kv HBM -> VMEM scratch -> cache HBM with dynamic-length async
copies. input_output_aliases makes the update in place — no cache copy.

The XLA-native fallback (scatter via .at[].set) lives in
attention/backend.py:write_to_kv_cache; numerics are identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    # scalar prefetch
    slices_ref,      # i32[3, padded_slices]: (cache_row_start, new_row_start, len)
    num_slices_ref,  # i32[1]
    # inputs
    new_kv_ref,      # [T, combined_heads, head_dim] (HBM)
    cache_in_ref,    # [pages * page_size, combined_heads, head_dim] (HBM)
    # outputs (aliased with cache_in_ref)
    cache_out_ref,
    # scratch
    sem,
):
    """Direct HBM->HBM slice copies: every slice in the block is issued
    as one dynamic-length DMA straight from the new-KV rows to the paged
    cache, all in flight together, then one wait barrier. (A previous
    two-stage VMEM-staged variant paid two full DMA latency barriers per
    block — ~0.4 ms/layer at 8k-token prefill.)"""
    del cache_in_ref  # aliased; all writes go through cache_out_ref
    blk = pl.program_id(0)
    slices_per_block = SLICES_PER_BLOCK

    copies = []
    for i in range(slices_per_block):
        s = i + blk * slices_per_block
        valid = s < num_slices_ref[0]
        cache_start = lax.select(valid, slices_ref[0, s], 0)
        new_start = lax.select(valid, slices_ref[1, s], 0)
        length = lax.select(valid, slices_ref[2, s], 0)
        c = pltpu.make_async_copy(
            new_kv_ref.at[pl.ds(new_start, length)],
            cache_out_ref.at[pl.ds(cache_start, length)],
            sem)
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()


def _kernel_rowwise(
    slices_ref, num_slices_ref, new_kv_ref, cache_in_ref, cache_out_ref,
    scratch, sem, *, page_size: int, slices_per_block: int,
):
    """Static-shape variant (one row per copy) for interpret mode, which
    cannot express dynamic-length DMA. Same slice semantics as _kernel."""
    del cache_in_ref
    blk = pl.program_id(0)
    for i in range(slices_per_block):
        s = i + blk * slices_per_block
        valid = s < num_slices_ref[0]
        for r in range(page_size):

            @pl.when(valid & (r < slices_ref[2, s]))
            def _():
                c = pltpu.make_async_copy(
                    new_kv_ref.at[slices_ref[1, s] + r],
                    scratch.at[0],
                    sem)
                c.start()
                c.wait()
                c2 = pltpu.make_async_copy(
                    scratch.at[0],
                    cache_out_ref.at[slices_ref[0, s] + r],
                    sem)
                c2.start()
                c2.wait()


SLICES_PER_BLOCK = 16


@functools.partial(jax.jit,
                   static_argnames=("num_slices_per_block", "interpret"))
def kv_cache_update_pallas(
    new_kv: jax.Array,      # [T, combined_heads, head_dim] interleaved K/V
    kv_cache: jax.Array,    # [num_pages, page_size, combined_heads, head_dim]
    slices: jax.Array,      # i32[3, padded_slices]
    num_slices: jax.Array,  # i32[] or i32[1]
    *,
    num_slices_per_block: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    num_pages, page_size, combined, head_dim = kv_cache.shape
    padded_slices = slices.shape[1]
    spb = num_slices_per_block or SLICES_PER_BLOCK
    flat_cache = kv_cache.reshape(num_pages * page_size, combined, head_dim)
    grid = (pl.cdiv(padded_slices, spb),)

    if interpret:
        kernel = functools.partial(_kernel_rowwise, page_size=page_size,
                                   slices_per_block=spb)
        scratch = [
            pltpu.VMEM((1, combined, head_dim), new_kv.dtype),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        kernel = _kernel
        scratch = [pltpu.SemaphoreType.DMA]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            grid=grid,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct(flat_cache.shape, flat_cache.dtype),
        input_output_aliases={3: 0},  # cache input (after 2 prefetch + new_kv)
        name="vtt_kv_cache_update",
        interpret=interpret,
    )(slices.astype(jnp.int32),
      jnp.asarray(num_slices, jnp.int32).reshape(1),
      new_kv.astype(kv_cache.dtype),
      flat_cache)
    return out.reshape(kv_cache.shape)


def build_kv_update_slices(slot_mapping, page_size: int,
                           padded_slices: int):
    """Host helper: contiguous runs of (token -> cache slot).

    slot_mapping: np.int32[T] flat cache slots, -1 for padding rows.
    Returns (slices i32[3, padded_slices], num_slices int). A run breaks
    when slots stop being consecutive OR at a page boundary (the VMEM
    scratch holds page_size rows per slice).
    """
    import numpy as np

    slices = np.zeros((3, padded_slices), np.int32)
    n = 0
    T = len(slot_mapping)
    i = 0
    while i < T:
        if slot_mapping[i] < 0:
            i += 1
            continue
        start = i
        while (i + 1 < T and slot_mapping[i + 1] == slot_mapping[i] + 1
               and slot_mapping[i + 1] % page_size != 0):
            i += 1
        i += 1
        if n >= padded_slices:
            raise ValueError("padded_slices too small")
        slices[0, n] = slot_mapping[start]
        slices[1, n] = start
        slices[2, n] = i - start
        n += 1
    return slices, n
