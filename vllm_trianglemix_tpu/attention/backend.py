"""Paged-KV attention backend: cache write + ragged paged attention.

This module is the XLA-native implementation (gather/scatter + einsum) that
defines the semantics; `ops/ragged_paged_attention.py` provides the Pallas
kernel with identical numerics for the TPU hot path. Dispatch picks the
kernel unless disabled (VTT_DISABLE_PALLAS) or unsupported.

KV cache layout (per layer):
    [num_blocks, block_size, 2 * num_kv_heads, head_dim]
K and V interleaved on the head axis (K_h at 2h, V_h at 2h+1) — same trick
as the reference TPU backend (pallas.py:100-109) so one block table serves
both, and adjacent K/V sublanes let the Pallas kernel do packed strided
loads for sub-32-bit dtypes.

TriangleMix is applied *inside* attention (unlike the reference prototype,
which computed masks but never passed them to the backend —
models/qwen3.py:176-189): a per-layer flag selects triangle vs dense
visibility, evaluated from token positions, so it works for ragged
chunked-prefill batches. Dense-fallback for short prompts
(<= dense_threshold, reference trianglemix_attention.py:330-332) is decided
per request via prompt_lens.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata
from vllm_trianglemix_tpu.attention.trianglemix import MASK_VALUE


def padded_head_dim(head_dim: int) -> int:
    """On TPU, pad the stored head dim to the 128-lane boundary so the
    Pallas kernels serve every head size (reference pallas.py:17-18,
    255-264 head padding). CPU/other backends keep the true width."""
    try:
        if jax.default_backend() == "tpu":
            return cdiv_128(head_dim) * 128
    except Exception:  # noqa: BLE001 (no backend yet)
        pass
    return head_dim


def cdiv_128(n: int) -> int:
    return -(-n // 128)


def kv_cache_shape(num_blocks: int, block_size: int, num_kv_heads: int,
                   head_dim: int) -> tuple[int, int, int, int]:
    return (num_blocks, block_size, 2 * num_kv_heads,
            padded_head_dim(head_dim))


def _pad_heads(x: jnp.ndarray, d_pad: int) -> jnp.ndarray:
    """Zero-pad the trailing head axis to the cache's stored width.
    Zero K columns add 0 to q·k; zero V columns are sliced off after."""
    d = x.shape[-1]
    if d == d_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, d_pad - d)]
    return jnp.pad(x, pad)


def quantize_kv(k: jnp.ndarray, v: jnp.ndarray, cache_dtype,
                k_scale: float, v_scale: float):
    """Quantize new K/V rows into the cache dtype (reference
    write_to_kv_cache FP8/INT8 inline quantization, pallas.py:313-356)."""
    if cache_dtype == jnp.int8:
        k = jnp.clip(jnp.round(k.astype(jnp.float32) / k_scale),
                     -127, 127).astype(jnp.int8)
        v = jnp.clip(jnp.round(v.astype(jnp.float32) / v_scale),
                     -127, 127).astype(jnp.int8)
    elif cache_dtype == jnp.float8_e4m3fn:
        k = (k.astype(jnp.float32) / k_scale).astype(jnp.float8_e4m3fn)
        v = (v.astype(jnp.float32) / v_scale).astype(jnp.float8_e4m3fn)
    return k, v


def write_to_kv_cache(kv_cache: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      slot_mapping: jnp.ndarray) -> jnp.ndarray:
    """Scatter new K/V rows into the paged cache.

    kv_cache: [num_blocks, block_size, 2*KH, D]
    k, v:     [T, KH, D]
    slot_mapping: int32[T]; -1 (or any out-of-range) rows are dropped.

    XLA lowers this to an in-place dynamic-update when the cache buffer is
    donated; the Pallas kv_cache_update kernel replaces it where profiling
    demands (reference ops/pallas_kv_cache_update.py precedent).
    """
    num_blocks, block_size, _, Dc = kv_cache.shape
    T, KH, D = k.shape
    # Interleave on the head axis: kv[:, 2h] = k_h, kv[:, 2h+1] = v_h.
    kv = _pad_heads(jnp.stack([k, v], axis=2).reshape(T, 2 * KH, D), Dc)
    block_idx = slot_mapping // block_size
    block_off = slot_mapping % block_size
    # Negative slots => out-of-range index, dropped by scatter mode="drop".
    block_idx = jnp.where(slot_mapping < 0, num_blocks, block_idx)
    return kv_cache.at[block_idx, block_off].set(
        kv.astype(kv_cache.dtype), mode="drop")


def write_kv(kv_cache: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
             md: AttentionMetadata, kv_quant=None) -> jnp.ndarray:
    """Dispatch: Pallas slice-DMA scatter on TPU when the runner provided
    update slices, else the XLA scatter. ``kv_quant=(k_scale, v_scale)``
    quantizes into a sub-bf16 cache dtype on write."""
    from vllm_trianglemix_tpu import envs

    if kv_quant is not None and kv_cache.dtype != k.dtype:
        k, v = quantize_kv(k, v, kv_cache.dtype, *kv_quant)
    if (md.kv_slices is not None and not envs.VTT_DISABLE_PALLAS
            and _pallas_supported(k)):
        from vllm_trianglemix_tpu.ops.kv_cache_update import (
            kv_cache_update_pallas,
        )

        T, KH, D = k.shape
        kv = _pad_heads(jnp.stack([k, v], axis=2).reshape(T, 2 * KH, D),
                        kv_cache.shape[-1])
        return kv_cache_update_pallas(kv, kv_cache, md.kv_slices,
                                      md.num_kv_slices)
    return write_to_kv_cache(kv_cache, k, v, md.slot_mapping)


@partial(jax.jit, static_argnames=("sink", "window", "last",
                                   "dense_threshold", "soft_cap", "scale",
                                   "k_scale", "v_scale", "attn_window",
                                   "attn_chunk", "tri_enabled",
                                   "alibi_slopes", "prefix_lm"))
def ragged_paged_attention_xla(
    q: jnp.ndarray,               # [T, HQ, D]
    kv_cache: jnp.ndarray,        # [num_blocks, page, 2*KH, D]
    md: AttentionMetadata,
    use_triangle=False,           # bool or traced bool scalar (per-layer flag
                                  # under lax.scan over layers)
    *,
    scale: float,
    sink: int = 4,
    window: int = 32,
    last: int = 64,
    dense_threshold: int = 2048,
    soft_cap: float = 0.0,
    k_scale=None,
    v_scale=None,
    attn_window: int = 0,
    attn_chunk: int = 0,
    tri_enabled: bool = True,
    sinks=None,                   # f32[HQ] learned attention-sink logits
                                  # (GPT-OSS): an extra softmax column that
                                  # absorbs probability mass and is dropped
                                  # from the value sum (HF modeling_gpt_oss
                                  # eager_attention_forward).
    alibi_slopes=None,            # per-head ALiBi slopes, tuple[HQ]
                                  # (MPT/Bloom; reference mpt.py:36,
                                  # bloom.py:52). Bias slope * key_pos is
                                  # added to the scores — equal to the
                                  # relative -slope*(q_pos - key_pos) form
                                  # by softmax shift-invariance.
    prefix_lm: bool = False,      # PaliGemma-style prefix LM: PROMPT
                                  # tokens attend bidirectionally over the
                                  # whole prompt (HF modeling_paligemma
                                  # _update_causal_mask inference branch:
                                  # "attend to the whole prefix"); decode
                                  # tokens stay causal. Requires one-shot
                                  # prefill (no_chunking requests).
) -> jnp.ndarray:
    """Reference ragged paged attention, O(T × max_ctx) but pure XLA.

    Gathers each request's pages, computes masked attention for every
    scheduled token against its full context. Handles GQA, causality within
    ragged chunked prefill, and TriangleMix visibility.
    """
    T, HQ, D = q.shape
    num_blocks, page, twoKH, _ = kv_cache.shape
    KH = twoKH // 2
    G = HQ // KH  # GQA group size
    R, max_blocks = md.block_tables.shape
    max_ctx = max_blocks * page

    # Gather pages per request: [R, max_blocks, page, 2KH, D]
    pages = kv_cache[md.block_tables]
    pages = pages.reshape(R, max_ctx, twoKH, D)
    k = pages[:, :, 0::2, :]   # [R, C, KH, D]
    v = pages[:, :, 1::2, :]

    # Per-token context tensors: [T, C, KH, D]
    k_t = k[md.req_idx]
    v_t = v[md.req_idx]

    qf = q.reshape(T, KH, G, D).astype(jnp.float32)
    k_f = k_t.astype(jnp.float32)
    if k_scale is not None:
        k_f = k_f * k_scale
    scores = jnp.einsum("tkgd,tckd->tkgc", qf * scale, k_f)
    if soft_cap > 0.0:
        scores = soft_cap * jnp.tanh(scores / soft_cap)
    if alibi_slopes is not None:
        sl = jnp.asarray(alibi_slopes, jnp.float32).reshape(1, KH, G, 1)
        cols = jnp.arange(max_ctx, dtype=jnp.float32).reshape(1, 1, 1, -1)
        scores = scores + sl * cols

    # --- visibility -----------------------------------------------------
    key_pos = jnp.arange(max_ctx, dtype=jnp.int32)[None, :]     # [1, C]
    q_pos = md.positions[:, None]                               # [T, 1]
    ctx_len = md.seq_lens[md.req_idx][:, None]                  # [T, 1]
    visible = (key_pos <= q_pos) & (key_pos < ctx_len)
    if prefix_lm:
        # prompt rows see the WHOLE prompt (bidirectional prefix)
        plen = md.prompt_lens[md.req_idx][:, None]              # [T, 1]
        visible |= ((key_pos < plen) & (q_pos < plen)
                    & (key_pos < ctx_len))
    if attn_window > 0:
        # Sliding-window attention (Mistral): every token sees at most the
        # previous attn_window positions (itself included).
        visible &= (q_pos - key_pos) < attn_window
    if attn_chunk > 0:
        # Chunked-local attention (Llama-4 style; reference
        # ChunkedLocalAttentionSpec): token p attends only within its
        # aligned chunk [floor(p/C)*C, p].
        visible &= key_pos >= (q_pos // attn_chunk) * attn_chunk

    if tri_enabled:
        n = md.prompt_lens[md.req_idx][:, None]                 # [T, 1]
        tri = ((key_pos <= sink)
               | (q_pos - key_pos <= window)
               | (n - q_pos < last))
        # decode tokens (q_pos >= prompt) and short prompts stay dense
        apply_tri = use_triangle & (q_pos < n) & (n > dense_threshold)
        visible &= jnp.where(apply_tri, tri, True)

    scores = jnp.where(visible[:, None, None, :], scores, MASK_VALUE)
    if sinks is not None:
        # Softmax over [scores ; sink_logit], then drop the sink column:
        # equivalently divide by (sum(exp) + exp(sink - m)).
        s = sinks.reshape(KH, G).astype(jnp.float32)[None]      # [1, KH, G]
        m = jnp.maximum(scores.max(-1), s)                      # [T, KH, G]
        p = jnp.exp(scores - m[..., None])
        denom = p.sum(-1) + jnp.exp(s - m)
        probs = p / denom[..., None]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    # Fully-masked (padded) rows produce uniform probs; their output is
    # garbage but they are never read (logits_indices skips them).
    v_f = v_t.astype(jnp.float32)
    if v_scale is not None:
        v_f = v_f * v_scale
    out = jnp.einsum("tkgc,tckd->tkgd", probs, v_f)
    return out.reshape(T, HQ, D).astype(q.dtype)


def ragged_paged_attention(q, kv_cache, md, use_triangle=False, **kwargs):
    """Dispatch: Pallas kernel on TPU (hot path), XLA-native elsewhere or
    when VTT_DISABLE_PALLAS is set. Heads narrower than the cache's
    stored (lane-padded) width are zero-padded in and sliced out."""
    from vllm_trianglemix_tpu import envs

    D = q.shape[-1]
    Dc = kv_cache.shape[-1]
    q = _pad_heads(q, Dc)
    if md.shared_prefix_len is not None:
        # Cascade attention (attention/cascade.py): the runner only sets
        # the shared fields when TriangleMix / windows / sinks are off.
        from vllm_trianglemix_tpu.attention.cascade import (
            cascade_ragged_attention,
        )

        out = cascade_ragged_attention(
            q, kv_cache, md, scale=kwargs.get("scale", 1.0),
            soft_cap=kwargs.get("soft_cap", 0.0))
        return out[..., :D] if Dc != D else out
    if kwargs.get("attn_chunk") or kwargs.get("alibi_slopes") is not None \
            or kwargs.get("prefix_lm"):
        # Chunked-local masking, ALiBi biases and prefix-LM visibility
        # (PaliGemma bidirectional prefill) run the XLA reference path
        # (the Pallas kernels carry none of these predicates; the
        # affected models are small/legacy families where XLA attention
        # suffices).
        out = ragged_paged_attention_xla(q, kv_cache, md, use_triangle,
                                         **kwargs)
        return out[..., :D] if Dc != D else out
    kwargs.pop("attn_chunk", None)
    kwargs.pop("alibi_slopes", None)
    kwargs.pop("prefix_lm", None)
    if not envs.VTT_DISABLE_PALLAS and _pallas_supported(q):
        from vllm_trianglemix_tpu.ops.ragged_paged_attention import (
            ragged_paged_attention_pallas,
        )
        out = ragged_paged_attention_pallas(q, kv_cache, md, use_triangle,
                                            **kwargs)
    else:
        out = ragged_paged_attention_xla(q, kv_cache, md, use_triangle,
                                         **kwargs)
    return out[..., :D] if Dc != D else out


def fused_decode_attention(q, k_new, v_new, kv_cache, md,
                           use_triangle=False, *, scale, soft_cap=0.0,
                           interpret=False, **kwargs):
    """Decode attention with the current token's K/V merged in-kernel.

    Contract: one query token per sequence; ``md.seq_lens`` EXCLUDES the
    current token (kv_len = pos >= 1) and the cache has NOT been written
    for this step — the caller batches all layers' writes into one
    kernel launch afterwards (write_kv_all_layers). The Pallas kernel
    attends over the cached context and merges the current token's K/V
    column inside the kernel as one extra diagonal online-softmax tile
    (`new_kv` input) — no stats outputs, no external LSE merge. This
    removes the per-layer KV-write kernel launch AND the stats
    transpose + merge epilogue that dominated decode attention cost
    (scripts/profile_decode_ablate.py).
    """
    from vllm_trianglemix_tpu import envs

    T, HQ, D = q.shape
    KH = k_new.shape[1]
    Dc = kv_cache.shape[-1]
    if Dc != D:
        q = _pad_heads(q, Dc)
        out = fused_decode_attention(q, _pad_heads(k_new, Dc),
                                     _pad_heads(v_new, Dc), kv_cache, md,
                                     use_triangle, scale=scale,
                                     soft_cap=soft_cap,
                                     interpret=interpret, **kwargs)
        return out[..., :D]

    if (envs.VTT_DISABLE_PALLAS or not _pallas_supported(q)
            or kwargs.get("attn_chunk")
            or kwargs.get("alibi_slopes") is not None):
        # Semantics reference: write this layer's K/V, then plain
        # attention over kv_len = pos + 1 (the pre-fusion decode path).
        # Chunked-local masking always takes this path (the decode
        # kernel has no chunk predicate yet).
        cache = write_to_kv_cache(kv_cache, k_new, v_new, md.slot_mapping)
        md_inc = md._replace(seq_lens=md.seq_lens + 1)
        return ragged_paged_attention_xla(
            q, cache, md_inc, use_triangle, scale=scale,
            soft_cap=soft_cap, **kwargs)

    new_kv = jnp.stack([k_new, v_new], axis=2).reshape(T, 2 * KH, D)
    if not envs.VTT_DISABLE_DECODE_KERNEL:
        from vllm_trianglemix_tpu.ops.decode_attention import (
            decode_paged_attention_pallas,
        )

        # Decode rows are always TriangleMix-dense, so the decode kernel
        # takes no triangle arguments.
        return decode_paged_attention_pallas(
            q, kv_cache, md, new_kv, scale=scale, soft_cap=soft_cap,
            interpret=interpret,
            **{k: v for k, v in kwargs.items()
               if k in ("k_scale", "v_scale", "attn_window",
                        "num_kv_pages_per_block", "vmem_limit_bytes")})

    from vllm_trianglemix_tpu.ops.ragged_paged_attention import (
        ragged_paged_attention_pallas,
    )

    return ragged_paged_attention_pallas(
        q, kv_cache, md, use_triangle, new_kv, scale=scale,
        soft_cap=soft_cap, row_offset=1, interpret=interpret, **kwargs)


def spec_tree_attention(q, k_new, v_new, kv_cache, md, use_triangle=False,
                        *, scale, soft_cap=0.0, k_scale=None, v_scale=None,
                        **_ignored):
    """Tree-speculative verification attention (reference
    vllm/v1/attention/backends/tree_attn.py role, XLA formulation).

    Rows are a mix of REAL input tokens (md.spec_flags == 0; their K/V
    were written to the cache before this call, standard inclusive
    causal) and TREE draft rows (flags 1 = chain / 2 = sibling; NOT in
    the cache). Star-chain tree semantics: every draft row attends the
    real cache prefix (md.seq_lens counts only real tokens, all of which
    precede every draft position) plus, through an explicit in-step
    block over the step's own K/V:

      visible(i <- j) = same request & both tree rows &
                        ((chain_j & pos_j < pos_i) | j == i)

    — a sibling/chain node sees its ancestors (the chain at shallower
    depths) and itself, never a co-positioned sibling. One softmax runs
    over the concatenated [cache | step] columns, so numerics equal a
    dense mask over the full context.
    """
    T, HQ, D = q.shape
    num_blocks, page, twoKH, _ = kv_cache.shape
    KH = twoKH // 2
    G = HQ // KH
    R, max_blocks = md.block_tables.shape
    max_ctx = max_blocks * page

    pages = kv_cache[md.block_tables].reshape(R, max_ctx, twoKH, D)
    k_c = pages[:, :, 0::2, :][md.req_idx].astype(jnp.float32)
    v_c = pages[:, :, 1::2, :][md.req_idx].astype(jnp.float32)
    if k_scale is not None:
        k_c = k_c * k_scale
    if v_scale is not None:
        v_c = v_c * v_scale

    qf = q.reshape(T, KH, G, D).astype(jnp.float32) * scale
    s_cache = jnp.einsum("tkgd,tckd->tkgc", qf, k_c)
    s_step = jnp.einsum("tkgd,ukd->tkgu", qf,
                        k_new.astype(jnp.float32))
    if soft_cap > 0.0:
        s_cache = soft_cap * jnp.tanh(s_cache / soft_cap)
        s_step = soft_cap * jnp.tanh(s_step / soft_cap)

    key_pos = jnp.arange(max_ctx, dtype=jnp.int32)[None, :]
    q_pos = md.positions[:, None]
    ctx_len = md.seq_lens[md.req_idx][:, None]   # REAL tokens only
    vis_c = (key_pos <= q_pos) & (key_pos < ctx_len)
    s_cache = jnp.where(vis_c[:, None, None, :], s_cache, MASK_VALUE)

    flags = md.spec_flags
    is_tree = flags > 0
    same_req = md.req_idx[:, None] == md.req_idx[None, :]
    chain_col = flags[None, :] == 1
    earlier = md.positions[None, :] < md.positions[:, None]
    self_col = (jnp.arange(T, dtype=jnp.int32)[:, None]
                == jnp.arange(T, dtype=jnp.int32)[None, :])
    vis_s = (same_req & is_tree[:, None] & is_tree[None, :]
             & ((chain_col & earlier) | self_col))
    s_step = jnp.where(vis_s[:, None, None, :], s_step, MASK_VALUE)

    s_all = jnp.concatenate([s_cache, s_step], axis=-1)
    w = jax.nn.softmax(s_all, axis=-1)
    w_c, w_s = w[..., :max_ctx], w[..., max_ctx:]
    # step-block K/V come straight from registers in the model dtype —
    # no cache-quantization scales apply to them
    out = (jnp.einsum("tkgc,tckd->tkgd", w_c, v_c)
           + jnp.einsum("tkgu,ukd->tkgd", w_s,
                        v_new.astype(jnp.float32)))
    return out.reshape(T, HQ, D).astype(q.dtype)


def write_kv_all_layers(kv_caches, ks, vs, slot_mapping, lengths,
                        kv_quant=None, interpret=False):
    """One batched KV-cache write for ALL layers of a decode step.

    kv_caches [L, pages, page, 2KH, D]; ks/vs [L, T, KH, D];
    slot_mapping i32[T]; lengths i32[T] (1 = write, 0 = skip). Layers
    share the slot mapping, so the layer axis folds into the page axis
    of a flat cache view and a single slice-DMA kernel launch scatters
    L*T rows — vs L separate launches on the per-layer path.
    """
    from vllm_trianglemix_tpu import envs

    L, pages, page, twoKH, D = kv_caches.shape
    T = ks.shape[1]
    if kv_quant is not None and kv_caches.dtype != ks.dtype:
        ks, vs = quantize_kv(ks, vs, kv_caches.dtype, *kv_quant)
    new = _pad_heads(
        jnp.stack([ks, vs], axis=3).reshape(L, T, twoKH, ks.shape[-1]), D)

    if envs.VTT_DISABLE_PALLAS or not _pallas_supported(new):
        block_idx = jnp.where(lengths > 0, slot_mapping // page, pages)
        block_off = slot_mapping % page
        return jax.vmap(
            lambda cache, kv_l: cache.at[block_idx, block_off].set(
                kv_l.astype(cache.dtype), mode="drop"))(kv_caches, new)

    from vllm_trianglemix_tpu.ops.kv_cache_update import (
        kv_cache_update_pallas,
    )

    PP = pages * page
    cache_start = (jnp.arange(L, dtype=jnp.int32)[:, None] * PP
                   + slot_mapping[None, :]).reshape(-1)
    lens = jnp.tile(lengths.astype(jnp.int32), L)
    slices = jnp.stack([jnp.where(lens > 0, cache_start, 0),
                        jnp.arange(L * T, dtype=jnp.int32),
                        lens])
    flat_cache = kv_caches.reshape(L * pages, page, twoKH, D)
    out = kv_cache_update_pallas(
        new.reshape(L * T, twoKH, D), flat_cache, slices,
        jnp.asarray(L * T, jnp.int32), interpret=interpret)
    return out.reshape(kv_caches.shape)


def _pallas_supported(q) -> bool:
    import jax

    try:
        platform = jax.default_backend()
    except Exception:
        return False
    # Mosaic needs lane-aligned head_dim for the packed K/V split; smaller
    # heads (e.g. 64) take the XLA path until head padding lands
    # (reference pads heads to 128, pallas.py:17-18).
    return platform == "tpu" and q.shape[-1] % 128 == 0
