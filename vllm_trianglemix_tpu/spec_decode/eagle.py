"""EAGLE-lite draft-model speculative decoding.

Role of the reference's EagleProposer (vllm/v1/spec_decode/eagle.py:42):
a one-layer draft transformer conditioned on the TARGET model's hidden
states proposes K tokens per request; the existing lossless rejection
sampler (sample/sampler.py:spec_sample) verifies them next step, so the
emitted distribution is exactly the target model's regardless of draft
quality.

TPU-native design — everything below runs as ONE jitted dispatch per
engine step, no host round trips per draft token:

1. **Acceptance, on device.** The sampler's (tokens, accept, recovery)
   arrays yield each request's number of accepted drafts ``na`` and the
   step's final emitted token (recovery at the first rejection, bonus on
   full acceptance) — the same walk the host does, mirrored in lax ops.
2. **Catch-up.** EAGLE's draft input at position t+1 is
   ``fc([embed(x_{t+1}); h_t])`` where ``h_t`` is the target's hidden
   state. All T tokens the target just processed contribute one such
   pair; their draft-layer K/V are written into a SINGLE-layer paged
   draft cache at position t+1 using the target's slot geometry
   (rejected draft rows are masked out). This keeps the draft cache in
   sync through prefill chunks, plain decode, and spec steps uniformly.
3. **Drafting.** A K-step `lax.scan`: each step embeds the previous
   token, runs the draft layer (fused decode attention over the draft
   cache), projects through the (shared) lm_head, takes the argmax, and
   feeds it back. Drafts return to the host as int32[R, K] alongside the
   step's outputs and are scheduled next step via
   ``request.spec_token_ids`` (reference scheduler's
   scheduled_spec_decode_tokens flow).

Known benign approximation: draft K/V written while drafting may land
one block past the request's current allocation (the scheduler only
reserves lookahead slots at the NEXT step). A stale write can only
degrade another request's DRAFT quality — verification keeps outputs
exact.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from vllm_trianglemix_tpu.attention.backend import (
    fused_decode_attention,
    write_to_kv_cache,
)
from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata
from vllm_trianglemix_tpu.layers.common import (
    apply_rope,
    rms_norm,
    rope_cos_sin,
    silu_and_mul,
)
from vllm_trianglemix_tpu.quantization.linear import apply_linear


def eagle_shape_tree(cfg, eagle3_taps: int = 0) -> dict:
    """Draft-parameter shapes: fc + one decoder layer. ``embed_tokens``,
    ``norm`` and ``lm_head`` are shared with the target unless the draft
    checkpoint carries its own. With ``eagle3_taps`` >= 2 the shapes
    follow the EAGLE-3 midlayer (k*D->D fusion fc, 2D-wide qkv inputs,
    separate hidden_norm)."""
    D = cfg.hidden_size
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    I = cfg.intermediate_size
    e3 = eagle3_taps >= 2
    qin = 2 * D if e3 else D
    tree = {
        "fc": ((eagle3_taps if e3 else 2) * D, D),
        "q_proj": (qin, HQ * Dh),
        "k_proj": (qin, KH * Dh),
        "v_proj": (qin, KH * Dh),
        "o_proj": (HQ * Dh, D),
        "post_attention_layernorm": (D,),
        "gate_proj": (D, I),
        "up_proj": (D, I),
        "down_proj": (I, D),
    }
    if e3:
        tree["input_layernorm"] = (D,)
        tree["hidden_norm"] = (D,)
    if cfg.use_qk_norm:
        tree["q_norm"] = (Dh,)
        tree["k_norm"] = (Dh,)
    return tree


def init_random_eagle(cfg, seed: int = 0, dtype=jnp.bfloat16,
                      eagle3_taps: int = 0) -> dict:
    tree = eagle_shape_tree(cfg, eagle3_taps)
    key = jax.random.PRNGKey(seed)
    params = {}
    for name, shape in tree.items():
        key, sub = jax.random.split(key)
        if name.endswith("layernorm") or name.endswith("_norm"):
            params[name] = jnp.ones(shape, dtype)
        else:
            params[name] = (jax.random.normal(sub, shape, dtype)
                            * (0.5 / shape[0] ** 0.5))
    return params


_HF_KEY_MAP = {
    "fc.weight": "fc",
    "layers.0.self_attn.q_proj.weight": "q_proj",
    "layers.0.self_attn.k_proj.weight": "k_proj",
    "layers.0.self_attn.v_proj.weight": "v_proj",
    "layers.0.self_attn.o_proj.weight": "o_proj",
    "layers.0.input_layernorm.weight": "input_layernorm",
    "layers.0.post_attention_layernorm.weight": "post_attention_layernorm",
    "layers.0.mlp.gate_proj.weight": "gate_proj",
    "layers.0.mlp.up_proj.weight": "up_proj",
    "layers.0.mlp.down_proj.weight": "down_proj",
    "embed_tokens.weight": "embed_tokens",
    "norm.weight": "norm",
    "lm_head.weight": "lm_head",
}
# EAGLE-3 (official llama_eagle3.py layout): one "midlayer" whose q/k/v
# read the 2D-wide [embeds; hidden] concat, separate norms for the two
# halves, an fc fusing k target-layer hidden states (k*D -> D), and an
# optional draft-vocab mapping d2t (draft logits index -> target token).
_HF_KEY_MAP_E3 = {
    "fc.weight": "fc",
    "midlayer.self_attn.q_proj.weight": "q_proj",
    "midlayer.self_attn.k_proj.weight": "k_proj",
    "midlayer.self_attn.v_proj.weight": "v_proj",
    "midlayer.self_attn.o_proj.weight": "o_proj",
    "midlayer.input_layernorm.weight": "input_layernorm",
    "midlayer.hidden_norm.weight": "hidden_norm",
    "midlayer.post_attention_layernorm.weight": "post_attention_layernorm",
    "midlayer.mlp.gate_proj.weight": "gate_proj",
    "midlayer.mlp.up_proj.weight": "up_proj",
    "midlayer.mlp.down_proj.weight": "down_proj",
    "embed_tokens.weight": "embed_tokens",
    "norm.weight": "norm",
    "lm_head.weight": "lm_head",
    "d2t": "d2t",
    "t2d": "t2d",
}


def load_eagle_params(path: str, dtype=jnp.bfloat16) -> dict:
    """Read an EAGLE-format draft checkpoint from safetensors in
    ``path``: the EAGLE-1 layout (fc + layers.0.*) or the EAGLE-3 layout
    (midlayer.* with hidden_norm + a k*D -> D feature-fusion fc +
    optional d2t draft-vocab map). Linear weights are HF [out, in] and
    transposed to our [in, out]."""
    import os

    from safetensors import safe_open

    params: dict[str, Any] = {}
    norms = ("input_layernorm", "hidden_norm",
             "post_attention_layernorm", "norm", "embed_tokens",
             "d2t", "t2d")
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".safetensors"):
            continue
        with safe_open(os.path.join(path, fname), framework="numpy") as f:
            keys = list(f.keys())
            eagle3 = any("midlayer." in k or k in ("d2t", "t2d")
                         for k in keys)
            key_map = _HF_KEY_MAP_E3 if eagle3 else _HF_KEY_MAP
            for key in keys:
                short = key.removeprefix("model.")
                if short not in key_map:
                    continue
                name = key_map[short]
                w = f.get_tensor(key)
                if name in ("d2t", "t2d"):
                    params[name] = jnp.asarray(w)
                    continue
                w = jnp.asarray(w, dtype)
                if name not in norms and w.ndim == 2:
                    w = w.T
                params[name] = w
    if "fc" not in params:
        raise ValueError(f"no EAGLE fc weight found under {path}")
    return params


def eagle_hidden_taps(params: dict, hidden_size: int) -> int:
    """Number of target hidden states the draft's fc consumes: 1 for
    EAGLE-1 (fc input = [emb; h] = 2D), k for EAGLE-3 (pure k*D feature
    fusion, detected by the hidden_norm midlayer weight)."""
    if "hidden_norm" in params:
        return params["fc"].shape[0] // hidden_size
    return 1


def build_eagle_fn(cfg, num_speculative_tokens: int, block_size: int,
                   tree_branching: tuple | None = None,
                   eagle3_taps: int = 0):
    """Returns the jittable drafting function (see module docstring).

    With ``tree_branching`` (star-chain trees, reference eagle.py tree
    proposals): each chain step emits its top-b_l tokens instead of just
    the argmax — branch 0 IS the chain; siblings are free alternatives
    from the same logits. Drafts return level-major [R, sum(b_l)].

    With ``eagle3_taps`` >= 2 (EAGLE-3, reference llama_eagle3.py): the
    ``hidden`` input is the concat of k target-layer hidden states
    [T, k*D], fused once by fc (k*D -> D); the midlayer's q/k/v read the
    2D-wide [normed embeds; normed hidden] concat, the attention
    residual is the hidden half, and an optional d2t map translates
    draft-vocab argmaxes to target tokens.
    """
    K = num_speculative_tokens
    branching = tree_branching or (1,) * K
    assert len(branching) == K, (branching, K)
    B = max(branching)
    E3 = eagle3_taps >= 2
    page = block_size
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    D = cfg.hidden_size
    eps = cfg.rms_norm_eps
    scale = Dh ** -0.5
    max_pos = cfg.max_position_embeddings

    rope_kw = dict(theta=cfg.rope_theta, scaling=cfg.rope_scaling,
                   max_position_embeddings=cfg.max_position_embeddings)
    attn_kw = dict(scale=scale, attn_window=cfg.sliding_window)

    def layer_in(dp, emb, hid):
        """Draft-layer input: EAGLE-1 fuses [emb; hidden] through fc to
        one D-wide x; EAGLE-3 keeps the (emb, hidden) pair — the
        midlayer consumes the 2D concat (hidden already fc-fused)."""
        if E3:
            return (emb, hid.astype(emb.dtype))
        x = jnp.concatenate([emb, hid.astype(emb.dtype)], axis=-1)
        x = apply_linear(x, dp["fc"])
        if "fc_bias" in dp:
            x = x + dp["fc_bias"]
        return x

    def qkv(dp, x, cos, sin):
        if E3:
            emb, hid = x
            T = emb.shape[0]
            h = jnp.concatenate(
                [rms_norm(emb, dp["input_layernorm"], eps),
                 rms_norm(hid, dp["hidden_norm"], eps)], axis=-1)
        else:
            T = x.shape[0]
            h = (rms_norm(x, dp["input_layernorm"], eps)
                 if "input_layernorm" in dp else x)
        q = apply_linear(h, dp["q_proj"]).reshape(T, HQ, Dh)
        k = apply_linear(h, dp["k_proj"]).reshape(T, KH, Dh)
        v = apply_linear(h, dp["v_proj"]).reshape(T, KH, Dh)
        if "q_norm" in dp:
            q = rms_norm(q, dp["q_norm"], eps)
            k = rms_norm(k, dp["k_norm"], eps)
        q, k = apply_rope(q, k, cos, sin)
        return q, k, v

    def mlp_block(dp, x, attn):
        if E3:
            _, x = x          # residual = the hidden half (llama_eagle3)
        T = x.shape[0]
        x = x + apply_linear(attn.reshape(T, HQ * Dh), dp["o_proj"])
        h2 = rms_norm(x, dp["post_attention_layernorm"], eps)
        m = silu_and_mul(apply_linear(h2, dp["gate_proj"]),
                         apply_linear(h2, dp["up_proj"]))
        return x + apply_linear(m, dp["down_proj"])

    def logits_of(dp, tparams, x):
        w_norm = dp.get("norm", tparams["norm"])
        h = rms_norm(x, w_norm, eps)
        if "lm_head" in dp:
            w = dp["lm_head"]
        elif cfg.tie_word_embeddings:
            w = tparams["embed_tokens"].T
        else:
            w = tparams["lm_head"]
        return jnp.dot(h, w, preferred_element_type=jnp.float32)

    def remap_draft(dp, topi):
        """EAGLE-3 d2t: draft-vocab index -> target token id offset."""
        if "d2t" in dp:
            return (topi + dp["d2t"][topi]).astype(jnp.int32)
        return topi

    @partial(jax.jit, donate_argnums=(2,))
    def eagle_fn(dp, tparams, draft_kv, hidden, token_ids, md,
                 tokens, accept, recovery, n_drafts, has_emit):
        """-> (draft_kv, drafts int32[R, K], emitted int32[R])."""
        emb_w = dp.get("embed_tokens", tparams["embed_tokens"])
        if E3:
            # fuse the k target-layer feature taps once (k*D -> D); all
            # downstream draft state is D-wide
            hidden = apply_linear(hidden, dp["fc"])
        RS = tokens.shape[0]
        R = md.seq_lens.shape[0]
        S = RS // R
        T = token_ids.shape[0]

        # 1. Device-side acceptance walk (mirrors finalize()).
        tk = tokens.reshape(R, S)
        ac = accept.reshape(R, S) if accept is not None else None
        rc = recovery.reshape(R, S) if recovery is not None else None
        if ac is None:
            na = jnp.zeros(R, jnp.int32)
            emitted = tk[:, 0]
        else:
            cols = jnp.arange(S, dtype=jnp.int32)
            okd = ac & (cols[None, :] < n_drafts[:, None])
            na = jnp.sum(jnp.cumprod(okd.astype(jnp.int32), axis=1),
                         axis=1).astype(jnp.int32)
            gi = jnp.minimum(na, S - 1)[:, None]
            bonus = jnp.take_along_axis(tk, gi, axis=1)[:, 0]
            recov = jnp.take_along_axis(rc, gi, axis=1)[:, 0]
            emitted = jnp.where(na == n_drafts, bonus, recov)

        # 2. Catch-up: pair (h_t, x_{t+1}) -> draft K/V at position t+1.
        qsl = md.query_start_loc
        span = qsl[1:] - qsl[:-1]                       # [R]
        n_valid = jnp.where(n_drafts > 0, na + 1,
                            span - 1 + has_emit.astype(jnp.int32))
        n_valid = jnp.clip(n_valid, 0, span)
        rq = md.req_idx                                 # [T]
        off = jnp.arange(T, dtype=jnp.int32) - qsl[rq]
        is_last = (off == n_valid[rq] - 1) & has_emit[rq]
        tshift = jnp.concatenate([token_ids[1:], token_ids[:1]])
        tok_next = jnp.where(is_last, emitted[rq], tshift)
        valid = (off < n_valid[rq]) & (md.slot_mapping >= 0)

        x = layer_in(dp, emb_w[tok_next], hidden)
        pos1 = jnp.minimum(md.positions + 1, max_pos - 1)
        cos, sin = rope_cos_sin(pos1, Dh, dtype=emb_w.dtype, **rope_kw)
        _, k, v = qkv(dp, x, cos, sin)
        slot1 = (md.block_tables[rq, pos1 // page] * page + pos1 % page)
        draft_kv = write_to_kv_cache(
            draft_kv, k, v, jnp.where(valid, slot1, -1))
        # Fresh sequences: seed draft position 0 with the pair (0, x_0) so
        # the first key exists (official EAGLE's sequence start) instead
        # of an uninitialized zero entry polluting the softmax.
        is_first = (md.positions == 0) & (md.slot_mapping >= 0)
        x0 = layer_in(dp, emb_w[token_ids], jnp.zeros_like(hidden))
        cos0, sin0 = rope_cos_sin(jnp.zeros_like(md.positions), Dh,
                                  dtype=emb_w.dtype, **rope_kw)
        _, k0, v0 = qkv(dp, x0, cos0, sin0)
        draft_kv = write_to_kv_cache(
            draft_kv, k0, v0, jnp.where(is_first, md.slot_mapping, -1))

        # 3. K-step drafting scan from the last valid row.
        li = jnp.clip(qsl[:-1] + n_valid - 1, 0, T - 1)
        req_idx = jnp.arange(R, dtype=jnp.int32)
        qsl_r = jnp.arange(R + 1, dtype=jnp.int32)

        def one_step(carry, _):
            dkv, h, tok, pos = carry
            # pos = position of `tok`; its pair sits at draft position pos+1.
            p = jnp.minimum(pos + 1, max_pos - 1)
            x = layer_in(dp, emb_w[tok], h)
            cos, sin = rope_cos_sin(p, Dh, dtype=emb_w.dtype, **rope_kw)
            q, k, v = qkv(dp, x, cos, sin)
            slot = (md.block_tables[req_idx, p // page] * page + p % page)
            slot = jnp.where(has_emit, slot, -1)
            md_i = AttentionMetadata(
                positions=p,
                req_idx=req_idx,
                slot_mapping=slot,
                block_tables=md.block_tables,
                seq_lens=jnp.maximum(p, 1),
                prompt_lens=md.prompt_lens,
                query_start_loc=qsl_r,
                logits_indices=req_idx,
                num_reqs=md.num_reqs,
                kv_slices=None,
                num_kv_slices=None,
            )
            attn = fused_decode_attention(q, k, v, dkv, md_i, False,
                                          **attn_kw)
            xo = mlp_block(dp, x, attn)
            dkv = write_to_kv_cache(dkv, k, v, slot)
            _, topi = jax.lax.top_k(logits_of(dp, tparams, xo), B)
            topi = remap_draft(dp, topi.astype(jnp.int32))
            # [R, B]; col 0 = chain
            return (dkv, xo, topi[:, 0], p), topi

        h0 = hidden[li]
        pos0 = md.positions[li]
        (draft_kv, _, _, _), tops = jax.lax.scan(
            one_step, (draft_kv, h0, emitted, pos0), None, length=K)
        # tops [K, R, B] -> level-major flat [R, sum(b_l)] (chain first
        # within each level)
        parts = [tops[l, :, :branching[l]] for l in range(K)]
        drafts = jnp.concatenate(parts, axis=1)
        return draft_kv, drafts, emitted

    return eagle_fn
