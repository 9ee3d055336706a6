"""Medusa speculative decoding: K extra heads on the target's hidden state.

Role of the reference's MedusaProposer (vllm/v1/spec_decode/medusa.py):
head k is a residual block + lm_head predicting the token at offset k+1
past the position the main head samples — no draft transformer, no draft
KV cache (contrast spec_decode/eagle.py). Verification reuses the engine's
lossless rejection sampler, so outputs are exact regardless of head
quality.

TPU-native shape: all K heads are stacked on a leading axis and applied as
ONE batched einsum over the batch's conditioning rows — a [R, K, D] x
[K, D, V] GEMM pair per step, one device dispatch shared with no host
round trips (reference medusa runs K separate nn.Modules).

Checkpoint layout (official medusa heads, e.g. medusa-vicuna-*):
``{k}.0.linear.weight/bias`` (residual block) + ``{k}.1.weight`` (head
lm_head), optionally prefixed ``medusa_head.``.
"""

from __future__ import annotations

import glob
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def medusa_shape_tree(cfg, num_heads: int) -> dict:
    D, V = cfg.hidden_size, cfg.vocab_size
    return {
        "w": (num_heads, D, D),
        "b": (num_heads, D),
        "head": (num_heads, D, V),
    }


def init_random_medusa(cfg, num_heads: int, seed: int = 0,
                       dtype=jnp.bfloat16) -> dict:
    shapes = medusa_shape_tree(cfg, num_heads)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(shapes))
    return {
        k: (jax.random.normal(kk, shapes[k], jnp.float32) * 0.02).astype(
            dtype)
        for kk, k in zip(keys, sorted(shapes))
    }


def load_medusa_params(path: str, num_heads: int,
                       dtype=jnp.bfloat16) -> dict:
    """Load official medusa-head safetensors (``{k}.0.linear.*`` +
    ``{k}.1.weight``, with or without a ``medusa_head.`` prefix)."""
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {path}")
    tensors: dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="numpy") as h:
            for name in h.keys():
                tensors[name.removeprefix("medusa_head.")] = h.get_tensor(
                    name)

    ws, bs, heads = [], [], []
    for k in range(num_heads):
        ws.append(np.asarray(tensors[f"{k}.0.linear.weight"]).T)
        bs.append(np.asarray(tensors[f"{k}.0.linear.bias"]))
        heads.append(np.asarray(tensors[f"{k}.1.weight"]).T)
    return {
        "w": jnp.asarray(np.stack(ws), dtype=dtype),
        "b": jnp.asarray(np.stack(bs), dtype=dtype),
        "head": jnp.asarray(np.stack(heads), dtype=dtype),
    }


def build_medusa_fn(num_heads: int):
    """jitted (mparams, hidden, md, tokens, accept, n_drafts, has_emit)
    -> drafts int32[R, K].

    The conditioning row per request is the hidden state that produced
    the step's FINAL emitted token: row ``na`` of the request's sampling
    rows after the device-side acceptance walk (same walk as
    spec_decode/eagle.py eagle_fn step 1)."""

    @partial(jax.jit, static_argnames=())
    def medusa_fn(mparams, hidden, md, tokens, accept, n_drafts, has_emit):
        RS = tokens.shape[0]
        R = md.seq_lens.shape[0]
        S = RS // R
        T = hidden.shape[0]

        if accept is None:
            na = jnp.zeros(R, jnp.int32)
        else:
            ac = accept.reshape(R, S)
            cols = jnp.arange(S, dtype=jnp.int32)
            okd = ac & (cols[None, :] < n_drafts[:, None])
            na = jnp.sum(jnp.cumprod(okd.astype(jnp.int32), axis=1),
                         axis=1).astype(jnp.int32)

        # Last valid row of each request this step (prefill tail or the
        # accepted-token row in a spec step).
        qsl = md.query_start_loc
        span = qsl[1:] - qsl[:-1]
        n_valid = jnp.where(n_drafts > 0, na + 1, span)
        li = jnp.clip(qsl[:-1] + n_valid - 1, 0, T - 1)
        h = hidden[li]                                   # [R, D]

        hk = h[:, None, :] + jax.nn.silu(
            jnp.einsum("rd,kde->rke", h, mparams["w"])
            + mparams["b"][None])                        # [R, K, D]
        logits = jnp.einsum("rkd,kdv->rkv", hk, mparams["head"],
                            preferred_element_type=jnp.float32)
        drafts = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # Requests that did not emit a token this step propose nothing.
        return jnp.where(has_emit[:, None], drafts, -1)

    return medusa_fn
