"""Mamba (selective state space) family over a per-request state cache.

Reference: vllm/model_executor/models/mamba.py + MambaManager/MambaSpec
(vllm/v1/core/single_type_kv_cache_manager.py:529,
kv_cache_interface.py:218) and the HF numerics
(transformers models/mamba/modeling_mamba.py:360-440 slow_forward):
in_proj → causal depthwise conv (width K, cached last K-1 inputs) → silu
→ x_proj → (softplus dt, B, C) → selective scan with A=-exp(A_log) and D
skip → silu(z) gate → out_proj, pre-norm residual blocks.

TPU-native design:
- **State cache, not KV**: each request owns ONE slot per layer holding
  ``[conv history (d_inner·(K-1)) | ssm state (d_inner·N)]``. MambaSpec
  declares block_size = max_model_len so the existing paged allocator
  hands out exactly one block per request (reference MambaManager
  semantics); the slot id is simply block_tables[:, 0].
- **Ragged segment scan**: the whole mixed prefill/decode batch runs as
  one ``lax.associative_scan`` over the T axis. Segment starts zero the
  recurrence carry (no cross-request leakage) and fold the cached state
  in via ``b_start += dA_start · h_cached``; the conv taps read shifted
  in-chunk values or the cached history when the tap crosses the chunk
  start — chunked prefill and decode fall out of the same code path.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.layers.common import rms_norm

IS_MAMBA = True


@dataclass(frozen=True)
class MambaConfig:
    vocab_size: int = 50280
    hidden_size: int = 768
    state_size: int = 16
    conv_kernel: int = 4
    intermediate_size: int = 1536
    time_step_rank: int = 48
    num_hidden_layers: int = 24
    layer_norm_epsilon: float = 1e-5
    use_bias: bool = False
    use_conv_bias: bool = True
    residual_in_fp32: bool = True
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 4096  # no positional limit; engine cap
    eos_token_id: int = 0
    bos_token_id: int = 0
    sliding_window: int = 0
    rope_scaling: Any = None
    num_experts: int = 0
    # FalconMamba: weightless RMS on dt/B/C inside the mixer; 0 = off.
    mixer_rms_eps: float = 0.0
    # runner-facing geometry (unused by the state cache, kept for shape
    # plumbing): one "KV head" of the state-row width
    num_attention_heads: int = 1

    @property
    def num_key_value_heads(self) -> int:
        return 1

    @property
    def state_row_width(self) -> int:
        return self.intermediate_size * (self.conv_kernel - 1
                                         + self.state_size)

    @property
    def head_dim(self) -> int:
        return self.state_row_width

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "MambaConfig":
        keys = ["vocab_size", "hidden_size", "state_size", "conv_kernel",
                "intermediate_size", "num_hidden_layers",
                "layer_norm_epsilon", "use_bias", "use_conv_bias",
                "residual_in_fp32", "tie_word_embeddings", "eos_token_id",
                "bos_token_id"]
        kw = {k: cfg[k] for k in keys if cfg.get(k) is not None}
        tsr = cfg.get("time_step_rank", "auto")
        if tsr == "auto" or tsr is None:
            tsr = -(-cfg.get("hidden_size", 768) // 16)
        kw["time_step_rank"] = int(tsr)
        return cls(**kw)

    @classmethod
    def from_pretrained(cls, path: str) -> "MambaConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


def kv_cache_spec(cfg: MambaConfig, block_size: int, dtype_bytes: int = 2):
    """One state row per request: block_size = the engine's max length so
    the allocator gives each request exactly one block (reference
    MambaSpec, kv_cache_interface.py:218)."""
    from vllm_trianglemix_tpu.core.kv_cache_interface import MambaSpec

    return MambaSpec(block_size=1 << 30, num_kv_heads=1,
                     head_size=cfg.state_row_width,
                     dtype_bytes=dtype_bytes)


def kv_cache_layer_shape(cfg: MambaConfig, num_blocks: int,
                         block_size: int):
    return (num_blocks, cfg.state_row_width)


def shape_tree(cfg: MambaConfig) -> dict:
    L, D = cfg.num_hidden_layers, cfg.hidden_size
    din, N, K, R = (cfg.intermediate_size, cfg.state_size,
                    cfg.conv_kernel, cfg.time_step_rank)
    layers = {
        "norm": (L, D),
        "in_proj": (L, D, 2 * din),
        "conv_w": (L, din, K),
        "x_proj": (L, din, R + 2 * N),
        "dt_proj": (L, R, din),
        "dt_bias": (L, din),
        "A_log": (L, din, N),
        "D": (L, din),
        "out_proj": (L, din, D),
    }
    if cfg.use_conv_bias:
        layers["conv_b"] = (L, din)
    if cfg.use_bias:
        layers["in_bias"] = (L, 2 * din)
        layers["out_bias"] = (L, D)
    tree = {"embed_tokens": (cfg.vocab_size, D), "layers": layers,
            "norm_f": (D,)}
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = (D, cfg.vocab_size)
    return tree


def init_random(cfg: MambaConfig, seed: int = 0, dtype=jnp.bfloat16) -> dict:
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))

    def init_one(key, shape):
        if shape[-1] == cfg.hidden_size and len(shape) <= 2 \
                and shape[0] != cfg.vocab_size:
            return jnp.ones(shape, dtype)
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(
            dtype)

    params = jax.tree_util.tree_unflatten(
        treedef, [init_one(k, s) for k, s in zip(keys, leaves)])
    # A_log must stay positive-ish for a stable recurrence
    params["layers"]["A_log"] = jnp.log(jnp.broadcast_to(
        jnp.arange(1, cfg.state_size + 1, dtype=jnp.float32),
        params["layers"]["A_log"].shape)).astype(dtype)
    return params


def params_from_hf_state_dict(cfg: MambaConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    if quant is not None:
        raise ValueError("quantized Mamba checkpoints not wired yet")
    L = cfg.num_hidden_layers

    def stack(fmt: str, transpose: bool = False) -> jnp.ndarray:
        mats = []
        for i in range(L):
            w = np.asarray(get_tensor(fmt.format(i=i)))
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), dtype=dtype)

    layers = {
        "norm": stack("backbone.layers.{i}.norm.weight"),
        "in_proj": stack("backbone.layers.{i}.mixer.in_proj.weight", True),
        # HF conv1d weight: [din, 1, K] -> [din, K]
        "conv_w": jnp.asarray(np.stack([
            np.asarray(get_tensor(
                f"backbone.layers.{i}.mixer.conv1d.weight"))[:, 0, :]
            for i in range(L)]), dtype=dtype),
        "x_proj": stack("backbone.layers.{i}.mixer.x_proj.weight", True),
        "dt_proj": stack("backbone.layers.{i}.mixer.dt_proj.weight", True),
        "dt_bias": stack("backbone.layers.{i}.mixer.dt_proj.bias"),
        "A_log": stack("backbone.layers.{i}.mixer.A_log"),
        "D": stack("backbone.layers.{i}.mixer.D"),
        "out_proj": stack("backbone.layers.{i}.mixer.out_proj.weight",
                          True),
    }
    if cfg.use_conv_bias:
        layers["conv_b"] = stack("backbone.layers.{i}.mixer.conv1d.bias")
    if cfg.use_bias:
        layers["in_bias"] = stack(
            "backbone.layers.{i}.mixer.in_proj.bias")
        layers["out_bias"] = stack(
            "backbone.layers.{i}.mixer.out_proj.bias")
    params = {
        "embed_tokens": jnp.asarray(
            np.asarray(get_tensor("backbone.embeddings.weight")),
            dtype=dtype),
        "layers": layers,
        "norm_f": jnp.asarray(
            np.asarray(get_tensor("backbone.norm_f.weight")), dtype=dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(
            np.asarray(get_tensor("lm_head.weight")).T, dtype=dtype)
    return params


def partition_specs(cfg: MambaConfig, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    layers = {
        "norm": P(None, None),
        "in_proj": P(None, None, "tp"),
        "conv_w": P(None, "tp", None),
        "x_proj": P(None, "tp", None),
        "dt_proj": P(None, None, "tp"),
        "dt_bias": P(None, "tp"),
        "A_log": P(None, "tp", None),
        "D": P(None, "tp"),
        "out_proj": P(None, "tp", None),
    }
    if cfg.use_conv_bias:
        layers["conv_b"] = P(None, "tp")
    if cfg.use_bias:
        layers["in_bias"] = P(None, "tp")
        layers["out_bias"] = P(None, None)
    specs = {"embed_tokens": P(None, None), "layers": layers,
             "norm_f": P(None)}
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, "tp")
    return specs


# --- forward ------------------------------------------------------------------

def mamba_mixer(lp, h, conv_hist, ssm0, rq, off, is_start, li, *,
                din: int, N: int, K: int, tsr: int, eps: float = 1e-6,
                bcdt_rms_eps: float = 0.0):
    """The selective-scan mixer shared by pure-Mamba and hybrid (Jamba)
    models: in_proj -> cached causal depthwise conv -> (softplus dt, B,
    C) -> ragged-segment associative scan -> silu(z) gate -> out_proj.

    ``h`` [T, D] is the normed layer input; ``conv_hist`` [R, din, K-1]
    and ``ssm0`` [R, din, N] the per-request cached state (fp32);
    ``rq/off/is_start/li`` the ragged-batch geometry (see forward).
    Optional ``lp`` keys: in_bias/conv_b/out_bias, and Jamba's
    dt_norm/b_norm/c_norm RMSNorms on (dt_r, B, C) before use
    (HF modeling_jamba JambaMambaMixer).

    Returns (out [T, D], hist_new [R, din, K-1], ssm_new [R, din, N]).
    """
    T = h.shape[0]
    R = conv_hist.shape[0]
    xz = h @ lp["in_proj"]
    if "in_bias" in lp:
        xz = xz + lp["in_bias"]
    xs, z = xz[:, :din], xz[:, din:]
    xs_f = xs.astype(jnp.float32)

    # --- causal depthwise conv with cached history ----------------------
    # conv(t) = b + sum_d w[:, K-1-d] * x(t - d); taps before the
    # chunk start read the cached history (hist[:, K-2] = t-1).
    taps = [xs_f]
    acc = xs_f * lp["conv_w"][:, K - 1].astype(jnp.float32)
    for d in range(1, K):
        shifted = jnp.concatenate(
            [jnp.zeros((d, din), jnp.float32), xs_f], axis=0)[:T]
        hidx = jnp.clip(K - 1 - d + off, 0, K - 2)
        hval = jnp.take_along_axis(
            conv_hist[rq], hidx[:, None, None], axis=2)[:, :, 0]
        xd = jnp.where((off >= d)[:, None], shifted, hval)
        taps.append(xd)
        acc = acc + xd * lp["conv_w"][:, K - 1 - d].astype(jnp.float32)
    if "conv_b" in lp:
        acc = acc + lp["conv_b"].astype(jnp.float32)
    u = jax.nn.silu(acc)                          # [T, din] fp32

    # New conv history: the last K-1 inputs INCLUDING each segment's
    # final token (the next chunk's t-1 is this chunk's last token):
    # hist[:, m] holds delay K-1-m, i.e. d = K-2..0 oldest-to-newest.
    # taps[d][li] already resolves x(li-d) through the OLD history
    # when the tap crosses the chunk start, so short segments splice
    # correctly for free.
    hist_new = jnp.stack(
        [taps[d][li] for d in range(K - 2, -1, -1)], axis=2)  # [R,din,K-1]

    # --- selective scan ---------------------------------------------------
    dbc = u.astype(h.dtype) @ lp["x_proj"]
    dt_r, B, C = (dbc[:, :tsr], dbc[:, tsr:tsr + N], dbc[:, tsr + N:])
    if "dt_norm" in lp:
        # Jamba: RMSNorm on dt/B/C before the dt projection
        dt_r = rms_norm(dt_r, lp["dt_norm"], eps)
        B = rms_norm(B, lp["b_norm"], eps)
        C = rms_norm(C, lp["c_norm"], eps)
    elif bcdt_rms_eps > 0.0:
        # FalconMamba: WEIGHTLESS RMS normalization of dt/B/C
        # (HF modeling_falcon_mamba rms_forward, mixer_rms_eps).
        def _rms(t):
            tf = t.astype(jnp.float32)
            var = jnp.mean(jnp.square(tf), axis=-1, keepdims=True)
            return (tf * jax.lax.rsqrt(var + bcdt_rms_eps)).astype(t.dtype)

        dt_r, B, C = _rms(dt_r), _rms(B), _rms(C)
    dt = jax.nn.softplus(
        (dt_r @ lp["dt_proj"] + lp["dt_bias"]).astype(jnp.float32))
    A = -jnp.exp(lp["A_log"].astype(jnp.float32))             # [din, N]
    dA = jnp.exp(dt[:, :, None] * A[None])                    # [T,din,N]
    dBu = (dt[:, :, None] * B.astype(jnp.float32)[:, None, :]
           * u[:, :, None])

    b0 = jnp.where(is_start[:, None, None], dBu + dA * ssm0[rq], dBu)
    a0 = jnp.where(is_start[:, None, None], 0.0, dA)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    _, hs = jax.lax.associative_scan(combine, (a0, b0), axis=0)
    y = jnp.einsum("tdn,tn->td", hs, C.astype(jnp.float32))
    y = y + u * lp["D"].astype(jnp.float32)
    y = y * jax.nn.silu(z.astype(jnp.float32))
    out = y.astype(h.dtype) @ lp["out_proj"]
    if "out_bias" in lp:
        out = out + lp["out_bias"]
    return out, hist_new, hs[li]


def forward(params, cfg: MambaConfig, tri_cfg, token_ids, states, md,
            tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False):
    """states: [L, num_slots, W]. Returns (hidden [T, D], new states)."""
    assert not fused_decode
    del tri_cfg, tri_flags, lora, kv_quant, moe_fn
    T = token_ids.shape[0]
    din, N, K = cfg.intermediate_size, cfg.state_size, cfg.conv_kernel
    eps = cfg.layer_norm_epsilon
    R = md.seq_lens.shape[0]

    rq = md.req_idx                                   # [T]
    qsl = md.query_start_loc
    off = jnp.arange(T, dtype=jnp.int32) - qsl[rq]    # chunk offset
    is_start = off == 0
    slots = md.block_tables[:, 0]                     # [R] state slot
    span = qsl[1:] - qsl[:-1]
    li = jnp.clip(qsl[:-1] + jnp.maximum(span, 1) - 1, 0, T - 1)  # last tok
    has_tokens = span > 0

    x = params["embed_tokens"][token_ids]

    def layer_fn(x, scanned):
        lp, st = scanned                              # st [num_slots, W]
        rows = st[slots].astype(jnp.float32)          # [R, W]
        conv_hist = rows[:, :din * (K - 1)].reshape(R, din, K - 1)
        ssm0 = rows[:, din * (K - 1):].reshape(R, din, N)

        h = rms_norm(x, lp["norm"], eps)
        out, hist_new, ssm_new = mamba_mixer(
            lp, h, conv_hist, ssm0, rq, off, is_start, li,
            din=din, N=N, K=K, tsr=cfg.time_step_rank, eps=eps,
            bcdt_rms_eps=getattr(cfg, "mixer_rms_eps", 0.0))

        # --- state writeback ---------------------------------------------------
        rows_new = jnp.concatenate(
            [hist_new.reshape(R, -1), ssm_new.reshape(R, -1)], axis=1)
        write_slots = jnp.where(has_tokens, slots, st.shape[0])
        st = st.at[write_slots].set(rows_new.astype(st.dtype), mode="drop")

        if cfg.residual_in_fp32:
            x = (x.astype(jnp.float32) + out.astype(jnp.float32)).astype(
                x.dtype)
        else:
            x = x + out
        return x, st

    x, new_states = jax.lax.scan(layer_fn, x,
                                 (params["layers"], states))
    x = rms_norm(x, params["norm_f"], eps)
    return x, new_states


def compute_logits(params, cfg: MambaConfig, hidden):
    w = (params["embed_tokens"].T if cfg.tie_word_embeddings
         else params["lm_head"])
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)


@dataclass(frozen=True)
class FalconMambaConfig(MambaConfig):
    """FalconMamba (FalconMambaForCausalLM): the exact Mamba-1 layout
    plus a weightless RMS normalization of dt/B/C inside every mixer
    (reference falcon_mamba... HF modeling_falcon_mamba rms_forward with
    config.mixer_rms_eps). Weight names are identical to Mamba."""

    mixer_rms_eps: float = 1e-6

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "FalconMambaConfig":
        import dataclasses

        base = MambaConfig.from_hf_config.__func__(cls, cfg)
        return dataclasses.replace(
            base, mixer_rms_eps=cfg.get("mixer_rms_eps", 1e-6))
