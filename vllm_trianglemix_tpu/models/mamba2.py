"""Mamba-2 (SSD) family over the per-request state cache.

Reference: vllm/model_executor/models/mamba2.py + mamba2_attn backend;
HF numerics from transformers models/mamba2/modeling_mamba2.py
(torch_forward): in_proj → [z | xBC | dt], causal depthwise conv over
xBC (x, B, C concatenated), silu, per-HEAD scalar decay
A = -exp(A_log)[H] with matrix state [H, P, N] per request,
h_t = exp(dt_t A) h_{t-1} + dt_t x_t ⊗ B_t, y = h·C + D x, gated
RMSNorm(y * silu(z)), out_proj.

TPU-native shape: same ragged-segment ``lax.associative_scan`` design as
models/mamba.py — segment starts fold the cached state in, conv taps
read cached history across chunk boundaries, so mixed prefill/decode
batches are one code path. The scan materializes [T, H, P, N] fp32
states; fine at serving chunk sizes (the scheduler's token budget bounds
T), with the chunked SSD block decomposition as the planned long-prefill
refinement (reference: the chunk_size path of HF's implementation).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.layers.common import rms_norm

IS_MAMBA = True


@dataclass(frozen=True)
class Mamba2Config:
    vocab_size: int = 32768
    hidden_size: int = 2048
    state_size: int = 128
    conv_kernel: int = 4
    num_heads: int = 24
    mamba2_head_dim: int = 64           # HF "head_dim"
    n_groups: int = 1
    expand: int = 2
    num_hidden_layers: int = 24
    layer_norm_epsilon: float = 1e-5
    time_step_min: float = 0.0
    time_step_max: float = float("inf")
    use_bias: bool = False
    use_conv_bias: bool = True
    residual_in_fp32: bool = True
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 4096
    eos_token_id: int = 2
    bos_token_id: int = 1
    sliding_window: int = 0
    rope_scaling: Any = None
    num_experts: int = 0
    num_attention_heads: int = 1        # runner-facing shape plumbing

    @property
    def intermediate_size(self) -> int:
        return self.num_heads * self.mamba2_head_dim

    @property
    def conv_dim(self) -> int:
        return (self.intermediate_size
                + 2 * self.n_groups * self.state_size)

    @property
    def num_key_value_heads(self) -> int:
        return 1

    @property
    def state_row_width(self) -> int:
        return (self.conv_dim * (self.conv_kernel - 1)
                + self.num_heads * self.mamba2_head_dim * self.state_size)

    @property
    def head_dim(self) -> int:
        return self.state_row_width

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Mamba2Config":
        keys = ["vocab_size", "hidden_size", "state_size", "conv_kernel",
                "num_heads", "n_groups", "expand", "num_hidden_layers",
                "layer_norm_epsilon", "use_bias", "use_conv_bias",
                "residual_in_fp32", "tie_word_embeddings",
                "eos_token_id", "bos_token_id"]
        kw = {k: cfg[k] for k in keys if cfg.get(k) is not None}
        kw["mamba2_head_dim"] = int(cfg.get(
            "head_dim", cfg["hidden_size"] * cfg.get("expand", 2)
            // cfg["num_heads"]))
        lim = cfg.get("time_step_limit") or (0.0, float("inf"))
        kw["time_step_min"], kw["time_step_max"] = (float(lim[0]),
                                                    float(lim[1]))
        if not cfg.get("rms_norm", True):
            raise ValueError("Mamba-2 rms_norm=False is not supported")
        return cls(**kw)

    @classmethod
    def from_pretrained(cls, path: str) -> "Mamba2Config":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


def kv_cache_spec(cfg: Mamba2Config, block_size: int, dtype_bytes: int = 2):
    from vllm_trianglemix_tpu.core.kv_cache_interface import MambaSpec

    return MambaSpec(block_size=1 << 30, num_kv_heads=1,
                     head_size=cfg.state_row_width,
                     dtype_bytes=dtype_bytes)


def kv_cache_layer_shape(cfg: Mamba2Config, num_blocks: int,
                         block_size: int):
    return (num_blocks, cfg.state_row_width)


def shape_tree(cfg: Mamba2Config) -> dict:
    L, D = cfg.num_hidden_layers, cfg.hidden_size
    din, H = cfg.intermediate_size, cfg.num_heads
    cd, K = cfg.conv_dim, cfg.conv_kernel
    proj = din + cd + H                 # [z | xBC | dt]
    layers = {
        "norm": (L, D),
        "in_proj": (L, D, proj),
        "conv_w": (L, cd, K),
        "dt_bias": (L, H),
        "A_log": (L, H),
        "D": (L, H),
        "gated_norm": (L, din),
        "out_proj": (L, din, D),
    }
    if cfg.use_conv_bias:
        layers["conv_b"] = (L, cd)
    if cfg.use_bias:
        layers["in_bias"] = (L, proj)
        layers["out_bias"] = (L, D)
    tree = {"embed_tokens": (cfg.vocab_size, D), "layers": layers,
            "norm_f": (D,)}
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = (D, cfg.vocab_size)
    return tree


def init_random(cfg: Mamba2Config, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))

    def init_one(key, shape):
        if shape[-1] in (cfg.hidden_size, cfg.intermediate_size) \
                and len(shape) <= 2 and shape[0] != cfg.vocab_size:
            return jnp.ones(shape, dtype)
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(
            dtype)

    params = jax.tree_util.tree_unflatten(
        treedef, [init_one(k, s) for k, s in zip(keys, leaves)])
    params["layers"]["A_log"] = jnp.log(jnp.broadcast_to(
        jnp.arange(1, cfg.num_heads + 1, dtype=jnp.float32),
        params["layers"]["A_log"].shape)).astype(dtype)
    return params


def params_from_hf_state_dict(cfg: Mamba2Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    if quant is not None:
        raise ValueError("quantized Mamba-2 checkpoints not wired yet")
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
        "conv_w": jnp.asarray(np.stack([
            np.asarray(get_tensor(
                f"backbone.layers.{i}.mixer.conv1d.weight"))[:, 0, :]
            for i in range(L)]), dtype=dtype),
        "dt_bias": stack("backbone.layers.{i}.mixer.dt_bias"),
        "A_log": stack("backbone.layers.{i}.mixer.A_log"),
        "D": stack("backbone.layers.{i}.mixer.D"),
        "gated_norm": stack("backbone.layers.{i}.mixer.norm.weight"),
        "out_proj": stack("backbone.layers.{i}.mixer.out_proj.weight",
                          True),
    }
    if cfg.use_conv_bias:
        layers["conv_b"] = stack("backbone.layers.{i}.mixer.conv1d.bias")
    if cfg.use_bias:
        layers["in_bias"] = stack("backbone.layers.{i}.mixer.in_proj.bias")
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


def partition_specs(cfg: Mamba2Config, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    layers = {
        "norm": P(None, None),
        "in_proj": P(None, None, None),
        "conv_w": P(None, None, None),
        "dt_bias": P(None, None),
        "A_log": P(None, None),
        "D": P(None, None),
        "gated_norm": P(None, None),
        "out_proj": P(None, None, None),
    }
    if cfg.use_conv_bias:
        layers["conv_b"] = P(None, None)
    if cfg.use_bias:
        layers["in_bias"] = P(None, None)
        layers["out_bias"] = P(None, None)
    specs = {"embed_tokens": P(None, None), "layers": layers,
             "norm_f": P(None)}
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, None)
    return specs


# --- forward ------------------------------------------------------------------


def mamba2_mixer(lp, h, conv_hist, ssm0, rq, off, is_start, li, *,
                 H: int, P_: int, N: int, G: int, din: int, cd: int,
                 K: int, eps: float, time_step_min: float = 0.0,
                 time_step_max: float = float("inf"),
                 gate_mode: str = "gate_then_norm",
                 norm_groups: int = 1):
    """The Mamba-2 (SSD) mixer shared by pure-Mamba2 and hybrid (Bamba)
    models: fused in_proj -> cached causal conv over [x|B|C] -> per-head
    dt -> ragged-segment associative scan over [H, P, N] states ->
    gated RMSNorm -> out_proj.

    Returns (out [T, D], hist_new [R, cd, K-1], ssm_new [R, H, P, N]).
    """
    import numpy as _np

    T = h.shape[0]
    R = conv_hist.shape[0]
    zxbcdt = h @ lp["in_proj"]
    if "in_bias" in lp:
        zxbcdt = zxbcdt + lp["in_bias"]
    z = zxbcdt[:, :din]
    xbc = zxbcdt[:, din:din + cd].astype(jnp.float32)
    dt_raw = zxbcdt[:, din + cd:]                         # [T, H]

    # --- causal depthwise conv over [x | B | C] with cached history
    taps = [xbc]
    acc = xbc * lp["conv_w"][:, K - 1].astype(jnp.float32)
    for d in range(1, K):
        shifted = jnp.concatenate(
            [jnp.zeros((d, cd), jnp.float32), xbc], axis=0)[:T]
        hidx = jnp.clip(K - 1 - d + off, 0, K - 2)
        hval = jnp.take_along_axis(
            conv_hist[rq], hidx[:, None, None], axis=2)[:, :, 0]
        xd = jnp.where((off >= d)[:, None], shifted, hval)
        taps.append(xd)
        acc = acc + xd * lp["conv_w"][:, K - 1 - d].astype(jnp.float32)
    if "conv_b" in lp:
        acc = acc + lp["conv_b"].astype(jnp.float32)
    u = jax.nn.silu(acc)                                  # [T, cd] fp32
    hist_new = jnp.stack(
        [taps[d][li] for d in range(K - 2, -1, -1)], axis=2)

    xs = u[:, :din].reshape(T, H, P_)
    B = u[:, din:din + G * N].reshape(T, G, N)
    C = u[:, din + G * N:].reshape(T, G, N)
    # heads share B/C within their group (GQA-style)
    gh = jnp.arange(H) // (H // G)

    dt = jax.nn.softplus(
        dt_raw.astype(jnp.float32) + lp["dt_bias"].astype(jnp.float32))
    if time_step_min > 0.0 or _np.isfinite(time_step_max):
        dt = jnp.clip(dt, time_step_min, time_step_max)
    A = -jnp.exp(lp["A_log"].astype(jnp.float32))         # [H]
    dA = jnp.exp(dt * A[None])                            # [T, H]
    # dBx[t,h,p,n] = dt[t,h] * x[t,h,p] * B[t,g(h),n]
    dBx = (dt[:, :, None, None] * xs[:, :, :, None]
           * B[:, gh][:, :, None, :])

    b0 = jnp.where(is_start[:, None, None, None],
                   dBx + dA[:, :, None, None] * ssm0[rq], dBx)
    a0 = jnp.where(is_start[:, None, None, None],
                   jnp.zeros_like(dA[:, :, None, None]),
                   dA[:, :, None, None])

    def combine(left, right):
        al, bl = left
        ar, br = right
        return al * ar, bl * ar + br

    _, hs = jax.lax.associative_scan(combine, (a0, b0), axis=0)
    y = jnp.einsum("thpn,thn->thp", hs, C[:, gh])          # [T,H,P]
    y = y + xs * lp["D"].astype(jnp.float32)[None, :, None]
    y = y.reshape(T, din)
    # Gate/norm family: standard Mamba-2 (MambaRMSNormGated) normalizes
    # y * silu(z); FalconH1RMSNormGated can norm BEFORE gating
    # ("norm_then_gate", group-wise variance) or skip the norm entirely
    # ("gate_only", falcon_h1 mamba_rms_norm=False).
    def _group_rms(t):
        tg = t.reshape(T, norm_groups, din // norm_groups)
        var = jnp.mean(jnp.square(tg), axis=-1, keepdims=True)
        tg = tg * jax.lax.rsqrt(var + eps)
        return tg.reshape(T, din) * lp["gated_norm"].astype(jnp.float32)

    if gate_mode == "gate_only":
        y = y * jax.nn.silu(z.astype(jnp.float32))
    elif gate_mode == "norm_then_gate":
        y = _group_rms(y) * jax.nn.silu(z.astype(jnp.float32))
    else:  # "gate_then_norm" (Mamba-2 default)
        y = _group_rms(y * jax.nn.silu(z.astype(jnp.float32)))
    out = y.astype(h.dtype) @ lp["out_proj"]
    if "out_bias" in lp:
        out = out + lp["out_bias"]
    return out, hist_new, hs[li]


def forward(params, cfg: Mamba2Config, tri_cfg, token_ids, states, md,
            tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False):
    """states: [L, num_slots, W]. Returns (hidden [T, D], new states)."""
    assert not fused_decode
    del tri_cfg, tri_flags, lora, kv_quant, moe_fn
    T = token_ids.shape[0]
    H, P_, N = cfg.num_heads, cfg.mamba2_head_dim, cfg.state_size
    G = cfg.n_groups
    din, cd, K = cfg.intermediate_size, cfg.conv_dim, cfg.conv_kernel
    eps = cfg.layer_norm_epsilon
    R = md.seq_lens.shape[0]

    rq = md.req_idx
    qsl = md.query_start_loc
    off = jnp.arange(T, dtype=jnp.int32) - qsl[rq]
    is_start = off == 0
    slots = md.block_tables[:, 0]
    span = qsl[1:] - qsl[:-1]
    li = jnp.clip(qsl[:-1] + jnp.maximum(span, 1) - 1, 0, T - 1)
    has_tokens = span > 0

    x = params["embed_tokens"][token_ids]

    def layer_fn(x, scanned):
        lp, st = scanned
        rows = st[slots].astype(jnp.float32)                  # [R, W]
        conv_hist = rows[:, :cd * (K - 1)].reshape(R, cd, K - 1)
        ssm0 = rows[:, cd * (K - 1):].reshape(R, H, P_, N)

        h = rms_norm(x, lp["norm"], eps)
        out, hist_new, ssm_new = mamba2_mixer(
            lp, h, conv_hist, ssm0, rq, off, is_start, li,
            H=H, P_=P_, N=N, G=G, din=din, cd=cd, K=K, eps=eps,
            time_step_min=cfg.time_step_min,
            time_step_max=cfg.time_step_max)
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


def compute_logits(params, cfg: Mamba2Config, hidden):
    w = (params["embed_tokens"].T if cfg.tie_word_embeddings
         else params["lm_head"])
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)
