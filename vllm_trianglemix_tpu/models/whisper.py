"""Whisper: encoder-decoder speech transcription over paged cross-KV.

Reference: vllm/model_executor/models/whisper.py + HF
transformers/models/whisper/modeling_whisper.py. Architecture:

- **Audio encoder**: two text-width Conv1Ds (stride 1 then 2) over the
  log-mel spectrogram, sinusoidal positions (stored in the checkpoint),
  then bidirectional pre-LayerNorm MHA blocks — 30 s of audio always
  becomes exactly ``max_source_positions`` (1500) states.
- **Decoder**: learned positions, pre-LayerNorm blocks of causal
  self-attention + CROSS-attention over the encoder states + GELU MLP;
  K projections carry no bias (HF convention); lm_head tied.

TPU-native design (NOT the reference's):
- the encoder runs through the engine's multimodal machinery (audio clip
  = one MultiModalItem of 1500 encoder tokens; outputs land in the
  device encoder pool, content-hash shared);
- cross-attention K/V are projected ONCE per request from the pooled
  encoder states and written into paged cache blocks of a second
  KV-cache group (CrossAttentionSpec/Manager —
  core/kv_cache_interface.py / single_type_kv_cache_manager.py), so
  decode steps never touch the 1500 encoder states again;
- decoder self-attention rides the shared Pallas ragged kernel (group-0
  block tables); cross-attention gathers the request's fixed 12 cross
  pages and runs grouped bidirectional attention via
  ``jax.lax.ragged_dot`` per head — rows are request-contiguous, so no
  per-token KV gather materializes.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from vllm_trianglemix_tpu.attention.backend import (
    padded_head_dim,
    ragged_paged_attention,
    write_kv,
    write_to_kv_cache,
)

IS_MULTIMODAL = True
IS_ENCODER_DECODER = True


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    d_model: int = 384
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    decoder_layers: int = 4
    decoder_attention_heads: int = 6
    encoder_ffn_dim: int = 1536
    decoder_ffn_dim: int = 1536
    num_mel_bins: int = 80
    max_source_positions: int = 1500
    max_target_positions: int = 448
    decoder_start_token_id: int = 50258
    eos_token_id: int = 50257
    bos_token_id: int = 50257
    pad_token_id: int = 50257
    forced_decoder_ids: tuple = ()   # ((position, token_id), ...)
    # engine-facing aliases
    sliding_window: int = 0
    num_experts: int = 0
    rope_scaling: Any = None

    @property
    def hidden_size(self) -> int:
        return self.d_model

    @property
    def num_hidden_layers(self) -> int:
        return self.decoder_layers

    @property
    def num_attention_heads(self) -> int:
        return self.decoder_attention_heads

    @property
    def num_key_value_heads(self) -> int:
        return self.decoder_attention_heads

    @property
    def head_dim(self) -> int:
        return self.d_model // self.decoder_attention_heads

    @property
    def max_position_embeddings(self) -> int:
        return self.max_target_positions

    @property
    def tokens_per_image(self) -> int:
        # engine multimodal accounting: one audio clip occupies
        # max_source_positions encoder-cache tokens
        return self.max_source_positions

    @property
    def intermediate_size(self) -> int:
        return self.decoder_ffn_dim

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "WhisperConfig":
        eos = cfg.get("eos_token_id", 50257)
        if isinstance(eos, list):
            eos = eos[0]
        return cls(
            vocab_size=cfg["vocab_size"],
            d_model=cfg["d_model"],
            encoder_layers=cfg["encoder_layers"],
            encoder_attention_heads=cfg["encoder_attention_heads"],
            decoder_layers=cfg["decoder_layers"],
            decoder_attention_heads=cfg["decoder_attention_heads"],
            encoder_ffn_dim=cfg.get("encoder_ffn_dim",
                                    4 * cfg["d_model"]),
            decoder_ffn_dim=cfg.get("decoder_ffn_dim",
                                    4 * cfg["d_model"]),
            num_mel_bins=cfg.get("num_mel_bins", 80),
            max_source_positions=cfg.get("max_source_positions", 1500),
            max_target_positions=cfg.get("max_target_positions", 448),
            decoder_start_token_id=cfg.get("decoder_start_token_id",
                                           50258),
            eos_token_id=eos,
            bos_token_id=cfg.get("bos_token_id", eos),
            pad_token_id=cfg.get("pad_token_id", eos),
            forced_decoder_ids=tuple(
                tuple(p) for p in (cfg.get("forced_decoder_ids") or ())),
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "WhisperConfig":
        with open(os.path.join(path, "config.json")) as f:
            cfg = cls.from_hf_config(json.load(f))
        gen = os.path.join(path, "generation_config.json")
        if os.path.exists(gen) and not cfg.forced_decoder_ids:
            with open(gen) as f:
                g = json.load(f)
            fdi = g.get("forced_decoder_ids")
            if fdi:
                object.__setattr__(
                    cfg, "forced_decoder_ids",
                    tuple(tuple(p) for p in fdi))
        return cfg

    def default_decoder_prompt(self) -> list[int]:
        """[<|startoftranscript|>, forced lang/task tokens...]."""
        ids = [self.decoder_start_token_id]
        for pos, tok in sorted(self.forced_decoder_ids):
            while len(ids) <= pos:
                ids.append(self.eos_token_id)
            if pos < len(ids):
                ids[pos:pos + 1] = [tok]
            else:
                ids.append(tok)
        return ids


# --- parameter tree -----------------------------------------------------------

def shape_tree(cfg: WhisperConfig) -> dict:
    D, V = cfg.d_model, cfg.vocab_size
    H = cfg.decoder_attention_heads
    Dh = cfg.head_dim
    Ld, Le = cfg.decoder_layers, cfg.encoder_layers
    Fd, Fe = cfg.decoder_ffn_dim, cfg.encoder_ffn_dim
    mel = cfg.num_mel_bins

    def attn(prefix: str, L: int) -> dict:
        return {
            f"{prefix}q_w": (L, D, H * Dh), f"{prefix}q_b": (L, H * Dh),
            f"{prefix}k_w": (L, D, H * Dh),           # no k bias (HF)
            f"{prefix}v_w": (L, D, H * Dh), f"{prefix}v_b": (L, H * Dh),
            f"{prefix}o_w": (L, H * Dh, D), f"{prefix}o_b": (L, D),
        }

    dec_layers = {
        "self_ln_w": (Ld, D), "self_ln_b": (Ld, D),
        **attn("", Ld),
        "cross_ln_w": (Ld, D), "cross_ln_b": (Ld, D),
        **attn("c_", Ld),
        "final_ln_w": (Ld, D), "final_ln_b": (Ld, D),
        "fc1_w": (Ld, D, Fd), "fc1_b": (Ld, Fd),
        "fc2_w": (Ld, Fd, D), "fc2_b": (Ld, D),
    }
    enc_layers = {
        "ln1_w": (Le, D), "ln1_b": (Le, D),
        **attn("", Le),
        "ln2_w": (Le, D), "ln2_b": (Le, D),
        "fc1_w": (Le, D, Fe), "fc1_b": (Le, Fe),
        "fc2_w": (Le, Fe, D), "fc2_b": (Le, D),
    }
    return {
        "embed_tokens": (V, D),
        "dec_pos": (cfg.max_target_positions, D),
        "layers": dec_layers,
        "norm_w": (D,), "norm_b": (D,),
        "conv1_w": (D, mel, 3), "conv1_b": (D,),
        "conv2_w": (D, D, 3), "conv2_b": (D,),
        "enc_pos": (cfg.max_source_positions, D),
        "enc_layers": enc_layers,
        "enc_ln_w": (D,), "enc_ln_b": (D,),
    }


def partition_specs(cfg: WhisperConfig, quantized=None) -> dict:
    # Whisper checkpoints are small (<= 1.5B); replicate everything.
    return jax.tree_util.tree_map(lambda s: P(*([None] * len(s))),
                                  shape_tree(cfg),
                                  is_leaf=lambda x: isinstance(x, tuple))


def init_random(cfg: WhisperConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    vals = [(jax.random.normal(k, s, jnp.float32) * 0.02).astype(dtype)
            for k, s in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, vals)


def params_from_hf_state_dict(cfg: WhisperConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized Whisper checkpoints are not "
                         "supported yet")

    def t(name):
        return np.asarray(get_tensor(name))

    def stack(fmt: str, L: int, transpose: bool) -> jnp.ndarray:
        mats = []
        for i in range(L):
            w = t(fmt.format(i=i))
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), dtype=dtype)

    def attn_params(base: str, L: int, prefix: str) -> dict:
        out = {}
        for ours, theirs, tr in (
                ("q_w", "q_proj.weight", True), ("q_b", "q_proj.bias", 0),
                ("k_w", "k_proj.weight", True),
                ("v_w", "v_proj.weight", True), ("v_b", "v_proj.bias", 0),
                ("o_w", "out_proj.weight", True),
                ("o_b", "out_proj.bias", 0)):
            out[prefix + ours] = stack(f"{base}.{theirs}", L, tr is True)
        return out

    Ld, Le = cfg.decoder_layers, cfg.encoder_layers
    d = "model.decoder.layers.{i}"
    e = "model.encoder.layers.{i}"
    dec_layers = {
        "self_ln_w": stack(f"{d}.self_attn_layer_norm.weight", Ld, False),
        "self_ln_b": stack(f"{d}.self_attn_layer_norm.bias", Ld, False),
        **attn_params(f"{d}.self_attn", Ld, ""),
        "cross_ln_w": stack(f"{d}.encoder_attn_layer_norm.weight", Ld,
                            False),
        "cross_ln_b": stack(f"{d}.encoder_attn_layer_norm.bias", Ld,
                            False),
        **attn_params(f"{d}.encoder_attn", Ld, "c_"),
        "final_ln_w": stack(f"{d}.final_layer_norm.weight", Ld, False),
        "final_ln_b": stack(f"{d}.final_layer_norm.bias", Ld, False),
        "fc1_w": stack(f"{d}.fc1.weight", Ld, True),
        "fc1_b": stack(f"{d}.fc1.bias", Ld, False),
        "fc2_w": stack(f"{d}.fc2.weight", Ld, True),
        "fc2_b": stack(f"{d}.fc2.bias", Ld, False),
    }
    enc_layers = {
        "ln1_w": stack(f"{e}.self_attn_layer_norm.weight", Le, False),
        "ln1_b": stack(f"{e}.self_attn_layer_norm.bias", Le, False),
        **attn_params(f"{e}.self_attn", Le, ""),
        "ln2_w": stack(f"{e}.final_layer_norm.weight", Le, False),
        "ln2_b": stack(f"{e}.final_layer_norm.bias", Le, False),
        "fc1_w": stack(f"{e}.fc1.weight", Le, True),
        "fc1_b": stack(f"{e}.fc1.bias", Le, False),
        "fc2_w": stack(f"{e}.fc2.weight", Le, True),
        "fc2_b": stack(f"{e}.fc2.bias", Le, False),
    }
    return {
        "embed_tokens": jnp.asarray(t("model.decoder.embed_tokens.weight"),
                                    dtype),
        "dec_pos": jnp.asarray(t("model.decoder.embed_positions.weight"),
                               dtype),
        "layers": dec_layers,
        "norm_w": jnp.asarray(t("model.decoder.layer_norm.weight"), dtype),
        "norm_b": jnp.asarray(t("model.decoder.layer_norm.bias"), dtype),
        "conv1_w": jnp.asarray(t("model.encoder.conv1.weight"), dtype),
        "conv1_b": jnp.asarray(t("model.encoder.conv1.bias"), dtype),
        "conv2_w": jnp.asarray(t("model.encoder.conv2.weight"), dtype),
        "conv2_b": jnp.asarray(t("model.encoder.conv2.bias"), dtype),
        "enc_pos": jnp.asarray(t("model.encoder.embed_positions.weight"),
                               dtype),
        "enc_layers": enc_layers,
        "enc_ln_w": jnp.asarray(t("model.encoder.layer_norm.weight"),
                                dtype),
        "enc_ln_b": jnp.asarray(t("model.encoder.layer_norm.bias"), dtype),
    }


# --- shared pieces -----------------------------------------------------------

def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(x.dtype)


def _gelu(x):
    return jax.nn.gelu(x.astype(jnp.float32),
                       approximate=False).astype(x.dtype)


# --- audio encoder -----------------------------------------------------------

def encode_images(params, cfg: WhisperConfig, feats: jnp.ndarray
                  ) -> jnp.ndarray:
    """Log-mel features [N, num_mel_bins, 3000] -> encoder states
    [N, 1500, D]. (Named for the runner's generic multimodal hook; the
    "images" here are audio spectrograms.)"""
    H = cfg.encoder_attention_heads
    D = cfg.d_model
    Dh = D // H
    dn = ("NCW", "OIW", "NCW")
    x = lax.conv_general_dilated(
        feats.astype(params["conv1_w"].dtype), params["conv1_w"],
        window_strides=(1,), padding=[(1, 1)], dimension_numbers=dn)
    x = _gelu(x + params["conv1_b"][None, :, None])
    x = lax.conv_general_dilated(
        x, params["conv2_w"], window_strides=(2,), padding=[(1, 1)],
        dimension_numbers=dn)
    x = _gelu(x + params["conv2_b"][None, :, None])
    x = jnp.transpose(x, (0, 2, 1))                       # [N, 1500, D]
    x = x + params["enc_pos"][None].astype(x.dtype)
    scale = Dh ** -0.5

    def block(x, lp):
        N, S, _ = x.shape
        h = _ln(x, lp["ln1_w"], lp["ln1_b"])
        q = (h @ lp["q_w"] + lp["q_b"]).reshape(N, S, H, Dh)
        k = (h @ lp["k_w"]).reshape(N, S, H, Dh)
        v = (h @ lp["v_w"] + lp["v_b"]).reshape(N, S, H, Dh)
        s = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p_attn = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        a = jnp.einsum("nhqk,nkhd->nqhd", p_attn, v).reshape(N, S, -1)
        x = x + (a @ lp["o_w"] + lp["o_b"])
        h2 = _ln(x, lp["ln2_w"], lp["ln2_b"])
        x = x + (_gelu(h2 @ lp["fc1_w"] + lp["fc1_b"]) @ lp["fc2_w"]
                 + lp["fc2_b"])
        return x, None

    x, _ = jax.lax.scan(block, x, params["enc_layers"])
    return _ln(x, params["enc_ln_w"], params["enc_ln_b"])


# --- cross-KV fill ------------------------------------------------------------

def fill_cross_kv(params, cfg: WhisperConfig, kv_caches: jnp.ndarray,
                  enc: jnp.ndarray, slot_mapping: jnp.ndarray
                  ) -> jnp.ndarray:
    """Project per-layer cross K/V from pooled encoder states and scatter
    them into the cross-group pages (done ONCE per request).

    kv_caches: [L, blocks, page, 2H, Dpad]; enc: [M, D] (batched new
    requests' encoder rows); slot_mapping: int32[M] flat slots into each
    layer's cross blocks (pad rows < 0 drop)."""
    H, Dh = cfg.decoder_attention_heads, cfg.head_dim

    def per_layer(_, scanned):
        kv_l, lp = scanned
        k = (enc @ lp["c_k_w"]).reshape(-1, H, Dh)
        v = (enc @ lp["c_v_w"] + lp["c_v_b"]).reshape(-1, H, Dh)
        return None, write_to_kv_cache(kv_l, k, v, slot_mapping)

    _, new_kv = jax.lax.scan(per_layer, None,
                             (kv_caches, params["layers"]))
    return new_kv


# --- decoder forward ----------------------------------------------------------

def forward(params, cfg: WhisperConfig, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False, mm_scatter=None):
    """Decoder pass over the ragged token batch. Self-attention uses
    group-0 pages (causal, shared ragged kernel); cross-attention reads
    the request's pre-filled group-1 pages."""
    assert not fused_decode, "Whisper fused-decode path not implemented"
    del tri_cfg, tri_flags, lora, kv_quant, moe_fn, mm_scatter
    T = token_ids.shape[0]
    H, Dh, D = (cfg.decoder_attention_heads, cfg.head_dim, cfg.d_model)
    scale = Dh ** -0.5
    page = kv_caches.shape[2]
    Pc = cdiv(cfg.max_source_positions, page)
    C = Pc * page
    S_enc = cfg.max_source_positions

    pos = jnp.clip(md.positions, 0, cfg.max_target_positions - 1)
    x = (params["embed_tokens"][token_ids]
         + params["dec_pos"][pos].astype(params["embed_tokens"].dtype))

    if md.block_tables_g is not None:
        md0 = md._replace(block_tables=md.block_tables_g[0],
                          slot_mapping=md.slot_mapping_g[0],
                          kv_slices=None, num_kv_slices=None)
        ctab = md.block_tables_g[1]
    else:  # single-group callers (unit tests)
        md0 = md
        ctab = md.block_tables
    ctab = ctab[:, :Pc]                                  # [R, Pc]

    # Cross-attention row groups: q rows are request-contiguous
    # (query_start_loc); the pad tail joins the last group (its outputs
    # are never selected by logits_indices).
    R = ctab.shape[0]
    qsl = md.query_start_loc
    sizes = jnp.diff(qsl).astype(jnp.int32)
    sizes = sizes.at[R - 1].add(jnp.int32(T) - qsl[R])

    col_pad = (lax.broadcasted_iota(jnp.int32, (1, C), 1)
               >= S_enc) if C > S_enc else None

    def cross_attention(h, lp, kv_l):
        qc = (h @ lp["c_q_w"] + lp["c_q_b"]).reshape(T, H, Dh)
        pages = kv_l[ctab]                    # [R, Pc, page, 2H, Dpad]
        pages = pages.reshape(R, C, 2 * H, -1)[..., :Dh]
        kc = pages[:, :, 0::2, :]                        # [R, C, H, Dh]
        vc = pages[:, :, 1::2, :]
        outs = []
        for hh in range(H):
            s = lax.ragged_dot(
                qc[:, hh, :],
                jnp.swapaxes(kc[:, :, hh, :], 1, 2),     # [R, Dh, C]
                sizes,
                preferred_element_type=jnp.float32) * scale  # [T, C]
            if col_pad is not None:
                s = jnp.where(col_pad, -1e30, s)
            p_attn = jax.nn.softmax(s, axis=-1)
            outs.append(lax.ragged_dot(
                p_attn.astype(vc.dtype), vc[:, :, hh, :], sizes))
        a = jnp.stack(outs, axis=1).reshape(T, H * Dh)
        return a @ lp["c_o_w"] + lp["c_o_b"]

    def layer(x, scanned):
        lp, kv_l = scanned
        # causal self-attention over the paged group-0 cache
        h = _ln(x, lp["self_ln_w"], lp["self_ln_b"])
        q = (h @ lp["q_w"] + lp["q_b"]).reshape(T, H, Dh)
        k = (h @ lp["k_w"]).reshape(T, H, Dh)
        v = (h @ lp["v_w"] + lp["v_b"]).reshape(T, H, Dh)
        kv_l = write_kv(kv_l, k, v, md0)
        a = ragged_paged_attention(q, kv_l, md0, False, scale=scale,
                                   tri_enabled=False)
        x = x + (a.reshape(T, H * Dh) @ lp["o_w"] + lp["o_b"])
        # cross-attention over the pre-filled group-1 pages
        h = _ln(x, lp["cross_ln_w"], lp["cross_ln_b"])
        x = x + cross_attention(h, lp, kv_l)
        # MLP
        h2 = _ln(x, lp["final_ln_w"], lp["final_ln_b"])
        x = x + (_gelu(h2 @ lp["fc1_w"] + lp["fc1_b"]) @ lp["fc2_w"]
                 + lp["fc2_b"])
        return x, kv_l

    x, new_kv = jax.lax.scan(layer, x, (params["layers"], kv_caches))
    x = _ln(x, params["norm_w"], params["norm_b"])
    return x, new_kv


def compute_logits(params, cfg: WhisperConfig, hidden):
    return jnp.dot(hidden, params["embed_tokens"].T,
                   preferred_element_type=jnp.float32)


# --- KV cache declaration -----------------------------------------------------

def kv_cache_group_specs(cfg: WhisperConfig, block_size: int,
                         dtype_bytes: int = 2):
    from vllm_trianglemix_tpu.core.kv_cache_interface import (
        CrossAttentionSpec,
        FullAttentionSpec,
        KVCacheGroupSpec,
    )
    common = dict(block_size=block_size,
                  num_kv_heads=cfg.decoder_attention_heads,
                  head_size=padded_head_dim(cfg.head_dim),
                  dtype_bytes=dtype_bytes)
    return [
        KVCacheGroupSpec(("decoder_self",), FullAttentionSpec(**common)),
        KVCacheGroupSpec(
            ("decoder_cross",),
            CrossAttentionSpec(
                **common, num_encoder_tokens=cfg.max_source_positions)),
    ]


def kv_cache_spec(cfg: WhisperConfig, block_size: int,
                  dtype_bytes: int = 2):
    return kv_cache_group_specs(cfg, block_size, dtype_bytes)[0] \
        .kv_cache_spec
