"""Quantized-checkpoint ingest: AWQ / GPTQ -> QuantLinear.

Layouts follow the reference exactly (vllm/model_executor/layers/
quantization/utils/quant_utils.py):

- AWQ (awq.py:22-206): ``qweight`` int32 [K, N/8] — logical 4-bit values
  first column-interleaved in groups of 8 with order [0,2,4,6,1,3,5,7]
  (``awq_pack``, quant_utils.py:579), then packed along N (``pack_cols``:
  nibble i of word c = interleaved column 8c+i). ``qzeros`` int32
  [K/G, N/8] same packing; ``scales`` fp16 [K/G, N].
  w = (q - z) * s.
- GPTQ (gptq.py:30-327): ``qweight`` int32 [K/8, N] packed along K
  (``pack_rows``: nibble i of word r = row 8r+i). ``qzeros`` int32
  [K/G, N/8] packed along N *without* interleave, stored as zero-1
  (the format's historical off-by-one: true zero = stored + 1).
  ``scales`` fp16 [K/G, N]; optional ``g_idx`` (act-order) must be
  trivial (sequential groups) for now.

Both convert to the engine's QuantLinear packing (ops/
quantized_matmul.py tile-halves layout, SIGNED values): the format's
unsigned 0..15 values and zero points shift by -8 so the stored nibbles
are signed int4 — w = (q_u - z_u) * s == ((q_u-8) - (z_u-8)) * s is
unchanged.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

AWQ_INTERLEAVE = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def _unpack_cols(packed: np.ndarray, bits: int = 4) -> np.ndarray:
    """pack_cols inverse (quant_utils.py:530 unpack_cols): int32 [K, N/f]
    -> uint8 [K, N], column i::f of each 8-block from nibble i."""
    factor = 32 // bits
    K, NP = packed.shape
    out = np.zeros((K, NP * factor), np.uint8)
    p = packed.astype(np.uint32)
    mask = (1 << bits) - 1
    for i in range(factor):
        out[:, i::factor] = (p & mask).astype(np.uint8)
        p >>= bits
    return out


def _unpack_rows(packed: np.ndarray, bits: int = 4) -> np.ndarray:
    """pack_rows inverse (quant_utils.py:480): int32 [K/f, N] -> uint8
    [K, N], row i::f from nibble i."""
    factor = 32 // bits
    KP, N = packed.shape
    out = np.zeros((KP * factor, N), np.uint8)
    p = packed.astype(np.uint32)
    mask = (1 << bits) - 1
    for i in range(factor):
        out[i::factor, :] = (p & mask).astype(np.uint8)
        p >>= bits
    return out


def _undo_awq_interleave(unpacked: np.ndarray) -> np.ndarray:
    """awq_pack applied interleave [0,2,4,6,1,3,5,7] over each 8-column
    block before pack_cols; undo it."""
    K, N = unpacked.shape
    blocks = unpacked.reshape(K, N // 8, 8)
    logical = np.empty_like(blocks)
    logical[:, :, AWQ_INTERLEAVE] = blocks
    return logical.reshape(K, N)


def unpack_awq(qweight: np.ndarray, bits: int = 4) -> np.ndarray:
    """AWQ int32 [K, N/8] -> logical uint8 values [K, N]."""
    if bits != 4:
        raise NotImplementedError("AWQ ingest supports 4-bit only")
    return _undo_awq_interleave(_unpack_cols(qweight, bits))


def _pack_signed(q_unsigned: np.ndarray) -> np.ndarray:
    """Unsigned 0..15 values [K, N] -> engine tile-halves packing
    (signed nibbles, shifted by -8)."""
    from vllm_trianglemix_tpu.ops.quantized_matmul import pack_int4

    q_s = (q_unsigned.astype(np.int16) - 8).astype(np.int8)
    return np.asarray(pack_int4(q_s, xp=np))


def load_awq_linear(get_tensor, prefix: str):
    """Read one AWQ linear ({prefix}.qweight/.qzeros/.scales) as numpy
    pieces of a QuantLinear (stacking/jnp conversion happens upstream)."""
    qweight = np.asarray(get_tensor(f"{prefix}.qweight"))
    qzeros = np.asarray(get_tensor(f"{prefix}.qzeros"))
    scales = np.asarray(get_tensor(f"{prefix}.scales")).astype(np.float32)
    q = unpack_awq(qweight)                      # [K, N]
    z = unpack_awq(qzeros).astype(np.float32) - 8.0  # [G, N], signed
    return _pack_signed(q), scales, z


def load_gptq_linear(get_tensor, prefix: str):
    """Read one GPTQ linear; rejects non-trivial act-order g_idx."""
    qweight = np.asarray(get_tensor(f"{prefix}.qweight"))
    qzeros = np.asarray(get_tensor(f"{prefix}.qzeros"))
    scales = np.asarray(get_tensor(f"{prefix}.scales")).astype(np.float32)
    try:
        g_idx = np.asarray(get_tensor(f"{prefix}.g_idx"))
    except KeyError:
        g_idx = None
    q = _unpack_rows(qweight)                    # [K, N]
    K = q.shape[0]
    G = scales.shape[0]
    if g_idx is not None and g_idx.size:
        expected = np.arange(K) // (K // G)
        if not np.array_equal(g_idx, expected):
            raise NotImplementedError(
                "GPTQ act-order (non-trivial g_idx) not supported")
    # format off-by-one (+1), then shift to signed (-8)
    z = _unpack_cols(qzeros).astype(np.float32) + 1.0 - 8.0
    return _pack_signed(q), scales, z


def load_w8a8_linear(get_tensor, prefix: str):
    """Read one W8A8 linear from a compressed-tensors / fp8 checkpoint:
    ``{prefix}.weight`` (int8 or f8e4m3, HF [out, in] layout) +
    ``{prefix}.weight_scale`` (scalar, [out] or [out, 1]). Returns
    (qweight [in, out], scale [1, out]) numpy pieces; static
    ``input_scale`` tensors are ignored — the engine always quantizes
    activations dynamically per token (finer than any static scale)."""
    w = np.asarray(get_tensor(f"{prefix}.weight"))
    s = np.asarray(get_tensor(f"{prefix}.weight_scale"),
                   dtype=np.float32).reshape(-1)
    out_dim = w.shape[0]
    if s.size == 1:
        s = np.full(out_dim, float(s[0]), np.float32)
    assert s.size == out_dim, (prefix, w.shape, s.shape)
    return w.T, s[None, :]


def detect_checkpoint_quantization(hf_config: dict) -> Optional[dict]:
    """Return {'method': ...} if the checkpoint is pre-quantized (HF
    quantization_config): 'awq' | 'gptq' | 'int8_w8a8' | 'fp8_w8a8'."""
    qc = hf_config.get("quantization_config")
    if not qc:
        return None
    method = (qc.get("quant_method") or "").lower()
    if method in ("awq", "gptq"):
        return {
            "method": method,
            "bits": qc.get("bits", 4),
            "group_size": qc.get("group_size", 128),
        }
    if method == "fp8":
        # Neuralmagic/vLLM-style FP8 checkpoints (reference fp8.py:71).
        return {"method": "fp8_w8a8"}
    if method == "compressed-tensors":
        # llm-compressor W8A8 schemes (reference compressed_tensors/):
        # one config group with 8-bit weights, int -> INT8 W8A8,
        # float -> FP8 W8A8.
        for group in (qc.get("config_groups") or {}).values():
            wcfg = group.get("weights") or {}
            if wcfg.get("num_bits") == 8:
                kind = (wcfg.get("type") or "int").lower()
                return {"method": ("fp8_w8a8" if kind == "float"
                                   else "int8_w8a8")}
        return None
    return None
