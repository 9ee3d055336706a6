"""Native host-runtime loader + pure-Python mirrors.

Compiles csrc/vtt_runtime.cpp on first use (cached under the repo build
dir), loads it via ctypes, and exposes:

- ``hash_blocks(tokens, block_size, parent)``  — chained 128-bit block
  digests (the per-request prefix-cache hashing hot loop);
- ``ngram_propose(tokens, n, k)``              — most-recent n-gram match
  lookup for speculative decoding.

The pure-Python fallbacks implement the *identical* algorithms (tested
equal) so behavior never depends on a compiler being present. Disable the
native path with VTT_USE_NATIVE_RUNTIME=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from vllm_trianglemix_tpu.logger import init_logger

logger = init_logger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "vtt_runtime.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")
_SO = os.path.join(_BUILD_DIR, "vtt_runtime.so")

_lock = threading.Lock()
_lib = None
_tried = False

_MASK = (1 << 64) - 1


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        from vllm_trianglemix_tpu import envs

        if not envs.VTT_USE_NATIVE_RUNTIME or not os.path.exists(_SRC):
            return None
        try:
            src_mtime = os.path.getmtime(_SRC)
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < src_mtime):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                     "-o", _SO + ".tmp"],
                    check=True, capture_output=True, timeout=120)
                os.replace(_SO + ".tmp", _SO)
            lib = ctypes.CDLL(_SO)
            lib.vtt_hash_blocks.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.vtt_ngram_propose.restype = ctypes.c_int32
            lib.vtt_ngram_propose.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64)]
            _lib = lib
            logger.info("native host runtime loaded (%s)", _SO)
        except Exception as e:  # noqa: BLE001
            logger.warning("native runtime unavailable (%s); "
                           "using Python fallbacks", e)
        return _lib


def native_available() -> bool:
    return _load() is not None


# --- chained block hashing ----------------------------------------------------

def _fmix64(x: int) -> int:
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & _MASK
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & _MASK
    x ^= x >> 33
    return x


def _hash_blocks_py(tokens, block_size: int,
                    parent: Optional[bytes]) -> list[bytes]:
    out = []
    n_blocks = len(tokens) // block_size
    for b in range(n_blocks):
        # Per-block reseed from the parent digest (chain semantics).
        h1 = 0x9E3779B97F4A7C15
        h2 = 0xC2B2AE3D27D4EB4F
        if parent is not None:
            h1 ^= int.from_bytes(parent[:8], "little")
            h2 ^= int.from_bytes(parent[8:16], "little")
        for t in tokens[b * block_size:(b + 1) * block_size]:
            t &= _MASK
            h1 = _fmix64(h1 ^ ((t * 0x9DDFEA08EB382D69) & _MASK))
            h2 = _fmix64(h2 ^ ((t * 0xA0761D6478BD642F) & _MASK) ^ h1)
        h1 = _fmix64(h1 ^ block_size)
        h2 = _fmix64(h2 ^ h1)
        parent = h1.to_bytes(8, "little") + h2.to_bytes(8, "little")
        out.append(parent)
    return out


def hash_blocks(tokens, block_size: int,
                parent: Optional[bytes] = None) -> list[bytes]:
    """16-byte chained digests for each full block of ``tokens``."""
    n_blocks = len(tokens) // block_size
    if n_blocks == 0:
        return []
    lib = _load()
    if lib is None:
        return _hash_blocks_py(tokens, block_size, parent)
    arr = np.ascontiguousarray(tokens[:n_blocks * block_size], np.int64)
    out = np.empty(n_blocks * 16, np.uint8)
    lib.vtt_hash_blocks(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        arr.size, block_size,
        parent if parent is not None else None,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    raw = out.tobytes()
    return [raw[i * 16:(i + 1) * 16] for i in range(n_blocks)]


# --- n-gram lookup ------------------------------------------------------------

def _ngram_propose_py(tokens, n: int, k: int) -> list[int]:
    L = len(tokens)
    if L <= n or n <= 0:
        return []
    suffix = tokens[L - n:]
    for start in range(L - n - 1, -1, -1):
        if tokens[start:start + n] == suffix:
            follow = start + n
            return list(tokens[follow:min(follow + k, L)])
    return []


def ngram_propose(tokens, n: int, k: int) -> list[int]:
    """Most recent earlier occurrence of the trailing n-gram; returns up
    to k continuation tokens (reference ngram_proposer.py:11 semantics)."""
    lib = _load()
    if lib is None:
        return _ngram_propose_py(list(tokens), n, k)
    arr = np.ascontiguousarray(tokens, np.int64)
    out = np.empty(max(k, 1), np.int64)
    cnt = lib.vtt_ngram_propose(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        arr.size, n, k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return [int(x) for x in out[:cnt]]
