"""Pallas ragged paged attention (TPU hot path).

Round-1 placeholder: forwards to the XLA-native implementation while the
fused kernel (flash-style online softmax over pages, TriangleMix block
skipping, GQA packing) lands. The dispatcher in attention/backend.py routes
here on TPU.
"""

from __future__ import annotations

from vllm_trianglemix_tpu.attention.backend import ragged_paged_attention_xla


def ragged_paged_attention_pallas(q, kv_cache, md, use_triangle=False,
                                  **kwargs):
    return ragged_paged_attention_xla(q, kv_cache, md, use_triangle, **kwargs)
