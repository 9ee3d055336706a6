"""Per-step attention metadata (fixed-shape, device-resident).

Mirror of the reference's PallasMetadata/CommonAttentionMetadata
(vllm/v1/attention/backends/pallas.py, v1/attention/backends/utils.py:45):
every field is padded to the step's (token, request) bucket so the jitted
step function never recompiles on batch mutation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class AttentionMetadata(NamedTuple):
    # --- per-token (padded to T) ---
    positions: jnp.ndarray      # int32[T] absolute position in its sequence
    req_idx: jnp.ndarray        # int32[T] request row (R) each token belongs to
    slot_mapping: jnp.ndarray   # int32[T] flat KV slot (block*page+off); -1 pad
    # --- per-request (padded to R) ---
    block_tables: jnp.ndarray   # int32[R, max_blocks]
    seq_lens: jnp.ndarray       # int32[R] context length INCLUDING this step's
                                #   scheduled tokens; 0 for padded rows
    prompt_lens: jnp.ndarray    # int32[R] prompt length (TriangleMix N)
    query_start_loc: jnp.ndarray  # int32[R+1] cumulative query token offsets
    logits_indices: jnp.ndarray   # int32[R] flat index of each request's last
                                  #   scheduled token (for sampling)
    # --- scalars ---
    num_reqs: jnp.ndarray       # int32[] actual (unpadded) request count
    # --- KV-update slices (host-built contiguous runs; None => XLA scatter
    #     fallback from slot_mapping) ---
    kv_slices: Optional[jnp.ndarray] = None      # int32[3, S]
    num_kv_slices: Optional[jnp.ndarray] = None  # int32[]
    # --- hybrid KV-cache groups (reference kv_cache_coordinator.py):
    #     per-group block tables / slot mappings when layers split into
    #     multiple cache groups (e.g. alternating sliding/full attention).
    #     None for single-group models; group 0's view also populates the
    #     flat fields above. ---
    block_tables_g: Optional[jnp.ndarray] = None  # int32[G, R, max_blocks]
    slot_mapping_g: Optional[jnp.ndarray] = None  # int32[G, T]
    # --- pipeline-parallel microbatches (parallel/pp.py): per-token
    #     fields re-sliced into M stacked microbatches so all pp stages
    #     compute concurrently. Dict of int32 arrays with leading M axis:
    #     positions/req_idx/slot_mapping [M, T/M], query_start_loc
    #     [M, R+1], kv_slices [M, 3, S'], num_kv_slices [M]. None when
    #     pp is off or the batch doesn't split. ---
    pp_mb: Optional[dict] = None
    # --- multimodal rotary (Qwen2-VL mrope): (temporal, height, width)
    #     position ids per token; None for 1-D rope models ---
    mrope_positions: Optional[jnp.ndarray] = None  # int32[3, T]
    # --- cascade attention (attention/cascade.py): block ids of the
    #     batch-wide shared prefix (padded; -1 beyond) and its token
    #     length. None = no cascade this step. ---
    shared_block_tables: Optional[jnp.ndarray] = None  # int32[K]
    shared_prefix_len: Optional[jnp.ndarray] = None    # int32[]
    # --- tree speculative decoding (spec_decode/: star-chain trees):
    #     per-token row kind — 0 real input, 1 chain draft (branch 0),
    #     2 sibling draft. Tree rows (1/2) never write KV this step and
    #     attend to the step's other rows through the tree-masked block
    #     of attention/backend.py:spec_tree_attention. None = no tree. ---
    spec_flags: Optional[jnp.ndarray] = None  # int32[T]

    @property
    def num_tokens_padded(self) -> int:
        return self.positions.shape[0]

    @property
    def num_reqs_padded(self) -> int:
        return self.seq_lens.shape[0]
