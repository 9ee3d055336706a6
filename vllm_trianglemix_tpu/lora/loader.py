"""LoRA adapter loading: HF/peft checkpoints -> stacked slot tensors.

Role of the reference's LoRAModel/LoRAModelManager loading path
(vllm/lora/models.py): read ``adapter_config.json`` (r, lora_alpha,
target_modules) + ``adapter_model.safetensors`` and produce, per target
module, slot-stacked tensors

    A[m]: [L, n_slots, D_in, r_max]      B[m]: [L, n_slots, r_max, D_out]

with slot 0 all-zero (the no-LoRA slot) and each adapter's alpha/r scaling
folded into B. Ranks below r_max are zero-padded — extra columns multiply
to zero, keeping one static shape for every adapter mix (the TPU-first
replacement for Punica's gather kernels).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.logger import init_logger

logger = init_logger(__name__)

# engine module key -> HF adapter fragment
_MODULE_FRAGMENTS = {
    "q_proj": "self_attn.q_proj",
    "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj",
    "o_proj": "self_attn.o_proj",
    "gate_proj": "mlp.gate_proj",
    "up_proj": "mlp.up_proj",
    "down_proj": "mlp.down_proj",
}


class LoRAAdapter:
    """One parsed adapter: per-module per-layer (A, B) numpy arrays."""

    def __init__(self, path: str) -> None:
        with open(os.path.join(path, "adapter_config.json")) as f:
            cfg = json.load(f)
        self.rank = cfg["r"]
        self.alpha = cfg.get("lora_alpha", self.rank)
        self.scaling = self.alpha / self.rank
        self.target_modules = set()
        for m in cfg.get("target_modules", []):
            # HF stores short names ("q_proj") or full paths
            short = m.rsplit(".", 1)[-1]
            if short in _MODULE_FRAGMENTS:
                self.target_modules.add(short)

        import glob

        from safetensors import safe_open

        files = (glob.glob(os.path.join(path, "adapter_model.safetensors"))
                 or glob.glob(os.path.join(path, "*.safetensors")))
        if not files:
            raise FileNotFoundError(f"no adapter safetensors under {path}")
        tensors = {}
        with safe_open(files[0], framework="numpy") as f:
            for name in f.keys():
                tensors[name] = f.get_tensor(name)
        # keys look like
        # base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight
        self.weights: dict[str, dict[int, tuple[np.ndarray, np.ndarray]]] = {}
        for name, t in tensors.items():
            if ".lora_A." not in name and ".lora_B." not in name:
                continue
            try:
                layer_idx = int(name.split(".layers.")[1].split(".")[0])
            except (IndexError, ValueError):
                continue
            for mod, frag in _MODULE_FRAGMENTS.items():
                if f".{frag}." in name:
                    per_layer = self.weights.setdefault(mod, {})
                    a, b = per_layer.get(layer_idx, (None, None))
                    if ".lora_A." in name:
                        a = t  # [r, D_in] (HF linear layout)
                    else:
                        b = t  # [D_out, r]
                    per_layer[layer_idx] = (a, b)
                    break


def adapter_slot_arrays(path: str, num_layers: int,
                        shapes: dict[str, tuple[int, int]],
                        max_rank: int) -> dict:
    """One adapter's per-module slot tensors (numpy), rank-padded to
    ``max_rank``: mod -> (A [L, D_in, r_max], B [L, r_max, D_out]).
    Used by dynamic adapter loading (reference /v1/load_lora_adapter)."""
    ad = LoRAAdapter(path)
    if ad.rank > max_rank:
        raise ValueError(
            f"adapter rank {ad.rank} exceeds the serving max_rank "
            f"{max_rank}; raise LoRAConfig.max_rank")
    out = {}
    for mod, (din, dout) in shapes.items():
        A = np.zeros((num_layers, din, max_rank), np.float32)
        B = np.zeros((num_layers, max_rank, dout), np.float32)
        for li, (a, b) in ad.weights.get(mod, {}).items():
            if a is None or b is None or li >= num_layers:
                continue
            r = a.shape[0]
            A[li, :, :r] = a.T                     # [D_in, r]
            B[li, :r, :] = b.T * ad.scaling        # [r, D_out]
        out[mod] = (A, B)
    return out


def load_lora_stacks(module_paths: dict[str, str], num_layers: int,
                     shapes: dict[str, tuple[int, int]],
                     dtype=jnp.bfloat16, n_slots: int = 0,
                     max_rank: int = 0):
    """Load adapters into slot-stacked tensors.

    module_paths: adapter name -> directory. shapes: module key ->
    (D_in, D_out) of the base projection. ``n_slots``/``max_rank`` grow
    the capacity beyond the initial adapters (free slots for dynamic
    /v1/load_lora_adapter). Returns (stacks, slot_map, max_rank) where
    stacks[m] = (A, B) jnp arrays and slot_map maps adapter name -> slot
    index (0 reserved for no-LoRA).
    """
    adapters = {name: LoRAAdapter(path)
                for name, path in module_paths.items()}
    if not adapters and n_slots <= 1:
        return None, {}, 0
    max_rank = max([a.rank for a in adapters.values()] + [max_rank or 0])
    if max_rank <= 0:
        max_rank = 16   # dynamic-only serving with no rank hint
    n_slots = max(len(adapters) + 1, n_slots)
    slot_map = {name: i + 1 for i, name in enumerate(sorted(adapters))}

    # With dynamic capacity every module keeps a stack (a later adapter
    # may touch modules the initial set doesn't).
    keep_all = n_slots > len(adapters) + 1
    stacks = {}
    for mod, (din, dout) in shapes.items():
        A = np.zeros((num_layers, n_slots, din, max_rank), np.float32)
        B = np.zeros((num_layers, n_slots, max_rank, dout), np.float32)
        used = keep_all
        for name, ad in adapters.items():
            slot = slot_map[name]
            per_layer = ad.weights.get(mod, {})
            for li, (a, b) in per_layer.items():
                if a is None or b is None or li >= num_layers:
                    continue
                r = a.shape[0]
                A[li, slot, :, :r] = a.T          # [D_in, r]
                # fold alpha/r into B
                B[li, slot, :r, :] = b.T * ad.scaling  # [r, D_out]
                used = True
        if used:
            stacks[mod] = (jnp.asarray(A, dtype), jnp.asarray(B, dtype))
    logger.info("loaded %d LoRA adapter(s), %d slots, max rank %d, "
                "modules: %s", len(adapters), n_slots, max_rank,
                sorted(stacks))
    return stacks, slot_map, max_rank
