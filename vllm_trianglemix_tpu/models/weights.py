"""Checkpoint ingestion: HF safetensors directory → JAX param pytree.

Role of the reference's model_loader/default_loader.py + weight_utils.py,
JAX-shaped: tensors are read shard-by-shard as numpy (zero-copy mmap via
safetensors), transposed/stacked by the model's ``params_from_hf_state_dict``,
and device_put with the model's NamedShardings when a mesh is given.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Callable, Optional

import jax
import numpy as np

from vllm_trianglemix_tpu.logger import init_logger

logger = init_logger(__name__)


class SafetensorsReader:
    """Lazy tensor lookup across the shards of a checkpoint directory."""

    def __init__(self, path: str) -> None:
        from safetensors import safe_open  # ships with transformers

        self._handles = {}
        self._name_to_file: dict[str, str] = {}
        files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        if not files:
            raise FileNotFoundError(f"no *.safetensors under {path}")
        index_file = os.path.join(path, "model.safetensors.index.json")
        if os.path.exists(index_file):
            with open(index_file) as f:
                weight_map = json.load(f)["weight_map"]
            for name, fname in weight_map.items():
                self._name_to_file[name] = os.path.join(path, fname)
        else:
            for fname in files:
                h = safe_open(fname, framework="numpy")
                for name in h.keys():
                    self._name_to_file[name] = fname
                self._handles[fname] = h
        self._safe_open = safe_open

    def __call__(self, name: str) -> np.ndarray:
        fname = self._name_to_file[name]
        if fname not in self._handles:
            self._handles[fname] = self._safe_open(fname, framework="numpy")
        return self._handles[fname].get_tensor(name)

    def names(self) -> list[str]:
        return list(self._name_to_file)


def torch_state_dict_reader(state_dict) -> Callable[[str], np.ndarray]:
    """Adapter for tests: a torch model's state_dict as a get_tensor fn."""

    def get(name: str) -> np.ndarray:
        t = state_dict[name]
        return t.detach().to("cpu").float().numpy()

    return get


def shard_params(params, mesh, specs):
    """device_put every leaf with its NamedSharding (multi-chip load path)."""
    from jax.sharding import NamedSharding

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, params, specs)
