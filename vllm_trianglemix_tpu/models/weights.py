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
            # fairseq2 checkpoints ship torch pickles (model.pt, or
            # model.{rank}.pt tp shards) wrapped as
            # {"model_key": name, name: state_dict} — reference
            # fairseq2_llama.py load_weights unwraps the same way.
            pt = os.path.join(path, "model.pt")
            if os.path.exists(pt):
                import torch

                blob = torch.load(pt, map_location="cpu",
                                  weights_only=True)
                if "model_key" in blob:
                    blob = blob[blob["model_key"]]
                self._pt_state = {
                    k: v for k, v in blob.items()
                    if hasattr(v, "detach")}
                return
            raise FileNotFoundError(f"no *.safetensors under {path}")
        self._pt_state = None
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
        if self._pt_state is not None:
            return self._pt_state[name].detach().float().numpy()
        fname = self._name_to_file[name]
        if fname not in self._handles:
            self._handles[fname] = self._safe_open(fname, framework="numpy")
        return self._handles[fname].get_tensor(name)

    def names(self) -> list[str]:
        if self._pt_state is not None:
            return list(self._pt_state)
        return list(self._name_to_file)


def torch_state_dict_reader(state_dict) -> Callable[[str], np.ndarray]:
    """Adapter for tests: a torch model's state_dict as a get_tensor fn."""

    def get(name: str) -> np.ndarray:
        t = state_dict[name]
        return t.detach().to("cpu").float().numpy()

    return get


_NATIVE_STATE_FILE = "vtt_native_state.safetensors"
_NATIVE_META_FILE = "vtt_native_state.json"


def _flatten_params(params, prefix=""):
    flat = {}
    for k, v in params.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten_params(v, key + "."))
        elif isinstance(v, tuple):  # QuantLinear NamedTuple
            for fname, leaf in zip(v._fields, v):
                if leaf is not None:
                    flat[f"{key}.{fname}"] = leaf
        else:
            flat[key] = v
    return flat


def save_native_state(params, path: str, rank: int = 0,
                      world_size: int = 1) -> None:
    """Save the engine's stacked param tree for fast resume (the
    reference's save_sharded_state role, core.py:401 /
    sharded_state_loader.py: skip HF-layout transposes on reload; one
    file per host rank)."""
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    flat = _flatten_params(params)
    arrays = {}
    meta = {"dtypes": {}, "world_size": world_size}
    for k, v in flat.items():
        arr = np.asarray(jax.device_get(v))
        if arr.dtype == jnp.bfloat16:
            meta["dtypes"][k] = "bfloat16"
            arr = arr.view(np.uint16)
        elif str(arr.dtype) == "float8_e4m3fn":
            meta["dtypes"][k] = "float8_e4m3fn"
            arr = arr.view(np.uint8)
        arrays[k] = arr
    fname = (_NATIVE_STATE_FILE if world_size == 1 else
             f"vtt_native_state-rank{rank}-of-{world_size}.safetensors")
    save_file(arrays, os.path.join(path, fname))
    with open(os.path.join(path, _NATIVE_META_FILE), "w") as f:
        json.dump(meta, f)
    logger.info("saved native state to %s (%d tensors)", path, len(arrays))


def has_native_state(path: str) -> bool:
    return os.path.exists(os.path.join(path, _NATIVE_STATE_FILE)) and \
        os.path.exists(os.path.join(path, _NATIVE_META_FILE))


def load_native_state(path: str):
    """Load a save_native_state checkpoint back into a flat dict of jnp
    arrays; the model's shape_tree re-nests it."""
    import jax.numpy as jnp
    from safetensors import safe_open

    with open(os.path.join(path, _NATIVE_META_FILE)) as f:
        meta = json.load(f)
    flat = {}
    with safe_open(os.path.join(path, _NATIVE_STATE_FILE),
                   framework="numpy") as f:
        for name in f.keys():
            arr = f.get_tensor(name)
            dt = meta["dtypes"].get(name)
            if dt == "bfloat16":
                arr = arr.view(jnp.bfloat16)
            elif dt == "float8_e4m3fn":
                arr = arr.view(jnp.float8_e4m3fn)
            flat[name] = jnp.asarray(arr)
    return flat


def unflatten_params(flat: dict, template: dict):
    """Re-nest a flat name->array dict following a template tree (shape
    tree or an existing params tree)."""
    from vllm_trianglemix_tpu.quantization.linear import QuantLinear

    def build(node, prefix=""):
        out = {}
        for k, v in node.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                out[k] = build(v, key + ".")
            elif isinstance(v, QuantLinear):
                out[k] = QuantLinear(
                    qweight=flat[f"{key}.qweight"],
                    scale=flat[f"{key}.scale"],
                    zero=flat.get(f"{key}.zero"),
                )
            else:
                out[k] = flat[key]
        return out

    return build(template)


def prune_specs_like(params, specs):
    """Drop spec entries where the param tree has None (e.g. a
    QuantLinear whose optional ``zero`` is absent) so tree_map over
    (params, specs) structurally matches."""
    if params is None:
        return None
    if isinstance(params, dict):
        return {k: (prune_specs_like(v, specs[k]) if k in specs else None)
                for k, v in params.items()}
    if isinstance(params, tuple) and hasattr(params, "_fields"):
        return type(params)(*(prune_specs_like(getattr(params, f),
                                               getattr(specs, f))
                              for f in params._fields))
    return specs


def shard_params(params, mesh, specs):
    """device_put every leaf with its NamedSharding (multi-chip load path)."""
    from jax.sharding import NamedSharding

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, params, prune_specs_like(params, specs))
