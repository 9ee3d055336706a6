"""Device-mesh construction.

The TPU replacement for the reference's GroupCoordinator process groups
(parallel_state.py:171): parallelism is a ``jax.sharding.Mesh`` with named
axes — ``dp`` (replicated engines / batch), ``tp`` (tensor parallel over
ICI), optional ``cp`` (decode context parallel, KV sharding). XLA's SPMD
partitioner emits the collectives (psum/all-gather/reduce-scatter) that the
reference implements by hand in NCCL/custom CUDA.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(tp: int = 1, dp: int = 1, cp: int = 1, pp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    needed = tp * dp * cp * pp
    if len(devices) < needed:
        raise ValueError(
            f"mesh needs {needed} devices (tp={tp} dp={dp} cp={cp} "
            f"pp={pp}), have {len(devices)}")
    grid = np.asarray(devices[:needed]).reshape(dp, cp, pp, tp)
    return Mesh(grid, axis_names=("dp", "cp", "pp", "tp"))


def single_device_mesh() -> Mesh:
    return make_mesh(tp=1, dp=1)
