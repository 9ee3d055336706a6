"""Fixed-shape per-request sampling tensors.

Mirror of the reference's TPUSupportedSamplingMetadata
(vllm/v1/sample/tpu/metadata.py): every field is a dense padded array so the
sampling graph never recompiles; padded rows get neutral values.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.sampling_params import SamplingParams


class SamplingMetadata(NamedTuple):
    temperature: jnp.ndarray   # f32[R]; 0 => greedy
    top_k: jnp.ndarray         # int32[R]; 0 => disabled
    top_p: jnp.ndarray         # f32[R]; 1.0 => disabled
    min_p: jnp.ndarray         # f32[R]; 0.0 => disabled
    seeds: jnp.ndarray         # uint32[R] per-request fold for the step key
    repetition_penalty: jnp.ndarray  # f32[R]; 1.0 => disabled
    all_greedy: bool           # static hint: skip the random path entirely


def build_sampling_metadata(params_list: list[SamplingParams],
                            step_counters: list[int],
                            num_reqs_padded: int) -> SamplingMetadata:
    R = num_reqs_padded
    temperature = np.zeros(R, np.float32)
    top_k = np.zeros(R, np.int32)
    top_p = np.ones(R, np.float32)
    min_p = np.zeros(R, np.float32)
    seeds = np.zeros(R, np.uint32)
    rep = np.ones(R, np.float32)
    for i, (p, ctr) in enumerate(zip(params_list, step_counters)):
        temperature[i] = p.temperature
        top_k[i] = p.top_k
        top_p[i] = p.top_p
        min_p[i] = p.min_p
        rep[i] = p.repetition_penalty
        # Per-request determinism: seed ^ step counter (0 seed => engine key).
        seeds[i] = np.uint32(((p.seed or 0) + ctr * 2654435761) & 0xFFFFFFFF)
    all_greedy = all(p.temperature == 0.0 for p in params_list)
    return SamplingMetadata(
        temperature=jnp.asarray(temperature),
        top_k=jnp.asarray(top_k),
        top_p=jnp.asarray(top_p),
        min_p=jnp.asarray(min_p),
        seeds=jnp.asarray(seeds),
        repetition_penalty=jnp.asarray(rep),
        all_greedy=all_greedy,
    )
