"""Pooling parameters for embedding requests (reference
vllm/pooling_params.py surface)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class PoolingParams:
    # "last" = final-token hidden state (decoder-style embedders),
    # "mean" = masked mean over the sequence, "cls" = first token.
    pooling_type: str = "last"
    normalize: bool = True
    # embedding dimension truncation (OpenAI `dimensions`); 0 = full
    dimensions: int = 0

    def __post_init__(self):
        if self.pooling_type not in ("last", "mean", "cls"):
            raise ValueError(f"unknown pooling_type {self.pooling_type}")
