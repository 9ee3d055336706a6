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
    # "embed" returns the pooled vector; "classify" applies the model's
    # score head + softmax (reference layers/pooler.py classify task).
    task: str = "embed"

    def __post_init__(self):
        if self.pooling_type not in ("last", "mean", "cls"):
            raise ValueError(f"unknown pooling_type {self.pooling_type}")
        if self.task not in ("embed", "classify"):
            raise ValueError(f"unknown pooling task {self.task}")
