"""Prompt n-gram draft proposer.

Role of the reference's NgramProposer (vllm/v1/spec_decode/
ngram_proposer.py:11): find the most recent earlier occurrence of the
sequence's trailing n-gram and propose the tokens that followed it. Tries
the longest n first (prompt_lookup_max down to prompt_lookup_min). The
match scan runs in the native C++ runtime (utils/native.py) with an
identical Python fallback.
"""

from __future__ import annotations

from vllm_trianglemix_tpu.config import SpeculativeConfig
from vllm_trianglemix_tpu.utils.native import ngram_propose


class NgramProposer:

    def __init__(self, config: SpeculativeConfig) -> None:
        self.k = config.num_speculative_tokens
        self.n_max = config.prompt_lookup_max
        self.n_min = config.prompt_lookup_min

    def propose(self, token_ids: list[int]) -> list[int]:
        for n in range(self.n_max, self.n_min - 1, -1):
            draft = ngram_propose(token_ids, n, self.k)
            if draft:
                return draft
        return []
