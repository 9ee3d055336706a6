"""Incremental detokenization with stop-string scanning.

Role of the reference's IncrementalDetokenizer (v1/engine/detokenizer.py:29-255):
decode new tokens as they arrive without re-decoding the whole sequence,
holding back bytes that could still change (BPE merge boundaries), and check
stop strings over the rolling text tail.
"""

from __future__ import annotations

from typing import Optional

from vllm_trianglemix_tpu.sampling_params import SamplingParams


class IncrementalDetokenizer:
    """Slow-path incremental detokenizer (works with any HF tokenizer).

    Uses the standard offset-tracking trick: keep the last few token ids,
    decode the window, and emit only the stable suffix delta.
    """

    def __init__(self, tokenizer, params: SamplingParams,
                 prompt_token_ids: list[int]) -> None:
        self.tokenizer = tokenizer
        self.params = params
        self.token_ids: list[int] = list(prompt_token_ids)
        self.prompt_len = len(prompt_token_ids)
        # decode state
        self.prefix_offset = max(self.prompt_len - 6, 0)
        self.read_offset = self.prompt_len
        self.output_text = ""
        self.stop_strings = params.stop or []
        self._stop_buffer_len = (max(len(s) for s in self.stop_strings) - 1
                                 if self.stop_strings else 0)

    def update(self, new_token_ids: list[int]) -> Optional[str]:
        """Append tokens; returns the matched stop string if any."""
        if self.tokenizer is None:
            self.token_ids.extend(new_token_ids)
            return None
        stop = None
        skip = self.params.skip_special_tokens
        for tok in new_token_ids:
            self.token_ids.append(tok)
            prefix_text = self.tokenizer.decode(
                self.token_ids[self.prefix_offset:self.read_offset],
                skip_special_tokens=skip)
            new_text = self.tokenizer.decode(
                self.token_ids[self.prefix_offset:],
                skip_special_tokens=skip)
            if len(new_text) > len(prefix_text) and not new_text.endswith("�"):
                delta = new_text[len(prefix_text):]
                self.prefix_offset = self.read_offset
                self.read_offset = len(self.token_ids)
                self.output_text += delta
                stop = self._check_stop_strings()
                if stop is not None:
                    return stop
        return stop

    def _check_stop_strings(self) -> Optional[str]:
        """Truncate output_text at the earliest stop-string match."""
        for s in self.stop_strings:
            idx = self.output_text.find(s)
            if idx != -1:
                if self.params.include_stop_str_in_output:
                    self.output_text = self.output_text[:idx + len(s)]
                else:
                    self.output_text = self.output_text[:idx]
                return s
        return None

    @property
    def output_token_ids(self) -> list[int]:
        return self.token_ids[self.prompt_len:]
