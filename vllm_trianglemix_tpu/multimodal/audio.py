"""Audio preprocessing for encoder-decoder speech models (Whisper).

Role of the reference's audio frontend (vllm serving_transcription +
HF WhisperFeatureExtractor): waveform -> 30 s pad/truncate -> log-mel
spectrogram [num_mel_bins, 3000]. The spectrogram math delegates to HF's
numpy WhisperFeatureExtractor (same library the tokenizer glue already
uses), loaded from the checkpoint's preprocessor_config.json when
present; WAV decoding and naive linear resampling live here so the API
server needs no audio dependencies.
"""

from __future__ import annotations

import io
import wave
from typing import Any, Optional

import numpy as np

SAMPLE_RATE = 16_000


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono waveform in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(data)) as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(frames, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, np.int32).astype(np.float32) / 2**31
    elif width == 1:
        x = (np.frombuffer(frames, np.uint8).astype(np.float32)
             - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, sr


def resample_linear(x: np.ndarray, sr: int,
                    target_sr: int = SAMPLE_RATE) -> np.ndarray:
    """Naive linear resampling (adequate for speech transcription)."""
    if sr == target_sr or x.size == 0:
        return x
    n_out = int(round(x.size * target_sr / sr))
    src = np.linspace(0.0, x.size - 1, n_out)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, x.size - 1)
    frac = (src - lo).astype(np.float32)
    return (x[lo] * (1 - frac) + x[hi] * frac).astype(np.float32)


class AudioFeatureProcessor:
    """waveform (float32 @ 16 kHz, or (waveform, sr) tuple, or WAV
    bytes) -> log-mel features [num_mel_bins, 3000]."""

    def __init__(self, model_path: Optional[str] = None,
                 num_mel_bins: int = 80):
        from transformers import WhisperFeatureExtractor

        self.fe = None
        if model_path:
            try:
                self.fe = WhisperFeatureExtractor.from_pretrained(
                    model_path)
            except (OSError, ValueError):
                pass
        if self.fe is None:
            self.fe = WhisperFeatureExtractor(feature_size=num_mel_bins)

    def __call__(self, audio: Any) -> np.ndarray:
        if isinstance(audio, (bytes, bytearray)):
            wav, sr = decode_wav(bytes(audio))
            audio = resample_linear(wav, sr)
        elif isinstance(audio, tuple):
            wav, sr = audio
            audio = resample_linear(np.asarray(wav, np.float32), int(sr))
        else:
            audio = np.asarray(audio, np.float32)
        out = self.fe(audio, sampling_rate=SAMPLE_RATE,
                      return_tensors="np")
        return out.input_features[0].astype(np.float32)
