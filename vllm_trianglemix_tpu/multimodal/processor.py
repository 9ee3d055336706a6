"""Image preprocessing + prompt expansion for vision-language models.

Role of the reference's per-model multimodal processors
(vllm/multimodal/processing.py + model _get_*_processor hooks): turn a
(prompt text, images) pair into (token ids with placeholder spans expanded,
MultiModalItem list with preprocessed pixels).

Preprocessing matches CLIPImageProcessor semantics (resize shortest edge →
center crop → rescale 1/255 → normalize) when a ``preprocessor_config.json``
ships with the checkpoint; otherwise a documented fallback (direct bilinear
resize to the square input + CLIP mean/std) applies.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import numpy as np

from vllm_trianglemix_tpu.multimodal import MultiModalItem

# OpenAI-CLIP normalization constants (CLIPImageProcessor defaults).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

IMAGE_PLACEHOLDER = "<image>"


def _to_rgb_array(image: Any) -> np.ndarray:
    """PIL image / [H, W, 3] uint8 / [H, W, 3] float array → float32 0..255."""
    try:
        from PIL import Image

        if isinstance(image, Image.Image):
            image = np.asarray(image.convert("RGB"))
    except ImportError:
        pass
    arr = np.asarray(image)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[-1] != 3:
        raise ValueError(f"expected [H, W, 3] image, got {arr.shape}")
    arr = arr.astype(np.float32)
    if arr.max() <= 1.0 + 1e-6:
        arr = arr * 255.0
    return arr


def _bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """[H, W, C] bilinear resize (half-pixel centers, PIL-convention)."""
    h, w, c = img.shape
    if (h, w) == (out_h, out_w):
        return img
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def preprocess_image(image: Any, image_size: int,
                     mean: np.ndarray = CLIP_MEAN,
                     std: np.ndarray = CLIP_STD,
                     crop: bool = True) -> np.ndarray:
    """One image → pixel tensor [3, S, S] float32 (CLIP pipeline)."""
    arr = _to_rgb_array(image)
    h, w, _ = arr.shape
    if crop:
        # resize shortest edge to image_size, then center crop
        scale = image_size / min(h, w)
        nh, nw = max(image_size, round(h * scale)), max(
            image_size, round(w * scale))
        arr = _bilinear_resize(arr, nh, nw)
        top = (nh - image_size) // 2
        left = (nw - image_size) // 2
        arr = arr[top:top + image_size, left:left + image_size]
    else:
        arr = _bilinear_resize(arr, image_size, image_size)
    arr = arr / 255.0
    arr = (arr - mean) / std
    return np.transpose(arr, (2, 0, 1)).astype(np.float32)


class ImageProcessor:
    """Checkpoint-aware image preprocessor.

    Reads ``preprocessor_config.json`` for size/mean/std when present
    (the HF LlavaProcessor's CLIPImageProcessor settings); otherwise uses
    the model config's vision image_size with CLIP defaults.
    """

    def __init__(self, image_size: int, model_path: Optional[str] = None):
        self.image_size = image_size
        self.mean, self.std = CLIP_MEAN, CLIP_STD
        self.crop = True
        if model_path:
            p = os.path.join(model_path, "preprocessor_config.json")
            if os.path.exists(p):
                with open(p) as f:
                    pc = json.load(f)
                size = pc.get("crop_size") or pc.get("size") or {}
                if isinstance(size, dict):
                    self.image_size = int(
                        size.get("height") or size.get("shortest_edge")
                        or self.image_size)
                elif isinstance(size, int):
                    self.image_size = size
                if pc.get("image_mean"):
                    self.mean = np.asarray(pc["image_mean"], np.float32)
                if pc.get("image_std"):
                    self.std = np.asarray(pc["image_std"], np.float32)

    def __call__(self, image: Any) -> np.ndarray:
        return preprocess_image(image, self.image_size, self.mean,
                                self.std, self.crop)


def expand_mm_prompt(
    tokenizer,
    prompt: Optional[str],
    prompt_token_ids: Optional[list[int]],
    images: list[Any],
    *,
    image_token_id: int,
    tokens_per_image: int,
    image_processor: ImageProcessor,
) -> tuple[list[int], list[MultiModalItem]]:
    """Expand image placeholders and preprocess images.

    Text prompts: each ``<image>`` placeholder expands to
    ``tokens_per_image`` copies of ``image_token_id`` (reference: HF
    LlavaProcessor expansion). Token-id prompts: each single occurrence of
    ``image_token_id`` expands in place the same way (pre-expanded prompts
    — a run of exactly ``tokens_per_image`` — are accepted as-is).
    """
    if prompt is not None:
        pieces = prompt.split(IMAGE_PLACEHOLDER)
        n_ph = len(pieces) - 1
        if n_ph != len(images):
            raise ValueError(
                f"prompt has {n_ph} {IMAGE_PLACEHOLDER!r} placeholders but "
                f"{len(images)} images were provided")
        if tokenizer is None:
            raise ValueError("string multimodal prompts need a tokenizer")
        # encode("") still yields the BOS token where the tokenizer has one
        token_ids: list[int] = list(tokenizer.encode(pieces[0]))
        spans: list[int] = []
        for piece in pieces[1:]:
            spans.append(len(token_ids))
            token_ids.extend([image_token_id] * tokens_per_image)
            if piece:
                token_ids.extend(
                    tokenizer.encode(piece, add_special_tokens=False))
    else:
        token_ids = list(prompt_token_ids or [])
        spans = []
        i = 0
        while i < len(token_ids):
            if token_ids[i] == image_token_id:
                run = 1
                while (i + run < len(token_ids)
                       and token_ids[i + run] == image_token_id):
                    run += 1
                if run == tokens_per_image:
                    spans.append(i)          # already expanded
                    i += run
                    continue
                if run != 1:
                    raise ValueError(
                        f"image-token run of {run} at {i}: expected 1 "
                        f"(placeholder) or {tokens_per_image} (expanded)")
                spans.append(i)
                token_ids[i:i + 1] = [image_token_id] * tokens_per_image
                i += tokens_per_image
            else:
                i += 1
        if len(spans) != len(images):
            raise ValueError(
                f"prompt has {len(spans)} image-token spans but "
                f"{len(images)} images were provided")

    items = [
        MultiModalItem(offset=off, length=tokens_per_image,
                       data=image_processor(img))
        for off, img in zip(spans, images)
    ]
    return token_ids, items
