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


VIDEO_PLACEHOLDER = "<video>"


def video_frames(video: Any) -> list:
    """Normalize a video input to a list of frames. Accepts a list/tuple
    of frames (PIL images or HxWx3 arrays), an ndarray [F, H, W, 3] or
    [F, 3, H, W], or an ANIMATED PIL image (GIF/APNG — the codec-free
    multi-frame formats this environment can decode)."""
    if isinstance(video, (list, tuple)):
        return list(video)
    if isinstance(video, np.ndarray):
        if video.ndim != 4:
            raise ValueError(f"video array must be 4-D, got {video.shape}")
        if video.shape[1] == 3 and video.shape[-1] != 3:
            video = np.moveaxis(video, 1, -1)
        return [video[i] for i in range(video.shape[0])]
    try:
        from PIL import ImageSequence

        frames = [f.convert("RGB").copy()
                  for f in ImageSequence.Iterator(video)]
        if frames:
            return frames
    except Exception:  # noqa: BLE001
        pass
    raise ValueError(f"unsupported video input type {type(video)!r}")


def normalize_videos(videos: Any) -> list:
    """multi_modal_data['video'] -> list of videos. A single video may
    arrive as a 4-D ndarray, an animated PIL image, or a LIST OF FRAMES
    (3-D arrays / PIL stills); a list whose elements are themselves
    videos is a multi-video batch."""
    if videos is None:
        return []
    if isinstance(videos, np.ndarray):
        return [videos]
    if not isinstance(videos, (list, tuple)):
        return [videos]              # PIL animated image etc.
    if not videos:
        return []
    first = videos[0]
    if isinstance(first, np.ndarray) and first.ndim == 3:
        return [list(videos)]        # a list of frames = one video
    if not isinstance(first, (np.ndarray, list, tuple)) \
            and not getattr(first, "is_animated", False) \
            and hasattr(first, "convert"):
        return [list(videos)]        # PIL stills = frames of one video
    return list(videos)


def preprocess_video(video: Any, image_size: int, mean, std, crop: bool,
                     temporal_patch: int, max_frames: int) -> np.ndarray:
    """Video -> [n_slices, temporal_patch, 3, S, S] real-frame temporal
    slices (reference Qwen2VLVideoPixelInputs pipeline, fixed-resolution
    serving variant): frames subsample evenly to <= max_frames, pad by
    repeating the last frame up to a temporal_patch multiple."""
    frames = video_frames(video)
    if not frames:
        raise ValueError("empty video")
    if len(frames) > max_frames:
        idx = np.linspace(0, len(frames) - 1, max_frames).round()
        frames = [frames[int(i)] for i in idx]
    while len(frames) % temporal_patch:
        frames.append(frames[-1])
    proc = np.stack([preprocess_image(f, image_size, mean, std, crop)
                     for f in frames])                 # [F, 3, S, S]
    F = proc.shape[0]
    return proc.reshape(F // temporal_patch, temporal_patch,
                        *proc.shape[1:])


def expand_mm_prompt(
    tokenizer,
    prompt: Optional[str],
    prompt_token_ids: Optional[list[int]],
    images: list[Any],
    *,
    image_token_id: int,
    tokens_per_image: int,
    image_processor: ImageProcessor,
    videos: list[Any] = (),
    video_token_id: Optional[int] = None,
    video_processor=None,
) -> tuple[list[int], list[MultiModalItem]]:
    """Expand image/video placeholders and preprocess media.

    Text prompts: each ``<image>`` placeholder expands to
    ``tokens_per_image`` copies of ``image_token_id`` (reference: HF
    LlavaProcessor expansion) and each ``<video>`` to
    ``n_slices * tokens_per_image`` copies of ``video_token_id``
    (one merged grid per temporal slice, reference Qwen2VL video
    placeholders). Token-id prompts: each single occurrence of the
    placeholder token expands in place the same way (pre-expanded runs
    are accepted as-is). A video becomes n_slices consecutive
    MultiModalItems — one encoder-pool slot per temporal slice, so the
    image budget/cache machinery applies unchanged.
    """
    if videos and (video_token_id is None or video_processor is None):
        raise ValueError("this model does not accept video inputs")
    video_px = [video_processor(v) for v in videos] if videos else []

    def video_items(offset: int, px) -> list[MultiModalItem]:
        return [MultiModalItem(offset=offset + k * tokens_per_image,
                               length=tokens_per_image, data=px[k],
                               modality="video")
                for k in range(px.shape[0])]

    if prompt is not None:
        if tokenizer is None:
            raise ValueError("string multimodal prompts need a tokenizer")
        # split on BOTH placeholders, keeping order of appearance
        import re

        pat = "(" + "|".join(re.escape(p) for p in
                             (IMAGE_PLACEHOLDER, VIDEO_PLACEHOLDER)) + ")"
        pieces = re.split(pat, prompt)
        n_img = sum(1 for x in pieces if x == IMAGE_PLACEHOLDER)
        n_vid = sum(1 for x in pieces if x == VIDEO_PLACEHOLDER)
        if n_img != len(images) or n_vid != len(videos):
            raise ValueError(
                f"prompt has {n_img} image / {n_vid} video placeholders "
                f"but {len(images)} images / {len(videos)} videos were "
                "provided")
        # encode("") still yields the BOS token where the tokenizer has one
        token_ids: list[int] = list(tokenizer.encode(pieces[0]))
        items: list[MultiModalItem] = []
        img_i = vid_i = 0
        for j in range(1, len(pieces), 2):
            ph, piece = pieces[j], pieces[j + 1]
            if ph == IMAGE_PLACEHOLDER:
                items.append(MultiModalItem(
                    offset=len(token_ids), length=tokens_per_image,
                    data=image_processor(images[img_i])))
                token_ids.extend([image_token_id] * tokens_per_image)
                img_i += 1
            else:
                px = video_px[vid_i]
                items.extend(video_items(len(token_ids), px))
                token_ids.extend([video_token_id] * tokens_per_image
                                 * px.shape[0])
                vid_i += 1
            if piece:
                token_ids.extend(
                    tokenizer.encode(piece, add_special_tokens=False))
        return token_ids, items
    if videos:
        # token-id prompts with videos: ONE pass expanding both
        # placeholder kinds in order (two passes would shift the offsets
        # recorded by the first)
        token_ids = list(prompt_token_ids or [])
        items = []
        img_i = vid_i = 0
        i = 0
        while i < len(token_ids):
            tok = token_ids[i]
            if tok == image_token_id:
                run = 1
                while (i + run < len(token_ids)
                       and token_ids[i + run] == image_token_id):
                    run += 1
                if run == 1:
                    token_ids[i:i + 1] = ([image_token_id]
                                          * tokens_per_image)
                elif run != tokens_per_image:
                    raise ValueError(
                        f"image-token run of {run} at {i}: expected 1 "
                        f"or {tokens_per_image}")
                if img_i >= len(images):
                    raise ValueError("more image-token spans than images")
                items.append(MultiModalItem(
                    offset=i, length=tokens_per_image,
                    data=image_processor(images[img_i])))
                img_i += 1
                i += tokens_per_image
            elif tok == video_token_id:
                if vid_i >= len(videos):
                    raise ValueError("more video-token spans than videos")
                px = video_px[vid_i]
                span = tokens_per_image * px.shape[0]
                run = 1
                while (i + run < len(token_ids)
                       and token_ids[i + run] == video_token_id):
                    run += 1
                if run == 1:
                    token_ids[i:i + 1] = [video_token_id] * span
                elif run != span:
                    raise ValueError(
                        f"video-token run of {run} at {i}: expected 1 "
                        f"(placeholder) or {span} (expanded)")
                items.extend(video_items(i, px))
                vid_i += 1
                i += span
            else:
                i += 1
        if vid_i != len(videos) or img_i != len(images):
            raise ValueError(
                f"prompt spans ({img_i} image / {vid_i} video) do not "
                f"match inputs ({len(images)} / {len(videos)})")
        return token_ids, items
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
