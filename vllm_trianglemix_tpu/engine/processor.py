"""Input processor: prompt → validated Request.

Role of the reference's Processor (vllm/v1/engine/processor.py):
tokenization, validation, stop-token assembly. Tokenizers are optional —
the engine fully supports raw token-id prompts (required in offline/airgap
environments and for serving frontends that pre-tokenize).
"""

from __future__ import annotations

import time
from typing import Optional, Union

from vllm_trianglemix_tpu.config import EngineConfig
from vllm_trianglemix_tpu.logger import init_logger
from vllm_trianglemix_tpu.request import Request
from vllm_trianglemix_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)

PromptType = Union[str, list[int], dict]


def load_tokenizer(path: str):
    """Best-effort tokenizer load; None in token-id-only mode. Mistral
    tekken.json checkpoints load through the in-repo tiktoken-based
    reader (utils/mistral_format.py, the reference's
    tokenizers/mistral.py role)."""
    import os

    tekken = os.path.join(path, "tekken.json") if os.path.isdir(path) \
        else ""
    if tekken and os.path.isfile(tekken) and not os.path.isfile(
            os.path.join(path, "tokenizer_config.json")):
        try:
            from vllm_trianglemix_tpu.utils.mistral_format import (
                TekkenTokenizer,
            )

            return TekkenTokenizer(tekken)
        except Exception as e:  # noqa: BLE001
            logger.warning("tekken tokenizer unavailable (%s)",
                           type(e).__name__)
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(path, local_files_only=True)
    except Exception as e:  # noqa: BLE001
        logger.warning("tokenizer unavailable (%s); token-id-only mode",
                       type(e).__name__)
        return None


class Processor:

    def __init__(self, engine_config: EngineConfig, tokenizer=None) -> None:
        self.engine_config = engine_config
        self.tokenizer = tokenizer
        self.eos_token_id: Optional[int] = None
        if tokenizer is not None:
            self.eos_token_id = tokenizer.eos_token_id
        else:
            # Fall back to the model config's eos (set by the engine).
            self.eos_token_id = None
        # Multimodal front-end (reference Processor MM feature extraction):
        # resolved lazily from the model config when the architecture is a
        # vision-language model.
        self.mm_config = None
        self.encoder_only = False
        self.prefix_lm = False
        self.default_pooling_type = None
        module = model_cfg = None
        try:
            from vllm_trianglemix_tpu.models.registry import resolve_model

            module, model_cfg = resolve_model(engine_config.model.model)
        except (FileNotFoundError, OSError, KeyError, ValueError):
            # No config dir / unknown arch (common in unit tests that pass
            # a raw tokenizer or synthetic config) — multimodal stays off.
            pass
        if module is not None:
            self.encoder_only = bool(getattr(module, "IS_ENCODER_ONLY",
                                             False))
            self.prefix_lm = bool(getattr(model_cfg, "prefix_lm", False))
            self.default_pooling_type = getattr(module,
                                                "DEFAULT_POOLING_TYPE",
                                                None)
        if module is not None and getattr(module, "IS_ENCODER_DECODER",
                                          False):
            # Whisper-style audio encoder-decoder: the multimodal item is
            # an audio clip, not an image, and carries no placeholder
            # tokens in the (decoder) prompt.
            from vllm_trianglemix_tpu.multimodal.audio import (
                AudioFeatureProcessor,
            )

            path = engine_config.model.model
            self.mm_config = {
                "encoder_decoder": True,
                "tokens_per_item": model_cfg.tokens_per_image,
                "audio_processor": AudioFeatureProcessor(
                    path if isinstance(path, str) else None,
                    num_mel_bins=model_cfg.num_mel_bins),
                "default_prompt": model_cfg.default_decoder_prompt(),
            }
        elif module is not None and getattr(module, "IS_MULTIMODAL",
                                            False):
            # The architecture IS multimodal: failures here are real
            # misconfigurations (malformed preprocessor_config.json,
            # missing vision section) and must not silently disable MM.
            from vllm_trianglemix_tpu.multimodal.processor import (
                ImageProcessor,
            )

            path = engine_config.model.model
            self.mm_config = {
                "image_token_id": model_cfg.image_token_index,
                "tokens_per_image": model_cfg.tokens_per_image,
                "image_processor": ImageProcessor(
                    model_cfg.vision.image_size,
                    path if isinstance(path, str) else None),
            }
            if getattr(model_cfg, "video_token_index", None) is not None:
                # video-capable (Qwen2-VL family): temporal slices of
                # real frames through the same pool machinery
                from functools import partial as _partial

                from vllm_trianglemix_tpu.multimodal.processor import (
                    preprocess_video,
                )

                ip = self.mm_config["image_processor"]
                self.mm_config["video_token_id"] = \
                    model_cfg.video_token_index
                self.mm_config["video_processor"] = _partial(
                    preprocess_video,
                    image_size=ip.image_size, mean=ip.mean, std=ip.std,
                    crop=ip.crop,
                    temporal_patch=model_cfg.vision.temporal_patch_size,
                    max_frames=getattr(model_cfg, "max_video_frames", 16))

    def process_inputs(
        self,
        request_id: str,
        prompt: PromptType,
        params: SamplingParams,
        arrival_time: Optional[float] = None,
        priority: int = 0,
        lora_name: Optional[str] = None,
        pooling_params=None,
    ) -> Request:
        prompt_text: Optional[str] = None
        mm_items = None
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError(
                    "string prompts require a tokenizer; pass token ids")
            prompt_text = prompt
            token_ids = self.tokenizer.encode(prompt)
        elif isinstance(prompt, dict):
            prompt_text = prompt.get("prompt")
            token_ids = prompt.get("prompt_token_ids")
            mm_data = prompt.get("multi_modal_data")
            if mm_data:
                if self.mm_config is None:
                    raise ValueError(
                        "multi_modal_data passed but the model is not a "
                        "multimodal architecture")
                if self.mm_config.get("encoder_decoder"):
                    from vllm_trianglemix_tpu.multimodal import (
                        MultiModalItem,
                    )

                    audio = mm_data.get("audio")
                    if audio is None:
                        raise ValueError(
                            "encoder-decoder models take "
                            "multi_modal_data={'audio': ...}")
                    feats = self.mm_config["audio_processor"](audio)
                    # No placeholder span in the decoder prompt: the clip
                    # occupies encoder-cache tokens only (offset 0 makes
                    # the first prefill chunk trigger the encoder run).
                    mm_items = [MultiModalItem(
                        offset=0,
                        length=self.mm_config["tokens_per_item"],
                        data=feats)]
                    if token_ids is None:
                        if prompt_text is not None:
                            raise ValueError(
                                "encoder-decoder prompts must be decoder "
                                "token ids (or omitted for the default "
                                "transcription prompt)")
                        token_ids = list(
                            self.mm_config["default_prompt"])
                else:
                    from vllm_trianglemix_tpu.multimodal.processor import (
                        expand_mm_prompt,
                    )

                    images = mm_data.get("image")
                    videos = mm_data.get("video")
                    if images is None and videos is None:
                        raise ValueError(
                            "multi_modal_data must carry 'image' or "
                            "'video'")
                    if images is None:
                        images = []
                    elif not isinstance(images, (list, tuple)):
                        images = [images]
                    from vllm_trianglemix_tpu.multimodal.processor import (
                        normalize_videos,
                    )

                    videos = normalize_videos(videos)
                    token_ids, mm_items = expand_mm_prompt(
                        self.tokenizer, prompt_text, token_ids,
                        list(images),
                        image_token_id=self.mm_config["image_token_id"],
                        tokens_per_image=self.mm_config[
                            "tokens_per_image"],
                        image_processor=self.mm_config["image_processor"],
                        videos=list(videos),
                        video_token_id=self.mm_config.get(
                            "video_token_id"),
                        video_processor=self.mm_config.get(
                            "video_processor"),
                    )
            elif token_ids is None:
                token_ids = self.tokenizer.encode(prompt_text)
        else:
            token_ids = list(prompt)

        if not token_ids:
            raise ValueError("empty prompt")
        max_len = self.engine_config.model.max_model_len
        if len(token_ids) >= max_len:
            raise ValueError(
                f"prompt length {len(token_ids)} >= max_model_len {max_len}")

        # Tokenize banned words once at admission (reference
        # sample/ops/bad_words.py expects token sequences; both bare and
        # space-prefixed forms are banned like the reference).
        if params.bad_words and params.bad_words_token_ids is None \
                and self.tokenizer is not None:
            seqs = []
            for w in params.bad_words:
                for form in (w, " " + w):
                    ids = self.tokenizer.encode(form,
                                                add_special_tokens=False)
                    if ids:
                        seqs.append(list(ids))
            params.bad_words_token_ids = seqs

        if self.encoder_only:
            # Bidirectional attention prefills in one shot: the prompt
            # must fit a single step's token budget (models/bert_embed.py).
            budget = self.engine_config.scheduler.max_num_batched_tokens
            if len(token_ids) > budget:
                raise ValueError(
                    f"encoder-only prompt length {len(token_ids)} exceeds "
                    f"max_num_batched_tokens {budget} (bidirectional "
                    "attention cannot chunk)")
            if pooling_params is None:
                raise ValueError(
                    "encoder-only models serve embeddings; pass "
                    "pooling_params (LLM.encode / /v1/embeddings)")
        if (pooling_params is not None
                and self.default_pooling_type is not None
                and pooling_params.pooling_type == "last"):
            # The model family's pooling convention (e.g. CLS for BERT
            # embedders) replaces the decoder-style default.
            pooling_params.pooling_type = self.default_pooling_type

        # Encode stop strings' token ids are NOT precomputed (stop strings are
        # matched on detokenized text by the output processor).
        request = Request(
            request_id=request_id,
            prompt_token_ids=token_ids,
            sampling_params=params,
            eos_token_id=self.eos_token_id,
            arrival_time=arrival_time or time.time(),
            priority=priority,
            prompt=prompt_text,
            lora_name=lora_name,
            pooling_params=pooling_params,
            mm_items=mm_items,
        )
        if self.encoder_only or self.prefix_lm:
            # bidirectional (encoder / prefix-LM) prompts must prefill in
            # one shot — later prompt tokens are visible to earlier ones
            request.no_chunking = True
        return request
