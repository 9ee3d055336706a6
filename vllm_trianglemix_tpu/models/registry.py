"""Model registry: HF architecture string → model module.

Mirror of the reference's lazy-import ModelRegistry
(vllm/model_executor/models/registry.py:45-321), sized to the families this
engine currently ships. A model module must expose:

- ``Config.from_pretrained(path)`` / ``Config.from_hf_config(dict)``
- ``shape_tree(cfg)`` / ``partition_specs(cfg)`` / ``init_random(cfg, ...)``
- ``params_from_hf_state_dict(cfg, get_tensor, dtype)``
- ``forward(params, cfg, tri_cfg, token_ids, kv_caches, md, tri_flags)``
- ``compute_logits(params, cfg, hidden)``
- ``kv_cache_spec(cfg, block_size, dtype_bytes)``
"""

from __future__ import annotations

import importlib
import json
import os

_REGISTRY: dict[str, tuple[str, str]] = {
    # architecture -> (module, config attr)
    "Qwen3ForCausalLM": ("vllm_trianglemix_tpu.models.qwen3", "Qwen3Config"),
    "Qwen3MoeForCausalLM": ("vllm_trianglemix_tpu.models.qwen3_moe",
                            "Qwen3MoeConfig"),
    "Qwen2ForCausalLM": ("vllm_trianglemix_tpu.models.qwen2", "Qwen2Config"),
    "LlamaForCausalLM": ("vllm_trianglemix_tpu.models.llama", "LlamaConfig"),
    "MistralForCausalLM": ("vllm_trianglemix_tpu.models.mistral",
                           "MistralConfig"),
    "MixtralForCausalLM": ("vllm_trianglemix_tpu.models.mixtral",
                           "MixtralConfig"),
    "DeepseekV2ForCausalLM": ("vllm_trianglemix_tpu.models.deepseek_v2",
                              "DeepseekV2Config"),
    "DeepseekV3ForCausalLM": ("vllm_trianglemix_tpu.models.deepseek_v2",
                              "DeepseekV3Config"),
    "Gemma2ForCausalLM": ("vllm_trianglemix_tpu.models.gemma2",
                          "Gemma2Config"),
    "Qwen2ForSequenceClassification": (
        "vllm_trianglemix_tpu.models.qwen2_cls", "Qwen2ClsConfig"),
    "MambaForCausalLM": ("vllm_trianglemix_tpu.models.mamba",
                         "MambaConfig"),
    "Mamba2ForCausalLM": ("vllm_trianglemix_tpu.models.mamba2",
                          "Mamba2Config"),
    "LlavaForConditionalGeneration": ("vllm_trianglemix_tpu.models.llava",
                                      "LlavaConfig"),
    "GemmaForCausalLM": ("vllm_trianglemix_tpu.models.gemma",
                         "GemmaConfig"),
    "Phi3ForCausalLM": ("vllm_trianglemix_tpu.models.phi3", "Phi3Config"),
    "Qwen2MoeForCausalLM": ("vllm_trianglemix_tpu.models.qwen2_moe",
                            "Qwen2MoeConfig"),
    "GraniteForCausalLM": ("vllm_trianglemix_tpu.models.granite",
                           "GraniteConfig"),
    "Qwen2VLForConditionalGeneration": (
        "vllm_trianglemix_tpu.models.qwen2_vl", "Qwen2VLConfig"),
    "Starcoder2ForCausalLM": ("vllm_trianglemix_tpu.models.starcoder2",
                              "Starcoder2Config"),
    "Olmo2ForCausalLM": ("vllm_trianglemix_tpu.models.olmo2",
                         "Olmo2Config"),
    "BertModel": ("vllm_trianglemix_tpu.models.bert_embed",
                  "BertEmbedConfig"),
    "XLMRobertaModel": ("vllm_trianglemix_tpu.models.bert_embed",
                        "BertEmbedConfig"),
    "GptOssForCausalLM": ("vllm_trianglemix_tpu.models.gpt_oss",
                          "GptOssConfig"),
    "GPT2LMHeadModel": ("vllm_trianglemix_tpu.models.gpt2", "Gpt2Config"),
    "OPTForCausalLM": ("vllm_trianglemix_tpu.models.opt", "OPTConfig"),
    "GPTNeoXForCausalLM": ("vllm_trianglemix_tpu.models.gpt_neox",
                           "GptNeoXConfig"),
    "PhiForCausalLM": ("vllm_trianglemix_tpu.models.phi", "PhiConfig"),
    "StableLmForCausalLM": ("vllm_trianglemix_tpu.models.stablelm",
                            "StableLmConfig"),
    "CohereForCausalLM": ("vllm_trianglemix_tpu.models.cohere",
                          "CohereConfig"),
    "NemotronForCausalLM": ("vllm_trianglemix_tpu.models.nemotron",
                            "NemotronConfig"),
    "GlmForCausalLM": ("vllm_trianglemix_tpu.models.glm", "GlmConfig"),
    "FalconForCausalLM": ("vllm_trianglemix_tpu.models.falcon",
                          "FalconConfig"),
    "WhisperForConditionalGeneration": (
        "vllm_trianglemix_tpu.models.whisper", "WhisperConfig"),
    "JambaForCausalLM": ("vllm_trianglemix_tpu.models.jamba",
                         "JambaConfig"),
    "GPTJForCausalLM": ("vllm_trianglemix_tpu.models.gptj", "GptJConfig"),
    "GPTBigCodeForCausalLM": ("vllm_trianglemix_tpu.models.gpt_bigcode",
                              "GptBigCodeConfig"),
    "Gemma3ForCausalLM": ("vllm_trianglemix_tpu.models.gemma3",
                          "Gemma3Config"),
    "Qwen2_5_VLForConditionalGeneration": (
        "vllm_trianglemix_tpu.models.qwen2_5_vl", "Qwen25VLConfig"),
    "OlmoForCausalLM": ("vllm_trianglemix_tpu.models.olmo", "OlmoConfig"),
    "SmolLM3ForCausalLM": ("vllm_trianglemix_tpu.models.smollm3",
                           "SmolLM3Config"),
    "Ernie4_5ForCausalLM": ("vllm_trianglemix_tpu.models.ernie4_5",
                            "Ernie45Config"),
    "SeedOssForCausalLM": ("vllm_trianglemix_tpu.models.seed_oss",
                           "SeedOssConfig"),
    "ArceeForCausalLM": ("vllm_trianglemix_tpu.models.arcee",
                         "ArceeConfig"),
    "Glm4ForCausalLM": ("vllm_trianglemix_tpu.models.glm4", "Glm4Config"),
    "PhimoeForCausalLM": ("vllm_trianglemix_tpu.models.phimoe",
                          "PhimoeConfig"),
    "GraniteMoeForCausalLM": ("vllm_trianglemix_tpu.models.granitemoe",
                              "GraniteMoeConfig"),
    "DbrxForCausalLM": ("vllm_trianglemix_tpu.models.dbrx", "DbrxConfig"),
    "InternLM2ForCausalLM": ("vllm_trianglemix_tpu.models.internlm2",
                             "InternLM2Config"),
    "InternLMForCausalLM": ("vllm_trianglemix_tpu.models.internlm",
                            "InternLMConfig"),
    "XverseForCausalLM": ("vllm_trianglemix_tpu.models.internlm",
                          "XverseConfig"),
    "BaiChuanForCausalLM": ("vllm_trianglemix_tpu.models.baichuan",
                            "BaichuanConfig"),  # 7B spelling (rope)
    "BaichuanForCausalLM": ("vllm_trianglemix_tpu.models.baichuan",
                            "BaichuanConfig"),
    "OrionForCausalLM": ("vllm_trianglemix_tpu.models.orion",
                         "OrionConfig"),
    "ExaoneForCausalLM": ("vllm_trianglemix_tpu.models.exaone",
                          "ExaoneConfig"),
    "MiniCPMForCausalLM": ("vllm_trianglemix_tpu.models.minicpm",
                           "MiniCPMConfig"),
    "HeliumForCausalLM": ("vllm_trianglemix_tpu.models.helium",
                          "HeliumConfig"),
    "HunYuanDenseV1ForCausalLM": ("vllm_trianglemix_tpu.models.hunyuan",
                                  "HunYuanDenseConfig"),
    "GraniteMoeSharedForCausalLM": (
        "vllm_trianglemix_tpu.models.granitemoe", "GraniteMoeSharedConfig"),
    "Qwen3ForSequenceClassification": (
        "vllm_trianglemix_tpu.models.seq_cls", "Qwen3ClsConfig"),
    "LlamaForSequenceClassification": (
        "vllm_trianglemix_tpu.models.seq_cls", "LlamaClsConfig"),
    "MistralForSequenceClassification": (
        "vllm_trianglemix_tpu.models.seq_cls", "LlamaClsConfig"),
    # Llama-structured aliases (reference registry.py maps these to
    # llama.py): AquilaChat2, Meta CWM, InternLM3 (qkv_bias via the
    # config key), legacy LLaMA spelling.
    "AquilaModel": ("vllm_trianglemix_tpu.models.llama", "LlamaConfig"),
    "AquilaForCausalLM": ("vllm_trianglemix_tpu.models.llama",
                          "LlamaConfig"),
    "CwmForCausalLM": ("vllm_trianglemix_tpu.models.llama", "LlamaConfig"),
    "InternLM3ForCausalLM": ("vllm_trianglemix_tpu.models.llama",
                             "LlamaConfig"),
    "LLaMAForCausalLM": ("vllm_trianglemix_tpu.models.llama",
                         "LlamaConfig"),
    # MiMo's decode path is Qwen2; its MTP draft layers (model.mtp_layers)
    # are simply never requested by the loader (reference mimo.py).
    "MiMoForCausalLM": ("vllm_trianglemix_tpu.models.qwen2", "Qwen2Config"),
    # vLLM-side spelling of the HF Phimoe class name.
    "PhiMoEForCausalLM": ("vllm_trianglemix_tpu.models.phimoe",
                          "PhimoeConfig"),
    # Pre-rename Falcon-7B/40B checkpoints.
    "RWForCausalLM": ("vllm_trianglemix_tpu.models.falcon", "FalconConfig"),
    "StableLMEpochForCausalLM": ("vllm_trianglemix_tpu.models.stablelm",
                                 "StableLmConfig"),
    "MptForCausalLM": ("vllm_trianglemix_tpu.models.mpt", "MptConfig"),
    "MPTForCausalLM": ("vllm_trianglemix_tpu.models.mpt", "MptConfig"),
    "BloomForCausalLM": ("vllm_trianglemix_tpu.models.bloom",
                         "BloomConfig"),
    "OlmoeForCausalLM": ("vllm_trianglemix_tpu.models.olmoe",
                         "OlmoeConfig"),
    "Glm4MoeForCausalLM": ("vllm_trianglemix_tpu.models.glm4_moe",
                           "Glm4MoeConfig"),
    "Ernie4_5_MoeForCausalLM": ("vllm_trianglemix_tpu.models.ernie4_5_moe",
                                "Ernie45MoeConfig"),
    "Olmo3ForCausalLM": ("vllm_trianglemix_tpu.models.olmo3",
                         "Olmo3Config"),
    "Exaone4ForCausalLM": ("vllm_trianglemix_tpu.models.exaone4",
                           "Exaone4Config"),
    "Cohere2ForCausalLM": ("vllm_trianglemix_tpu.models.cohere2",
                           "Cohere2Config"),
    "FalconMambaForCausalLM": ("vllm_trianglemix_tpu.models.mamba",
                               "FalconMambaConfig"),
    "BambaForCausalLM": ("vllm_trianglemix_tpu.models.bamba",
                         "BambaConfig"),
    "GraniteMoeHybridForCausalLM": (
        "vllm_trianglemix_tpu.models.granitemoe_hybrid",
        "GraniteMoeHybridConfig"),
    "DeepseekForCausalLM": ("vllm_trianglemix_tpu.models.deepseek_v1",
                            "DeepseekV1Config"),
    "Lfm2ForCausalLM": ("vllm_trianglemix_tpu.models.lfm2", "Lfm2Config"),
    "PersimmonForCausalLM": ("vllm_trianglemix_tpu.models.persimmon",
                             "PersimmonConfig"),
    "ApertusForCausalLM": ("vllm_trianglemix_tpu.models.apertus",
                           "ApertusConfig"),
    "Dots1ForCausalLM": ("vllm_trianglemix_tpu.models.dots1",
                         "Dots1Config"),
    # DeepSeek-V3.2 serves through the V3 path (reference registry.py:73
    # maps it to deepseek_v2.DeepseekV3ForCausalLM; the V3.2 sparse
    # indexer is a training-time addition).
    "DeepseekV32ForCausalLM": ("vllm_trianglemix_tpu.models.deepseek_v2",
                               "DeepseekV3Config"),
    "QWenLMHeadModel": ("vllm_trianglemix_tpu.models.qwen_v1",
                        "QwenV1Config"),
    "ChatGLMModel": ("vllm_trianglemix_tpu.models.chatglm",
                     "ChatGlmConfig"),
    "ChatGLMForConditionalGeneration": (
        "vllm_trianglemix_tpu.models.chatglm", "ChatGlmConfig"),
    "TeleChat2ForCausalLM": ("vllm_trianglemix_tpu.models.telechat2",
                             "TeleChat2Config"),
    "TeleFLMForCausalLM": ("vllm_trianglemix_tpu.models.teleflm",
                           "TeleFLMConfig"),
    "Fairseq2LlamaForCausalLM": (
        "vllm_trianglemix_tpu.models.fairseq2_llama",
        "Fairseq2LlamaConfig"),
    "Llama4ForCausalLM": ("vllm_trianglemix_tpu.models.llama4",
                          "Llama4Config"),
    # encoder-only embedders (reference roberta.py RobertaEmbeddingModel)
    "RobertaModel": ("vllm_trianglemix_tpu.models.bert_embed",
                     "BertEmbedConfig"),
    "RobertaForMaskedLM": ("vllm_trianglemix_tpu.models.bert_embed",
                           "BertEmbedConfig"),
    # encoder-only cross-encoder classifiers
    "BertForSequenceClassification": (
        "vllm_trianglemix_tpu.models.encoder_cls", "EncoderClsConfig"),
    "RobertaForSequenceClassification": (
        "vllm_trianglemix_tpu.models.encoder_cls", "EncoderClsConfig"),
    "XLMRobertaForSequenceClassification": (
        "vllm_trianglemix_tpu.models.encoder_cls", "EncoderClsConfig"),
    "GPT2ForSequenceClassification": (
        "vllm_trianglemix_tpu.models.gpt2_cls", "Gpt2ClsConfig"),
    # reward models (reference qwen2_rm.py)
    "Qwen2ForRewardModel": ("vllm_trianglemix_tpu.models.qwen2_rm",
                            "Qwen2RewardConfig"),
    "Qwen2ForProcessRewardModel": (
        "vllm_trianglemix_tpu.models.qwen2_rm",
        "Qwen2ProcessRewardConfig"),
    "FalconH1ForCausalLM": ("vllm_trianglemix_tpu.models.falcon_h1",
                            "FalconH1Config"),
    "PaliGemmaForConditionalGeneration": (
        "vllm_trianglemix_tpu.models.paligemma", "PaliGemmaConfig"),
    # llava-weight-layout aliases (reference registry.py: Mantis ->
    # llava.py; Tarsier2 -> qwen2_vl.py)
    "MantisForConditionalGeneration": (
        "vllm_trianglemix_tpu.models.llava", "LlavaConfig"),
    "TarsierForConditionalGeneration": (
        "vllm_trianglemix_tpu.models.llava", "LlavaConfig"),
    "Tarsier2ForConditionalGeneration": (
        "vllm_trianglemix_tpu.models.qwen2_vl", "Qwen2VLConfig"),
    "SolarForCausalLM": ("vllm_trianglemix_tpu.models.solar",
                         "SolarConfig"),
    "InternLM2ForRewardModel": (
        "vllm_trianglemix_tpu.models.internlm2_rm",
        "InternLM2RewardConfig"),
    "HunYuanMoEV1ForCausalLM": ("vllm_trianglemix_tpu.models.hunyuan",
                                "HunYuanMoEConfig"),
    "ModernBertModel": ("vllm_trianglemix_tpu.models.modernbert",
                        "ModernBertConfig"),
    "JAISLMHeadModel": ("vllm_trianglemix_tpu.models.jais",
                        "JaisConfig"),
    # bare-backbone embedder rows (reference registry.py:163-183 maps
    # them to the causal modules; decoder loader strips the missing
    # "model." prefix and ties a missing lm_head)
    "Qwen2Model": ("vllm_trianglemix_tpu.models.qwen2", "Qwen2Config"),
    "LlamaModel": ("vllm_trianglemix_tpu.models.llama", "LlamaConfig"),
    "MistralModel": ("vllm_trianglemix_tpu.models.mistral",
                     "MistralConfig"),
    "Gemma2Model": ("vllm_trianglemix_tpu.models.gemma2", "Gemma2Config"),
    "Grok1ModelForCausalLM": ("vllm_trianglemix_tpu.models.grok1",
                              "Grok1Config"),
    "BailingMoeForCausalLM": ("vllm_trianglemix_tpu.models.bailing_moe",
                              "BailingMoeConfig"),
    "BailingMoeV2ForCausalLM": (
        "vllm_trianglemix_tpu.models.bailing_moe", "BailingMoeConfig"),
}


def resolve_architecture(arch: str, allow_fallback: bool = False):
    """Return (model_module, config_cls) for an HF architecture string.

    With ``allow_fallback``, unknown *ForCausalLM architectures resolve
    to the generic decoder (models/auto_decoder.py — the reference's
    TransformersForCausalLM role, registry.py:311); its config mapping
    rejects structures the shared decoder does not implement.
    """
    if arch not in _REGISTRY:
        if allow_fallback and arch.endswith("ForCausalLM"):
            import logging

            logging.getLogger(__name__).warning(
                "architecture %r has no registry entry; serving via the "
                "generic decoder fallback (llama-canonical structure "
                "assumed — verify outputs against the source model)", arch)
            module = importlib.import_module(
                "vllm_trianglemix_tpu.models.auto_decoder")
            return module, module.AutoDecoderConfig
        raise ValueError(
            f"Unsupported architecture {arch!r}; supported: {sorted(_REGISTRY)}")
    module_name, cfg_attr = _REGISTRY[arch]
    module = importlib.import_module(module_name)
    return module, getattr(module, cfg_attr)


def resolve_model(path_or_arch: str):
    """Resolve from a checkpoint dir (config.json, or Mistral-format
    params.json — reference configs/mistral.py adapt_config_dict) or an
    arch name."""
    if os.path.isdir(path_or_arch):
        cfg_path = os.path.join(path_or_arch, "config.json")
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                hf_cfg = json.load(f)
        else:
            from vllm_trianglemix_tpu.utils.mistral_format import (
                params_json_to_hf_config,
            )

            with open(os.path.join(path_or_arch, "params.json")) as f:
                hf_cfg = params_json_to_hf_config(json.load(f))
        arch = hf_cfg["architectures"][0]
        module, cfg_cls = resolve_architecture(arch, allow_fallback=True)
        return module, cfg_cls.from_hf_config(hf_cfg)
    module, cfg_cls = resolve_architecture(path_or_arch)
    return module, cfg_cls()


def supported_architectures() -> list[str]:
    return sorted(_REGISTRY)
