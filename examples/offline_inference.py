"""Offline batch inference with the feature surface in one place."""

from vllm_trianglemix_tpu import LLM, SamplingParams

MODEL = "/path/to/Qwen3-8B"

llm = LLM(
    model=MODEL,
    max_model_len=8192,
    max_num_seqs=64,
    multi_step_decode=8,        # K decode steps per device dispatch
    # quantization="int8",      # or int4 / fp8; AWQ/GPTQ auto-detected
    # speculative_config={"method": "ngram", "num_speculative_tokens": 4},
    # lora_modules={"math": "/path/to/math-adapter"},
)

prompts = [
    "Explain the MXU in one paragraph.",
    "Write a limerick about paged attention.",
]
params = SamplingParams(
    max_tokens=128,
    temperature=0.8,
    top_p=0.95,
    seed=0,
    # n=4,                      # parallel samples per prompt
    # guided_regex=r"[A-Z][a-z]+( [a-z]+)*\.",
    # presence_penalty=0.5,
)

for out in llm.generate(prompts, params):
    print("=" * 40)
    print(out.outputs[0].text)

# Embeddings
from vllm_trianglemix_tpu.pooling_params import PoolingParams  # noqa: E402

vecs = llm.encode(prompts, PoolingParams(pooling_type="last"))
print("embedding dims:", len(vecs[0].pooled))
