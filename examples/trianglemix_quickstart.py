"""TriangleMix quickstart (parity with the reference's
examples/trianglemix_quickstart.py — but here the sparsity actually runs
inside the attention kernel).

TriangleMix keeps three regions of the causal attention matrix on the
selected layers (reference trianglemix_attention.py:53-198):
  - sink tokens      (columns j <= num_sink_tokens)
  - sliding window   (i - j <= sliding_window_size)
  - last rows        (the final num_last_tokens query rows, full attention)
and drops the quadratic "middle" region. Prompts at or below
``dense_threshold`` stay dense.
"""

from vllm_trianglemix_tpu import LLM, SamplingParams, TriangleMixConfig

MODEL = "/path/to/Qwen3-8B"  # any local HF checkpoint dir


def main() -> None:
    # Preset layer counts per model size (reference trianglemix_config.py:59)
    tri = TriangleMixConfig.for_qwen3("8B")
    # ... or explicit control:
    tri = TriangleMixConfig(
        enabled=True,
        num_sink_tokens=4,
        sliding_window_size=32,
        num_last_tokens=64,
        num_triangle_layers=10,     # first-N policy
        # triangle_layer_indices=[18, 19, ...],  # or explicit layers
        dense_threshold=2048,
    )

    llm = LLM(model=MODEL, trianglemix=tri, max_model_len=8192)
    params = SamplingParams(max_tokens=128, temperature=0.0)

    long_prompt = open(__file__).read() * 8  # > dense_threshold tokens
    out = llm.generate([long_prompt], params)[0]
    print(out.outputs[0].text)

    # Offline layer selection: rank layers by middle-region contribution
    # (reference TriangleMixAnalyzer, trianglemix_attention.py:344-409).
    from vllm_trianglemix_tpu.attention.trianglemix import TriangleMixAnalyzer  # noqa: E501

    analyzer = TriangleMixAnalyzer(num_layers=36)
    # ... record per-layer middle-Q-K scores over calibration batches via
    # analyzer.record_from_scores(layer_idx, scores, tri), then:
    # print("suggested layers:", analyzer.get_triangle_layers(10))


if __name__ == "__main__":
    main()
