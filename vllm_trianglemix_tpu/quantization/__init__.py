"""Quantization subsystem.

Role of the reference's vllm/model_executor/layers/quantization/ (registry
in __init__.py + per-method configs) re-shaped for functional JAX: a
quantized linear is a small pytree (``QuantLinear``) instead of an
nn.Module method, and "apply" is a pure function the decoder calls for
every projection. Methods:

- ``int8``  — symmetric per-output-channel W8A16 (reference tpu_int8.py)
- ``int4``  — symmetric grouped weight-only W4A16
- ``awq``   — AWQ checkpoint ingest (zero-point groups, reference awq.py)
- ``gptq``  — GPTQ checkpoint ingest (reference gptq.py)
- ``fp8``   — e4m3 weight-only with per-channel scales (reference fp8.py)
- ``w4a8``  — grouped int4 weights + per-token dynamic int8 activations
  (reference marlin_qqq / W4A8 compressed-tensors role); the fastest
  decode-GEMM mode on TPU (Pallas int8-MXU dequant kernel)
"""

from vllm_trianglemix_tpu.quantization.linear import (  # noqa: F401
    ActQuantLinear,
    QuantLinear,
    apply_linear,
    dequantize,
    quantize_fp8,
    quantize_fp8_w8a8,
    quantize_int4,
    quantize_int8,
    quantize_int8_w8a8,
    quantize_params,
    quantize_w4a8,
    set_kernel_mode,
)
from vllm_trianglemix_tpu.quantization.ingest import (  # noqa: F401
    detect_checkpoint_quantization,
    load_awq_linear,
    load_gptq_linear,
    load_w8a8_linear,
)

SUPPORTED_METHODS = ("int8", "int4", "fp8", "awq", "gptq",
                     "int8_w8a8", "fp8_w8a8", "w4a8")
