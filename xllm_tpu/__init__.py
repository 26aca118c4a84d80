"""xllm_tpu: a TPU-native LLM inference framework (JAX/XLA/Pallas/pjit).

Brand-new implementation of the capabilities of jd-opensource/xllm
(reference: /root/reference, surveyed in SURVEY.md), redesigned for TPU:

- continuous batching with paged KV cache (block tables, no VMM tricks)
- bucketed-shape jit execution (the reference's graph-capture equivalent,
  cf. reference xllm/core/runtime/acl_graph_executor_impl.h:61)
- Pallas paged-attention / quantized-matmul kernels
- GSPMD/pjit sharding over a device mesh for TP/DP/EP/CP
- OpenAI-compatible streaming API
"""

__version__ = "0.1.0"
