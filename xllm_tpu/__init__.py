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

import os as _os

if _os.environ.get("XLLM_JIT_CACHE", "1") == "1":
    # Persistent XLA compilation cache: TPU compiles are remote and slow
    # (20-60s/shape); caching serialized executables across processes makes
    # engine restarts / benches / verify drives near-instant on warm shapes.
    # (Counterpart of the reference's on-disk graph/executable reuse.)
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("XLLM_JIT_CACHE_DIR", "/tmp/xllm_jit_cache"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
