"""A/B: quant_matmul v1 vs v2 vs XLA bf16 dot on the real chip.

Shapes from the bench model (qwen3-1.7B class): decode activations
[B=128, K] against the big projection weights. Slope timing (two iteration
counts) to cancel the axon fetch RTT.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from xllm_tpu.ops.pallas.quant_matmul import (
    quant_matmul_int8,
    quant_matmul_int8_v2,
    quant_matmul_fp8,
    quant_matmul_fp8_v2,
)

B = 128
SHAPES = [  # (K, N) big projections of the bench model
    (2048, 6144),   # qkv
    (2048, 12288),  # gate+up fused
    (6144, 2048),   # down
]


def slope_ms(fn, n1=32, n2=128):
    out = fn()
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n1):
        out = fn()
    np.asarray(out)
    t1 = time.perf_counter()
    for _ in range(n2):
        out = fn()
    np.asarray(out)
    t2 = time.perf_counter()
    # one host sync per segment -> syncs cancel in the difference
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


def main() -> None:
    rng = np.random.default_rng(0)
    for K, N in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)
        wf = rng.standard_normal((K, N)).astype(np.float32) * 0.02
        scale = jnp.asarray(np.abs(wf).max(axis=0) / 127.0, jnp.float32)
        wq = jnp.asarray(
            np.clip(np.round(wf / np.asarray(scale)), -127, 127), jnp.int8
        )
        fscale = jnp.asarray(np.abs(wf).max(axis=0) / 448.0, jnp.float32)
        wf8 = jnp.asarray(wf / np.asarray(fscale), jnp.float8_e4m3fn)
        wbf = jnp.asarray(wf, jnp.bfloat16)

        xla = jax.jit(lambda a, w: jnp.dot(a, w))
        v1i = quant_matmul_int8
        v2i = quant_matmul_int8_v2
        v1f = quant_matmul_fp8
        v2f = quant_matmul_fp8_v2

        gb = (K * N + B * K * 2 + B * N * 2) / 1e9
        gb_q = (K * N * 1 + B * K * 2 + B * N * 2) / 1e9
        rows = [
            ("xla_bf16", lambda: xla(x, wbf), K * N * 2 / 1e9),
            ("int8_v1", lambda: v1i(x, wq, scale), gb_q),
            ("int8_v2", lambda: v2i(x, wq, scale), gb_q),
            ("fp8_v1", lambda: v1f(x, wf8, fscale), gb_q),
            ("fp8_v2", lambda: v2f(x, wf8, fscale), gb_q),
        ]
        print(f"== K={K} N={N} (weight bf16 {K*N*2/1e6:.0f} MB)")
        for name, fn, gbytes in rows:
            try:
                ms = slope_ms(fn)
                print(f"  {name:9s} {ms:7.3f} ms  {gbytes/ms*1e3:7.1f} GB/s")
            except Exception as e:  # noqa: BLE001
                print(f"  {name:9s} FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
