"""Scan-based on-chip A/B of the decode-shape weight-streaming matmuls.

bench r2 measured int8 decode at the SAME tok/s as bf16 (7581 vs 7519)
even though int8 halves the weight bytes — so the quantized matmul path
is burning its bandwidth win somewhere. bench_qmm_tpu.py (per-call
timing) was noise-dominated through the tunnel; this probe uses the
probe_decode_kernel methodology instead: all four per-layer projections
(qkv, o, gate, up, down) inside a 28-layer lax.scan, slope-timed.

Variants:
  xla_bf16    : jnp.dot on bf16 stacks (the production bf16 path)
  xla_int8dq  : XLA dot on (w_int8.astype(bf16) * scale) — does XLA fuse
                the dequant into the weight stream?
  xla_int8mxu : XLA int8 x int8 -> int32 dot (activations pre-quantized)
  qmm_v1      : quant_matmul_int8 (pallas, pallas-managed weight blocks)
  qmm_v2      : quant_matmul_int8_v2 (pallas, split-DMA streamer)
  fp8_v2      : quant_matmul_fp8_v2 (weight-only fp8, in-kernel upcast)
"""

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from xllm_tpu.ops.pallas.quant_matmul import (
    matmul_bf16_stacked,
    quant_matmul_fp8_stacked,
    quant_matmul_int8,
    quant_matmul_int8_v2,
    quant_matmul_int8_v2_stacked,
    quant_matmul_fp8_v2,
)

M = 128  # decode batch
NL = 28
SHAPES = {  # qwen3-1.7B-class per-layer projections
    "qkv": (2048, 4096),
    "o": (2048, 2048),
    "gate": (2048, 6144),
    "up": (2048, 6144),
    "down": (6144, 2048),
}

rng = np.random.default_rng(0)
xs = {
    name: jnp.asarray(rng.standard_normal((M, k)) * 0.1, jnp.bfloat16)
    for name, (k, n) in SHAPES.items()
}
layer_bytes_bf16 = sum(k * n * 2 for k, n in SHAPES.values())


def slope(step, state, iters=16):
    state, o = step(state)
    np.asarray(o)
    n1, n2 = iters // 4, iters
    t0 = time.perf_counter()
    for _ in range(n1):
        state, o = step(state)
    np.asarray(o)
    t1 = time.perf_counter()
    for _ in range(n2):
        state, o = step(state)
    np.asarray(o)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


def run(tag, weights, mm, bytes_per_el):
    """weights: dict name -> array pytree passed EXPLICITLY into the jit
    (closure capture lifts multi-GB stacks into lowering constants — the
    first r3 run of this probe spent 15+ min serializing 2.8 GB of HLO
    and never reached the device); mm(w, name, x, i) -> [M, N]."""

    @jax.jit
    def step(w, acc0):
        def body(acc, i):
            tot = acc
            for name in SHAPES:
                y = mm(w, name, xs[name], i)
                tot = tot + jnp.sum(y[:, :64].astype(jnp.float32))
            return tot, None

        acc, _ = jax.lax.scan(body, acc0, jnp.arange(NL, dtype=jnp.int32))
        return acc + acc0, acc

    ms = slope(lambda a: step(weights, a), jnp.float32(0.0))
    gb = NL * layer_bytes_bf16 * bytes_per_el / 2 / 1e9
    print(
        f"## {tag}: {ms:.3f} ms/28L  ({ms/NL*1e3:.0f} us/layer, "
        f"{gb/(ms/1e3):.0f} GB/s weight stream)",
        flush=True,
    )
    return ms


results = {}

# --- bf16 XLA ------------------------------------------------------------
w_bf16 = {
    name: jnp.asarray(rng.standard_normal((NL, k, n)) * 0.02, jnp.bfloat16)
    for name, (k, n) in SHAPES.items()
}
results["xla_bf16"] = run(
    "xla_bf16", w_bf16,
    lambda w, name, x, i: jnp.dot(
        x, w[name][i], preferred_element_type=jnp.float32
    ),
    2,
)
# pallas split-DMA streamer on the SAME bf16 stacks (in-scan A/B: can the
# manual pipeline beat XLA's ~660 GB/s weight stream at decode shapes?)
results["pallas_bf16_stacked"] = run(
    "pallas_bf16_stacked", w_bf16,
    lambda w, name, x, i: matmul_bf16_stacked(x, w[name], i),
    2,
)

# --- int8 variants -------------------------------------------------------
w_i8 = {
    name: jnp.asarray(
        rng.integers(-127, 128, size=(NL, k, n)), jnp.int8
    )
    for name, (k, n) in SHAPES.items()
}
sw = {
    name: jnp.full((NL, n), 0.02 / 127.0, jnp.float32)
    for name, (k, n) in SHAPES.items()
}

results["xla_int8dq"] = run(
    "xla_int8dq", (w_i8, sw),
    lambda w, name, x, i: jnp.dot(
        x,
        (w[0][name][i].astype(jnp.bfloat16)
         * w[1][name][i].astype(jnp.bfloat16)),
        preferred_element_type=jnp.float32,
    ),
    1,
)

xq = {
    name: jnp.clip(
        jnp.round(x.astype(jnp.float32) / 0.01), -127, 127
    ).astype(jnp.int8)
    for name, x in xs.items()
}
results["xla_int8mxu"] = run(
    "xla_int8mxu", (w_i8, sw),
    lambda w, name, x, i: jax.lax.dot(
        xq[name], w[0][name][i], preferred_element_type=jnp.int32
    ).astype(jnp.float32),
    1,
)

results["qmm_v1"] = run(
    "qmm_v1", (w_i8, sw),
    lambda w, name, x, i: quant_matmul_int8(x, w[0][name][i], w[1][name][i]),
    1,
)
results["qmm_v2"] = run(
    "qmm_v2", (w_i8, sw),
    lambda w, name, x, i: quant_matmul_int8_v2(
        x, w[0][name][i], w[1][name][i]
    ),
    1,
)
# stacked: the layer index goes INTO the kernel — no per-layer slice copy
results["qmm_v2_stacked"] = run(
    "qmm_v2_stacked", (w_i8, sw),
    lambda w, name, x, i: quant_matmul_int8_v2_stacked(
        x, w[0][name], w[1][name], i
    ),
    1,
)

for name in list(w_i8):
    del w_i8[name]

# --- fp8 weight-only -----------------------------------------------------
w_f8 = {
    name: jnp.asarray(rng.standard_normal((NL, k, n)) * 0.02).astype(
        jnp.float8_e4m3fn
    )
    for name, (k, n) in SHAPES.items()
}
sw1 = {
    name: jnp.ones((NL, n), jnp.float32) for name, (k, n) in SHAPES.items()
}
results["fp8_v2"] = run(
    "fp8_v2", (w_f8, sw1),
    lambda w, name, x, i: quant_matmul_fp8_v2(
        x, w[0][name][i], w[1][name][i]
    ),
    1,
)
results["fp8_stacked"] = run(
    "fp8_stacked", (w_f8, sw1),
    lambda w, name, x, i: quant_matmul_fp8_stacked(
        x, w[0][name], w[1][name], i
    ),
    1,
)
results["xla_fp8dq"] = run(
    "xla_fp8dq", w_f8,
    lambda w, name, x, i: jnp.dot(
        x, w[name][i].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ),
    1,
)

print(json.dumps({k: round(v, 3) for k, v in results.items()}), flush=True)
