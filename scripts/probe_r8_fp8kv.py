"""r8 in-context A/B: fp8_e4m3 KV cache vs bf16 at the bench config.

The decode kernels are DMA-bound (r5 floor: 140 us/layer for the bf16
stream). fp8 KV halves the streamed bytes; the in-kernel `_mxu` upcast
is VPU work off the DMA critical path. If the upcast doesn't serialize,
fp8 KV should land near 0.5x the bf16 per-layer time + upcast overhead.

Trimmed to the decision-critical runs: ONE env-selected challenger
kernel (XLLM_R8_KERNEL: v5 default, or v9/v9tN) run twice with fp8 KV
(timing + variance repeat) plus the v5 fp8-vs-bf16 numeric check. The
bf16 anchor comes from probe_r7_v9 in the same session.

r3 RESULT (recorded /tmp/r8_fp8kv.log, 2026-08-20): v5_fp8 819
us/layer vs v5_bf16 209 — v5e has NO fast f8->bf16 upcast; fp8 KV is
4x SLOWER than the bytes it saves. Quantized KV on v5e must be int8
(int8->bf16 converts are fast; see probe_r9_int8kv.py).
"""

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from xllm_tpu.ops.pallas.decode_attention import (
    paged_decode_attention_write_v5_tpu as v5,
    paged_decode_attention_write_v9_tpu as v9,
)

B, HKV, G, D, BS = 128, 8, 2, 128, 64
CTX = 192
NPAGES = CTX // BS
NL, NB_TOTAL, NBT = 28, 1100, 5

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.bfloat16)
k_new = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
v_new = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
seq_lens_np = np.full((B,), CTX, np.int32)
seq_lens = jnp.asarray(seq_lens_np)

bt = np.zeros((B, NBT), np.int32)
nxt = 1
for i in range(B):
    for j in range(NPAGES):
        bt[i, j] = nxt
        nxt += 1
slots = jnp.asarray(
    (bt[np.arange(B), NPAGES - 1] * BS + (CTX - 1) % BS), jnp.int32
)
btj = jnp.asarray(bt)

pages_np = -(-seq_lens_np // BS)
cum_np = np.zeros(B + 1, np.int32)
np.cumsum(pages_np, out=cum_np[1:])
CUM = jnp.asarray(cum_np)


def run(tag, kern, dtype, iters=12):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(k_all, v_all):
        def body(carry, li):
            ka, va, acc = carry
            o, ka, va = kern(
                q, k_new, v_new, ka, va, li, slots, btj, seq_lens,
                scale=D ** -0.5,
            )
            return (ka, va, acc + o.astype(jnp.float32)), None

        (k_all, v_all, acc), _ = jax.lax.scan(
            body,
            (k_all, v_all, jnp.zeros((B, HKV * G, D), jnp.float32)),
            jnp.arange(NL, dtype=jnp.int32),
        )
        return k_all, v_all, acc[0, 0, :4]

    # f32 generation + in-place scale: the f64 default would build two
    # ~16 GB host temporaries at this shape (r3-advice finding)
    ka_np = rng.standard_normal((NL, NB_TOTAL, HKV, BS, D), dtype=np.float32)
    ka_np *= 0.1
    ka = jnp.asarray(ka_np, jnp.bfloat16).astype(dtype)
    va_np = rng.standard_normal((NL, NB_TOTAL, HKV, BS, D), dtype=np.float32)
    va_np *= 0.1
    va = jnp.asarray(va_np, jnp.bfloat16).astype(dtype)
    del ka_np, va_np
    ka, va, o = step(ka, va)
    np.asarray(o)
    n1, n2 = iters // 4, iters
    t0 = time.perf_counter()
    for _ in range(n1):
        ka, va, o = step(ka, va)
    np.asarray(o)
    t1 = time.perf_counter()
    for _ in range(n2):
        ka, va, o = step(ka, va)
    np.asarray(o)
    t2 = time.perf_counter()
    ms = ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3
    per_layer_us = ms / NL * 1e3
    nbytes = 1 if dtype == jnp.float8_e4m3fn else 2
    gb = NL * B * NPAGES * (2 * HKV * BS * D * nbytes) / 1e9
    print(
        f"## {tag}: {ms:.3f} ms/step  {per_layer_us:.0f} us/layer  "
        f"{gb/(ms/1e3):.0f} GB/s",
        flush=True,
    )
    del ka, va
    return per_layer_us


def check(tag, kern, dtype_a, dtype_b):
    base = rng.standard_normal((1, NB_TOTAL, HKV, BS, D)) * 0.1
    outs = []
    for dt in (dtype_a, dtype_b):
        ka = jnp.asarray(base, jnp.bfloat16).astype(dt)
        va = jnp.asarray(base[..., ::-1], jnp.bfloat16).astype(dt)
        o, ka, va = kern(
            q, k_new, v_new, ka, va, jnp.int32(0), slots, btj, seq_lens,
            scale=D ** -0.5,
        )
        outs.append(np.asarray(o, np.float32))
        del ka, va
    err = float(np.max(np.abs(outs[0] - outs[1])))
    rel = float(
        np.max(np.abs(outs[0] - outs[1]) / (np.abs(outs[1]) + 1e-3))
    )
    print(f"## check {tag}: max|d|={err:.4f} max rel={rel:.4f}", flush=True)
    return err, rel


F8 = jnp.float8_e4m3fn
BF = jnp.bfloat16
# Trimmed to the decision-critical variants: each run regenerates and
# ships the full cache pool through the tunnel (~15-30 min/variant), so
# the anchor comes from probe_r7 in the same session rather than a
# repeat here. XLLM_R8_KERNEL picks the challenger (set after reading
# the r7 tournament; default v5).
import os

_k = os.environ.get("XLLM_R8_KERNEL", "v5")
if _k.startswith("v9"):
    # mirror the production dispatch's 'v9tN' convention (ops/attention)
    t = int(_k[3:]) if _k.startswith("v9t") else 4
    best = functools.partial(v9, cum=CUM, tile=t)
else:
    best = functools.partial(v5, cum=CUM)
res = {}
res[f"{_k}_fp8"] = run(f"{_k}_fp8", best, F8)
res[f"{_k}_fp8_b"] = run(f"{_k}_fp8_b (variance repeat)", best, F8)

e, rel = check("v5 fp8 vs bf16", functools.partial(v5, cum=CUM), F8, BF)
print(json.dumps({
    "timing_us_per_layer": res, "numeric_fp8_vs_bf16": {"abs": e, "rel": rel},
}), flush=True)
