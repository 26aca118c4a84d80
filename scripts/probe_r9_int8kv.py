"""r9 in-context A/B: int8 KV cache vs bf16 at the bench config.

fp8 KV measured 4x SLOWER than bf16 (819 vs 209 us/layer,
probe_r8_fp8kv.py r3 log): v5e has no fast f8->bf16 upcast. int8
converts DO have a fast VPU path (XLA streams int8 dequant-dots at 623
GB/s of int8 bytes, scripts/probe_qmm_scan.py) — this probe measures
whether the same holds inside the Pallas decode kernels.

Scale design (scaleless in-kernel): per-head scales fold OUTSIDE the
kernel — q *= s_k[head] before, out *= s_v[head] after — so the kernel
only converts int8->bf16 on the DMA-critical path (see _mxu,
ops/pallas/decode_attention.py).

Runs: v5_bf16 anchor / v5_int8 / v9t4_int8 (+ variance repeats) and an
on-chip numeric check of the folded-scale math vs the bf16 kernel.
"""

import functools
import json

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
q_np = rng.standard_normal((B, HKV * G, D), dtype=np.float32)
kn_np = rng.standard_normal((B, HKV, D), dtype=np.float32)
vn_np = rng.standard_normal((B, HKV, D), dtype=np.float32)
q = jnp.asarray(q_np, jnp.bfloat16)
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

# per-head scales (amax/127 with margin); folded outside the kernel
S_K = 4.0 / 127.0
S_V = 4.0 / 127.0


def _quant(x_np, s):
    return jnp.asarray(
        np.clip(np.rint(x_np / s), -127, 127).astype(np.int8)
    )


def make_kv(dtype):
    ka_np = rng.standard_normal(
        (NL, NB_TOTAL, HKV, BS, D), dtype=np.float32
    )
    ka_np *= 0.1
    va_np = rng.standard_normal(
        (NL, NB_TOTAL, HKV, BS, D), dtype=np.float32
    )
    va_np *= 0.1
    if dtype == jnp.int8:
        ka = _quant(ka_np, S_K)
        va = _quant(va_np, S_V)
    else:
        ka = jnp.asarray(ka_np, jnp.bfloat16)
        va = jnp.asarray(va_np, jnp.bfloat16)
    del ka_np, va_np
    return ka, va


def run(tag, kern, dtype, iters=12):
    import time

    if dtype == jnp.int8:
        qq = (q.astype(jnp.float32) * S_K).astype(jnp.bfloat16)
        k_new = _quant(kn_np, S_K)
        v_new = _quant(vn_np, S_V)
    else:
        qq = q
        k_new = jnp.asarray(kn_np, jnp.bfloat16)
        v_new = jnp.asarray(vn_np, jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(k_all, v_all):
        def body(carry, li):
            ka, va, acc = carry
            o, ka, va = kern(
                qq, k_new, v_new, ka, va, li, slots, btj, seq_lens,
                scale=D ** -0.5,
            )
            return (ka, va, acc + o.astype(jnp.float32)), None

        (k_all, v_all, acc), _ = jax.lax.scan(
            body,
            (k_all, v_all, jnp.zeros((B, HKV * G, D), jnp.float32)),
            jnp.arange(NL, dtype=jnp.int32),
        )
        return k_all, v_all, acc[0, 0, :4]

    ka, va = make_kv(dtype)
    ka, va, o = step(ka, va)
    np.asarray(o)  # compile + sync
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
    us = ms / NL * 1e3
    gb = NL * B * NPAGES * (
        2 * HKV * BS * D * jnp.dtype(dtype).itemsize
    ) / 1e9
    print(f"## {tag}: {ms:.3f} ms/step  {us:.0f} us/layer  "
          f"{gb/(ms/1e3):.0f} GB/s", flush=True)
    del ka, va
    return us


def check_numeric():
    """Folded-scale int8 attention vs bf16 attention, one layer.

    Small pool (block ids only reach 384) — the un-donated jit here
    would copy a full-size pool and overflow HBM next to the bench
    arrays."""
    nb = 400
    ka_np = rng.standard_normal((2, nb, HKV, BS, D), dtype=np.float32)
    ka_np *= 0.1
    va_np = rng.standard_normal((2, nb, HKV, BS, D), dtype=np.float32)
    va_np *= 0.1
    kb = jnp.asarray(ka_np, jnp.bfloat16)
    vb = jnp.asarray(va_np, jnp.bfloat16)
    ki = _quant(ka_np, S_K)
    vi = _quant(va_np, S_V)
    kn_b = jnp.asarray(kn_np, jnp.bfloat16)
    vn_b = jnp.asarray(vn_np, jnp.bfloat16)
    qq = (q.astype(jnp.float32) * S_K).astype(jnp.bfloat16)

    def call(qx, knx, vnx, kx, vx):
        return v5(
            qx, knx, vnx, kx, vx, 0, slots, btj, seq_lens,
            scale=D ** -0.5, cum=CUM,
        )

    o_b, _, _ = jax.jit(call)(q, kn_b, vn_b, kb, vb)
    # logits: (q*S_K) . (k/S_K) = q . k  ->  softmax scale unchanged
    o_i, _, _ = jax.jit(call)(
        qq, _quant(kn_np, S_K), _quant(vn_np, S_V), ki, vi
    )
    o_i = o_i.astype(jnp.float32) * S_V
    d = np.abs(np.asarray(o_b, np.float32) - np.asarray(o_i))
    ref = np.abs(np.asarray(o_b, np.float32))
    print(f"## numeric int8 vs bf16: max|d|={d.max():.4f} "
          f"mean|d|={d.mean():.5f} max_ref={ref.max():.3f}", flush=True)
    return float(d.max()), float(d.mean())


res = {}
res["v5_bf16"] = run("v5_bf16 (anchor)", functools.partial(v5, cum=CUM),
                     jnp.bfloat16)
res["v5_int8"] = run("v5_int8", functools.partial(v5, cum=CUM), jnp.int8)
res["v5_int8_b"] = run("v5_int8_b (variance repeat)",
                       functools.partial(v5, cum=CUM), jnp.int8)
res["v9t4_int8"] = run("v9t4_int8",
                       functools.partial(v9, cum=CUM, tile=4), jnp.int8)
res["v9t4_int8_b"] = run("v9t4_int8_b (variance repeat)",
                         functools.partial(v9, cum=CUM, tile=4), jnp.int8)
mx, mn = check_numeric()
print(json.dumps({
    "timing_us_per_layer": res,
    "numeric_int8_vs_bf16": {"max": mx, "mean": mn},
}), flush=True)
