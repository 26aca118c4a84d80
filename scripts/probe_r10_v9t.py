"""r10: v9 tile-width sweep at the bench config (bf16 AND int8 KV).

r7 measured tiles t2/t3/t4 and picked t4 (198 us/layer vs v5's 209);
t6/t8 were never timed although t8 AOT-compiles within VMEM. Larger
tiles amortize the per-tile softmax bookkeeping (the ~58 us/layer
between v9t4 and the 140 us pure-DMA floor) over more pages — this
sweep measures whether the curve keeps improving or VMEM pressure
turns it over. The r9 probe measured v9t4_int8 at 167 us/layer (vs
198 bf16) — the int8 t6/t8 points test whether bigger tiles amortize
the VPU convert further. Runs: bf16 t4 anchor / t6 / t8 (+ variance
repeat), int8 t6 / t8, numeric cross-check t8 vs t4.
"""

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from xllm_tpu.ops.pallas.decode_attention import (
    paged_decode_attention_write_v9_tpu as v9,
)

B, HKV, G, D, BS = 128, 8, 2, 128, 64
CTX = 192
NPAGES = CTX // BS
NL, NB_TOTAL, NBT = 28, 1100, 5

rng = np.random.default_rng(0)
q = jnp.asarray(
    rng.standard_normal((B, HKV * G, D), dtype=np.float32), jnp.bfloat16
)
k_new = jnp.asarray(
    rng.standard_normal((B, HKV, D), dtype=np.float32), jnp.bfloat16
)
v_new = jnp.asarray(
    rng.standard_normal((B, HKV, D), dtype=np.float32), jnp.bfloat16
)
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


def make_kv(dtype=jnp.bfloat16):
    ka_np = rng.standard_normal(
        (NL, NB_TOTAL, HKV, BS, D), dtype=np.float32
    )
    ka_np *= 0.1
    va_np = rng.standard_normal(
        (NL, NB_TOTAL, HKV, BS, D), dtype=np.float32
    )
    va_np *= 0.1
    if dtype == jnp.int8:
        ka = jnp.asarray(
            np.clip(np.rint(ka_np / (4.0 / 127)), -127, 127).astype(np.int8)
        )
        va = jnp.asarray(
            np.clip(np.rint(va_np / (4.0 / 127)), -127, 127).astype(np.int8)
        )
    else:
        ka = jnp.asarray(ka_np, jnp.bfloat16)
        va = jnp.asarray(va_np, jnp.bfloat16)
    del ka_np, va_np
    return ka, va


def run(tag, tile, iters=12, dtype=jnp.bfloat16):
    kern = functools.partial(v9, cum=CUM, tile=tile)
    if dtype == jnp.int8:
        kn = jnp.asarray(
            np.clip(np.rint(np.asarray(k_new, np.float32) / (4.0 / 127)),
                    -127, 127).astype(np.int8)
        )
        vn = jnp.asarray(
            np.clip(np.rint(np.asarray(v_new, np.float32) / (4.0 / 127)),
                    -127, 127).astype(np.int8)
        )
    else:
        kn, vn = k_new, v_new

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(k_all, v_all):
        def body(carry, li):
            ka, va, acc = carry
            o, ka, va = kern(
                q, kn, vn, ka, va, li, slots, btj, seq_lens,
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
    gb = NL * B * NPAGES * (2 * HKV * BS * D * 2) / 1e9
    print(f"## {tag}: {ms:.3f} ms/step  {us:.0f} us/layer  "
          f"{gb/(ms/1e3):.0f} GB/s", flush=True)
    del ka, va
    return us


def check(tile_a, tile_b):
    nb = 400
    ka_np = rng.standard_normal((2, nb, HKV, BS, D), dtype=np.float32)
    ka_np *= 0.1
    va_np = rng.standard_normal((2, nb, HKV, BS, D), dtype=np.float32)
    va_np *= 0.1
    kb = jnp.asarray(ka_np, jnp.bfloat16)
    vb = jnp.asarray(va_np, jnp.bfloat16)

    def call(tile, kx, vx):
        return v9(
            q, k_new, v_new, kx, vx, 0, slots, btj, seq_lens,
            scale=D ** -0.5, cum=CUM, tile=tile,
        )

    oa, _, _ = jax.jit(functools.partial(call, tile_a))(kb, vb)
    ob, _, _ = jax.jit(functools.partial(call, tile_b))(kb, vb)
    d = np.abs(
        np.asarray(oa, np.float32) - np.asarray(ob, np.float32)
    ).max()
    print(f"## numeric t{tile_a} vs t{tile_b}: max|d|={d:.6f}", flush=True)
    return float(d)


res = {}
res["v9t4"] = run("v9t4 (anchor)", 4)
res["v9t6"] = run("v9t6", 6)
res["v9t8"] = run("v9t8", 8)
res["v9t4_b"] = run("v9t4_b (variance repeat)", 4)
res["v9t6_int8"] = run("v9t6_int8", 6, dtype=jnp.int8)
res["v9t8_int8"] = run("v9t8_int8", 8, dtype=jnp.int8)
d = check(8, 4)
print(json.dumps({"timing_us_per_layer": res, "numeric_t8_vs_t4": d}),
      flush=True)
