"""r7 in-context A/B: v9 T-page tile decode vs v5/v7 at the bench config.

r6 (probe_r6_v8.py) showed v8's scores-scratch detour LOSES (~225 vs
v5's 207): the binding constraint is the scalar issue count per page,
and v8 re-spent its savings on scratch round-trips and a multi-slot
gather. v9 keeps v7's contiguous T-page tile (one flash iteration per T
pages, no scratch) and replaces v7's on-device searchsorted prep with a
vectorized scatter+cumsum. Tournament at the exact bench config +
on-chip numeric check vs v5.
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
from xllm_tpu.ops.pallas.legacy.decode_attention import (
    paged_decode_attention_write_v7_tpu as v7,
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


def run(tag, kern, iters=12):
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

    ka = jnp.asarray(
        rng.standard_normal((NL, NB_TOTAL, HKV, BS, D)) * 0.1, jnp.bfloat16
    )
    va = jnp.asarray(
        rng.standard_normal((NL, NB_TOTAL, HKV, BS, D)) * 0.1, jnp.bfloat16
    )
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
    gb = NL * B * NPAGES * (2 * HKV * BS * D * 2) / 1e9
    print(
        f"## {tag}: {ms:.3f} ms/step  {per_layer_us:.0f} us/layer  "
        f"{gb/(ms/1e3):.0f} GB/s",
        flush=True,
    )
    del ka, va
    return per_layer_us


def check(tag, kern_a, kern_b):
    ka = jnp.asarray(
        rng.standard_normal((1, NB_TOTAL, HKV, BS, D)) * 0.1, jnp.bfloat16
    )
    va = jnp.asarray(
        rng.standard_normal((1, NB_TOTAL, HKV, BS, D)) * 0.1, jnp.bfloat16
    )
    kb, vb = jnp.copy(ka), jnp.copy(va)
    o1, ka, va = kern_a(
        q, k_new, v_new, ka, va, jnp.int32(0), slots, btj, seq_lens,
        scale=D ** -0.5,
    )
    o2, kb, vb = kern_b(
        q, k_new, v_new, kb, vb, jnp.int32(0), slots, btj, seq_lens,
        scale=D ** -0.5,
    )
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    kerr = float(jnp.max(jnp.abs(ka.astype(jnp.float32) - kb.astype(jnp.float32))))
    print(f"## check {tag}: max|o-o|={err} max|k-k|={kerr}", flush=True)
    del ka, va, kb, vb
    return err, kerr


res = {}
res["v5_pre"] = run("v5_pre (r3 default)", functools.partial(v5, cum=CUM))
res["v9_t4"] = run("v9_t4", functools.partial(v9, cum=CUM))
res["v9_t2"] = run("v9_t2", functools.partial(v9, cum=CUM, tile=2))
res["v9_t3"] = run("v9_t3 (ctx fits one tile)", functools.partial(v9, cum=CUM, tile=3))
res["v9_t4_n4"] = run(
    "v9_t4_n4", functools.partial(v9, cum=CUM, nslots_override=4)
)
res["v7_dev"] = run("v7_dev (device searchsorted)", v7)
res["v5_pre_b"] = run("v5_pre_b (variance repeat)", functools.partial(v5, cum=CUM))

e, k = check("v9_t4 vs v5", functools.partial(v9, cum=CUM),
             functools.partial(v5, cum=CUM))
print(json.dumps({
    "timing_us_per_layer": res, "numeric": {"o": e, "k": k},
}), flush=True)
