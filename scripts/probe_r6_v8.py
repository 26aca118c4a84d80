"""r6 in-context A/B: v8 chunked-flash decode vs v5 at the bench config.

r5 (probe_r5_floor.py) measured the pure DMA stream (v4 nocompute) at
140 us/layer vs v5/v6's ~205 in-context — ~65 us/layer of per-page
softmax bookkeeping on the critical path. v8 runs the mask/max/exp/
rescale/PV once per C-page chunk. Tournament at the exact bench config
(28 layers, 1100-page pool, 5 block-table columns, batch 128 x ctx 192,
donated caches, slope-timed) + an on-chip numeric check vs v5.
"""

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from xllm_tpu.ops.pallas.decode_attention import (
    paged_decode_attention_write_v5_tpu as v5,
)
from xllm_tpu.ops.pallas.legacy.decode_attention import (
    paged_decode_attention_write_v8_tpu as v8,
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
    """On-chip numeric: kern_a vs kern_b at the bench shape."""
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
res["v8_c4"] = run("v8_c4", functools.partial(v8, cum=CUM))
res["v8_c2"] = run("v8_c2", functools.partial(v8, cum=CUM, chunk=2))
res["v8_c4_n8"] = run(
    "v8_c4_n8", functools.partial(v8, cum=CUM, nslots_override=8)
)
res["v8_c4_s1"] = run(
    "v8_c4_s1", functools.partial(v8, cum=CUM, split_override=1)
)
res["v8_c4_s4"] = run(
    "v8_c4_s4", functools.partial(v8, cum=CUM, split_override=4)
)
res["v8_c3"] = run(
    "v8_c3 (ctx fits one chunk)", functools.partial(v8, cum=CUM, chunk=3)
)
res["v5_pre_b"] = run("v5_pre_b (variance repeat)", functools.partial(v5, cum=CUM))

e, k = check("v8_c4 vs v5", functools.partial(v8, cum=CUM),
             functools.partial(v5, cum=CUM))
print(json.dumps({
    "timing_us_per_layer": res, "numeric": {"o": e, "k": k},
}), flush=True)
