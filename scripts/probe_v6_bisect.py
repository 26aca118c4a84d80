"""Bisect why v6 decode attention runs at 145 us/layer in the standalone
probe but 285 us/layer in profile_decode's attn_only (same ctx=192,
same contiguous tables).

Knobs between the two setups: NL (8 vs 28 layers), NB total (392 vs 1100
pages in the pool), NBT (tight 3 vs padded 5 table columns). Slope-timed
scan steps with donated caches, exactly like probe_decode_kernel.py.
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
    paged_decode_attention_write_v6_tpu as v6,
)

B, HKV, G, D, BS = 128, 8, 2, 128, 64
CTX = 192
NPAGES = CTX // BS

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.bfloat16)
k_new = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
v_new = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
seq_lens = jnp.full((B,), CTX, jnp.int32)


def run(tag, kern, nl, nb_total, nbt, iters=24):
    bt = np.zeros((B, nbt), np.int32)
    nxt = 1  # profile starts at block 1
    for i in range(B):
        for j in range(NPAGES):
            bt[i, j] = nxt
            nxt += 1
    slots = jnp.asarray(
        (bt[np.arange(B), NPAGES - 1] * BS + (CTX - 1) % BS), jnp.int32
    )
    btj = jnp.asarray(bt)

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
            jnp.arange(nl, dtype=jnp.int32),
        )
        return k_all, v_all, acc[0, 0, :4]

    ka = jnp.asarray(
        rng.standard_normal((nl, nb_total, HKV, BS, D)) * 0.1, jnp.bfloat16
    )
    va = jnp.asarray(
        rng.standard_normal((nl, nb_total, HKV, BS, D)) * 0.1, jnp.bfloat16
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
    per_layer_us = ms / nl * 1e3
    gb = nl * B * NPAGES * (2 * HKV * BS * D * 2) / 1e9
    print(
        f"## {tag}: {ms:.3f} ms/step  {per_layer_us:.0f} us/layer  "
        f"{gb/(ms/1e3):.0f} GB/s",
        flush=True,
    )
    del ka, va
    return per_layer_us


res = {}
res["v6_base"] = run("v6_base nl8 nb392 nbt3", v6, 8, 392, 3)
res["v6_nbt5"] = run("v6_nbt5 nl8 nb392 nbt5", v6, 8, 392, 5)
res["v6_pool"] = run("v6_pool nl8 nb1100 nbt3", v6, 8, 1100, 3)
res["v6_nl28"] = run("v6_nl28 nl28 nb392 nbt3", v6, 28, 392, 3, iters=12)
res["v6_full"] = run("v6_full nl28 nb1100 nbt5", v6, 28, 1100, 5, iters=12)
res["v5_full"] = run("v5_full nl28 nb1100 nbt5", v5, 28, 1100, 5, iters=12)
print(json.dumps(res), flush=True)
