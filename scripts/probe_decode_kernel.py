"""Ablation probe of the v4 decode-attention kernel at bench shapes.

B=128, Hkv=8, G=2, D=128, bs=64, ctx=192 (the bench's mid-decode point).
To factor out the ~0.5 ms per-call tunnel dispatch, each timed unit is
ONE jit that scans the kernel over NL layers with donated caches —
exactly the model's per-layer scan. Variants isolate DMA streaming from
compute. Timing is slope-based (memory: total/ITERS fabricates a floor).
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
    paged_decode_attention_write_v4_tpu as v4,
    paged_decode_attention_write_v6_tpu as v6,
    paged_decode_attention_write_v7_tpu as v7,
)

B, HKV, G, D, BS = 128, 8, 2, 128, 64
CTX = 192  # 3 pages exactly
NPAGES = CTX // BS
NB = B * NPAGES + 8
NL = 8
ITERS = 24

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, HKV * G, D)), jnp.bfloat16)
k_new = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
v_new = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
layer0 = jnp.zeros((), jnp.int32)
bt = jnp.asarray(np.arange(B * NPAGES, dtype=np.int32).reshape(B, NPAGES))
seq_lens = jnp.full((B,), CTX, jnp.int32)
slots = jnp.asarray(
    (np.arange(B) * NPAGES + NPAGES - 1) * BS + (CTX - 1) % BS, jnp.int32
)

page_bytes = 2 * HKV * BS * D * 2  # k+v, bf16
total_gb = NL * B * NPAGES * page_bytes / 1e9


def make_step(kern=v4, **kw):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(k_all, v_all):
        def body(carry, li):
            ka, va, acc = carry
            o, ka, va = kern(
                q, k_new, v_new, ka, va, li, slots, bt, seq_lens,
                scale=D ** -0.5, **kw
            )
            return (ka, va, acc + o.astype(jnp.float32)), None

        (k_all, v_all, acc), _ = jax.lax.scan(
            body,
            (k_all, v_all, jnp.zeros((B, HKV * G, D), jnp.float32)),
            jnp.arange(NL, dtype=jnp.int32),
        )
        return k_all, v_all, acc[0, 0, :4]

    return step


def fresh_caches():
    k = jnp.asarray(
        rng.standard_normal((NL, NB, HKV, BS, D)) * 0.1, jnp.bfloat16
    )
    v = jnp.asarray(
        rng.standard_normal((NL, NB, HKV, BS, D)) * 0.1, jnp.bfloat16
    )
    return k, v


def run(tag, kern=v4, **kw):
    step = make_step(kern, **kw)
    ka, va = fresh_caches()
    ka, va, o = step(ka, va)
    np.asarray(o)  # compile + sync
    n1, n2 = ITERS // 4, ITERS
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
    gbps = total_gb / (ms / 1e3)
    per_layer_us = ms / NL * 1e3
    print(
        f"## {tag}: {ms:.3f} ms/step  {per_layer_us:.0f} us/layer  "
        f"{gbps:.0f} GB/s",
        flush=True,
    )
    del ka, va
    return ms


def make_step_bs(kern, bs2, **kw):
    """Same slope-timed step at an alternate page size (bs=128 halves the
    per-page fixed cost share for the same kernels)."""
    npages2 = (CTX + bs2 - 1) // bs2
    nb2 = B * npages2 + 8
    bt2 = jnp.asarray(
        np.arange(B * npages2, dtype=np.int32).reshape(B, npages2))
    slots2 = jnp.asarray(
        (np.arange(B) * npages2 + (CTX - 1) // bs2) * bs2
        + (CTX - 1) % bs2, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(k_all, v_all):
        def body(carry, li):
            ka, va, acc = carry
            o, ka, va = kern(
                q, k_new, v_new, ka, va, li, slots2, bt2, seq_lens,
                scale=D ** -0.5, **kw
            )
            return (ka, va, acc + o.astype(jnp.float32)), None

        (k_all, v_all, acc), _ = jax.lax.scan(
            body,
            (k_all, v_all, jnp.zeros((B, HKV * G, D), jnp.float32)),
            jnp.arange(NL, dtype=jnp.int32),
        )
        return k_all, v_all, acc[0, 0, :4]

    return step, nb2


def run_bs(tag, kern, bs2, **kw):
    step, nb2 = make_step_bs(kern, bs2, **kw)
    ka = jnp.asarray(
        rng.standard_normal((NL, nb2, HKV, bs2, D)) * 0.1, jnp.bfloat16)
    va = jnp.asarray(
        rng.standard_normal((NL, nb2, HKV, bs2, D)) * 0.1, jnp.bfloat16)
    ka, va, o = step(ka, va)
    np.asarray(o)
    n1, n2 = ITERS // 4, ITERS
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
    # bytes: ceil-paged read per seq (bs=128 reads 2 pages for ctx 192)
    npages2 = (CTX + bs2 - 1) // bs2
    gb = NL * B * npages2 * (2 * HKV * bs2 * D * 2) / 1e9
    print(f"## {tag}: {ms:.3f} ms/step  {ms/NL*1e3:.0f} us/layer  "
          f"{gb/(ms/1e3):.0f} GB/s(raw)", flush=True)
    del ka, va
    return ms


res = {}
res["v5_bs128"] = run_bs("v5_bs128", v5, 128)
res["v7_bs128_n4"] = run_bs("v7_bs128_n4", v7, 128, nslots_override=4)
res["v7_n6"] = run("v7_n6", kern=v7)
res["v7_n8"] = run("v7_n8", kern=v7, nslots_override=8)
res["v7_n4"] = run("v7_n4", kern=v7, nslots_override=4)
res["v5_s2"] = run("v5_s2", kern=v5)
res["v6_s2"] = run("v6_s2", kern=v6)
res["v6_s1"] = run("v6_s1", kern=v6, split_override=1)
res["v6_s2_n12"] = run("v6_s2_n12", kern=v6, nslots_override=12)
res["v6_s2_n16"] = run("v6_s2_n16", kern=v6, nslots_override=16)
res["v6_s1_n16"] = run("v6_s1_n16", kern=v6, split_override=1,
                       nslots_override=16)
res["v5_s2_n16"] = run("v5_s2_n16", kern=v5, nslots_override=16)
res["v5_s1"] = run("v5_s1", kern=v5, split_override=1)
print(json.dumps(res), flush=True)
