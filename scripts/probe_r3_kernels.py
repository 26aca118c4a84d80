"""r3 in-context decode-kernel tournament at the FULL bench config.

Lesson from the r2->r3 bisect (probe_v6_bisect.py): standalone 8-layer
probe numbers do NOT transfer across sessions or to the 28-layer
in-context config (v6 measured 145 us/layer in r2's probe but 243 in
r3's full-config run, while v5 measured 199 standalone but 210 full) —
kernel defaults must be picked from SAME-SESSION runs at nl=28,
nb=1100, nbt=5, i.e. exactly what profile_decode's attn_only sees.

Also runs a one-shot ON-CHIP numeric check of each variant against the
jnp oracle (ADVICE r2: v6 correctness previously rested on interpret
mode alone, which has diverged from real Mosaic semaphore behavior).
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
seq_lens = jnp.full((B,), CTX, jnp.int32)

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


def oracle(q, k_new, v_new, ka, va, slots, btj, seq_lens, scale):
    """jnp paged decode attention (single layer 0) for the numeric check."""
    hkv, d = va.shape[2], va.shape[4]
    pages = btj  # [B, NBT]
    k_seq = ka[0][pages]  # [B, NBT, Hkv, bs, D]
    v_seq = va[0][pages]
    k_seq = k_seq.transpose(0, 2, 1, 3, 4).reshape(B, hkv, -1, d)
    v_seq = v_seq.transpose(0, 2, 1, 3, 4).reshape(B, hkv, -1, d)
    qh = q.reshape(B, hkv, G, d).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhtd->bhgt", qh, k_seq.astype(jnp.float32)) * scale
    idx = jnp.arange(k_seq.shape[2])[None, None, None, :]
    s = jnp.where(idx < seq_lens[:, None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgt,bhtd->bhgd", p, v_seq.astype(jnp.float32))
    return o.reshape(B, hkv * G, d)


def check(tag, kern):
    """One on-chip call vs oracle (post-write cache feeds the oracle)."""
    ka = jnp.asarray(
        rng.standard_normal((1, NB_TOTAL, HKV, BS, D)) * 0.1, jnp.bfloat16
    )
    va = jnp.asarray(
        rng.standard_normal((1, NB_TOTAL, HKV, BS, D)) * 0.1, jnp.bfloat16
    )
    o, ka2, va2 = kern(
        q, k_new, v_new, ka, va, jnp.int32(0), slots, btj, seq_lens,
        scale=D ** -0.5,
    )
    ref = oracle(q, k_new, v_new, ka2, va2, slots, btj, seq_lens, D ** -0.5)
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref)))
    # the kernel must also have written the new K/V row into the cache
    wrote = float(
        jnp.max(jnp.abs(
            ka2[0].reshape(-1, D)[  # [NB*Hkv*bs, D] row view
                (slots[:, None] // BS * (HKV * BS)
                 + jnp.arange(HKV)[None, :] * BS + slots[:, None] % BS)
            ].astype(jnp.float32)
            - k_new.astype(jnp.float32)
        ))
    )
    print(f"## check {tag}: max|o-ref|={err:.4f} max|k_wr-k_new|={wrote:.4f}",
          flush=True)
    del ka, va, ka2, va2
    return err, wrote


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


res = {}
res["v5_s2_a"] = run("v5_s2_a (default)", v5)
res["v5_s1"] = run(
    "v5_s1", functools.partial(v5, split_override=1)
)
res["v7_n6"] = run("v7_n6 (default)", v7)
res["v7_n8"] = run(
    "v7_n8", functools.partial(v7, nslots_override=8)
)
res["v6_s1"] = run("v6_s1", v6)
res["v5_s2_b"] = run("v5_s2_b (variance repeat)", v5)

errs = {}
for tag, kern in (("v5", v5), ("v6", v6), ("v7", v7)):
    e, w = check(tag, kern)
    errs[tag] = {"max_err": e, "write_err": w}
print(json.dumps({"timing_us_per_layer": res, "numeric": errs}), flush=True)
