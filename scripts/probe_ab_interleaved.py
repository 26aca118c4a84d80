"""Interleaved kernel A/B at the bench config — drift-immune timing.

The r4 tile sweep exposed monotone within-session drift: sequential
probe runs that each allocate fresh 12 GB pools degrade run over run
(v9t4 measured 158 then 226 us/layer in one session; r7 saw 209 -> 276
for v5). This harness removes ordering effects: ONE pool allocation,
both variants compiled against the SAME donated arrays, then timed in
alternating A/B/A/B rounds; the report is per-round pairs plus medians,
so any residual drift hits both variants equally.

Variants come from XLLM_AB (comma list, default "v9t4,v5"):
  v5 | v9tN         bf16 KV
  v9tNs             v9 with the bf16 softmax stream (softmax16)
  v9tNp             v9 with hoisted mask constants (premask)
  v11tN             INTERLEAVED-layout kernel (single kv array; its own
                    pool); v11tNx runs it on SCATTERED block tables (the
                    per-page fallback instead of the contiguous burst)
  v5i | v9tNi | v11tNi  int8 KV (folded scales; codes only — timing)

NB_TOTAL is overridable via XLLM_AB_NB (split + interleaved pools
together exceed HBM at the bench 1100).
"""

import functools
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from xllm_tpu.ops.pallas.decode_attention import (
    paged_decode_attention_write_v5_tpu as v5,
    paged_decode_attention_write_v9_tpu as v9,
    paged_decode_attention_write_v11_tpu as v11,
    paged_decode_attention_write_v12_tpu as v12,
)
from xllm_tpu.ops.pallas.legacy.decode_attention import (
    paged_decode_attention_write_v10_tpu as v10,
)

B, HKV, G, D, BS = 128, 8, 2, 128, 64
CTX = 192
NPAGES = CTX // BS
NL, NBT = 28, 5
NB_TOTAL = int(os.environ.get("XLLM_AB_NB", "1100"))
ROUNDS = int(os.environ.get("XLLM_AB_ROUNDS", "4"))
ITERS = 8  # scan passes per timed segment

rng = np.random.default_rng(0)
q = jnp.asarray(
    rng.standard_normal((B, HKV * G, D), dtype=np.float32), jnp.bfloat16
)
kn = rng.standard_normal((B, HKV, D), dtype=np.float32)
vn = rng.standard_normal((B, HKV, D), dtype=np.float32)
seq_lens_np = np.full((B,), CTX, np.int32)
if os.environ.get("XLLM_AB_SPREAD") == "1":
    # spread tail offsets so per-step page completions hit 1/bs of the
    # batch (the v12 steady state) instead of all rows at once; applied
    # to every variant so comparisons stay fair
    seq_lens_np -= np.arange(B, dtype=np.int32) % BS
seq_lens = jnp.asarray(seq_lens_np)

# contiguous per-seq page runs (what the ordered free list produces) and
# a scattered assignment (the v11 per-page fallback path)
bt = np.zeros((B, NBT), np.int32)
nxt = 1
for i in range(B):
    for j in range(NPAGES):
        bt[i, j] = nxt
        nxt += 1
order = rng.permutation(np.arange(1, B * NPAGES + 1))
bt_scat = np.zeros((B, NBT), np.int32)
bt_scat[:, :NPAGES] = order.reshape(B, NPAGES)
TABLES = {"contig": jnp.asarray(bt), "scatter": jnp.asarray(bt_scat)}
SLOTS = {
    key: jnp.asarray(
        t[np.arange(B), (seq_lens_np - 1) // BS] * BS
        + (seq_lens_np - 1) % BS,
        jnp.int32,
    )
    for key, t in ((k, np.asarray(v)) for k, v in TABLES.items())
}
cum_np = np.zeros(B + 1, np.int32)
np.cumsum(-(-seq_lens_np // BS), out=cum_np[1:])
CUM = jnp.asarray(cum_np)


def parse_variant(name):
    """-> (name, kern, dtype, layout, tables). layout: 'split' | 'ilv'."""
    name = name.strip()
    int8 = name.endswith("i")
    base = name[:-1] if int8 else name
    tables = "contig"
    if base.endswith("x"):
        tables = "scatter"
        base = base[:-1]
    patch_mode = 2
    if len(base) >= 2 and base[-2] == "w" and base[-1].isdigit():
        patch_mode = int(base[-1])  # v9t4w0 / v9t4w1: tail write-back
        base = base[:-2]            # probe (0 = none, 1 = K page only)
    premask = base.endswith("p")
    if premask:
        base = base[:-1]
    sm16 = base.endswith("s")
    if sm16:
        base = base[:-1]
    if (premask or sm16 or patch_mode != 2) and not base.startswith("v9"):
        # suffixes silently no-oping under another base would corrupt the
        # A/B labels this harness exists to make trustworthy (ADVICE r4)
        raise ValueError(f"premask/softmax16 are v9-only options: {name!r}")
    layout = "split"
    if base.startswith("v12"):
        layout = "ilv"
        tile = int(base[4:]) if base.startswith("v12t") else 4
        kern = functools.partial(v12, tile=tile)
    elif base.startswith("v11"):
        layout = "ilv"
        tile = int(base[4:]) if base.startswith("v11t") else 4
        kern = functools.partial(v11, cum=CUM, tile=tile)
    elif base == "v5":
        kern = functools.partial(v5, cum=CUM)
    elif base.startswith("v10t"):
        kern = functools.partial(v10, cum=CUM, tile=int(base[4:]))
    elif base == "v10":
        kern = functools.partial(v10, cum=CUM, tile=4)
    elif base.startswith("v9t"):
        spec = base[3:]  # "4" | "4n6" (tile [+ nslots override])
        if "n" in spec:
            tpart, npart = spec.split("n")
            ns = int(npart)
        else:
            tpart, ns = spec, 0
        kern = functools.partial(v9, cum=CUM, tile=int(tpart),
                                 softmax16=sm16, premask=premask,
                                 nslots_override=ns,
                                 patch_mode=patch_mode)
    elif base == "v9":
        kern = functools.partial(v9, cum=CUM, tile=4, softmax16=sm16,
                                 premask=premask, patch_mode=patch_mode)
    else:
        raise ValueError(name)
    return name, kern, (jnp.int8 if int8 else jnp.bfloat16), layout, tables


VARIANTS = [
    parse_variant(v)
    for v in os.environ.get("XLLM_AB", "v9t4,v5").split(",")
]
POOL_KEYS = {(layout, dt) for _, _, dt, layout, _ in VARIANTS}


def make_pool(layout, dtype):
    shape = ((NL, NB_TOTAL, 2, HKV, BS, D) if layout == "ilv"
             else (NL, NB_TOTAL, HKV, BS, D))
    a = rng.standard_normal(shape, dtype=np.float32)
    a *= 0.1
    if dtype == jnp.int8:
        out = jnp.asarray(
            np.clip(np.rint(a / (4.0 / 127)), -127, 127).astype(np.int8)
        )
    else:
        out = jnp.asarray(a, jnp.bfloat16)
    del a
    if layout == "ilv":
        return (out,)
    return (out, make_pool_v(dtype))


def make_pool_v(dtype):
    a = rng.standard_normal((NL, NB_TOTAL, HKV, BS, D), dtype=np.float32)
    a *= 0.1
    if dtype == jnp.int8:
        out = jnp.asarray(
            np.clip(np.rint(a / (4.0 / 127)), -127, 127).astype(np.int8)
        )
    else:
        out = jnp.asarray(a, jnp.bfloat16)
    del a
    return out


# ONE pool (pair or single interleaved array) per (layout, dtype),
# shared by every variant of that combination
POOLS = {key: make_pool(*key) for key in POOL_KEYS}
ROWS = {
    jnp.bfloat16: (jnp.asarray(kn, jnp.bfloat16),
                   jnp.asarray(vn, jnp.bfloat16)),
    jnp.int8: (
        jnp.asarray(np.clip(np.rint(kn / (4.0 / 127)), -127, 127)
                    .astype(np.int8)),
        jnp.asarray(np.clip(np.rint(vn / (4.0 / 127)), -127, 127)
                    .astype(np.int8)),
    ),
}


def build_step(kern, dtype, layout, tables):
    k_new, v_new = ROWS[dtype if dtype in ROWS else jnp.bfloat16]
    btj, slots = TABLES[tables], SLOTS[tables]

    if layout == "ilv":

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(kv_all):
            def body(carry, li):
                kv, acc = carry
                o, kv = kern(
                    q, k_new, v_new, kv, li, slots, btj, seq_lens,
                    scale=D ** -0.5,
                )
                return (kv, acc + o.astype(jnp.float32)), None

            (kv_all, acc), _ = jax.lax.scan(
                body,
                (kv_all, jnp.zeros((B, HKV * G, D), jnp.float32)),
                jnp.arange(NL, dtype=jnp.int32),
            )
            return (kv_all, acc[0, 0, :4])

        return lambda pool: (lambda r: (r[:1], r[1]))(step(*pool))

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

    return lambda pool: (lambda r: (r[:2], r[2]))(step(*pool))


STEPS = {
    name: build_step(kern, dt, layout, tables)
    for name, kern, dt, layout, tables in VARIANTS
}
KEY_OF = {name: (layout, dt) for name, _, dt, layout, _ in VARIANTS}

# compile + warm every variant once on its shared pool
for name in STEPS:
    pool, o = STEPS[name](POOLS[KEY_OF[name]])
    POOLS[KEY_OF[name]] = pool
    np.asarray(o)

results = {name: [] for name in STEPS}
for r in range(ROUNDS):
    for name in STEPS:
        step = STEPS[name]
        key = KEY_OF[name]
        n1, n2 = 2, ITERS
        t0 = time.perf_counter()
        for _ in range(n1):
            POOLS[key], o = step(POOLS[key])
        np.asarray(o)
        t1 = time.perf_counter()
        for _ in range(n2):
            POOLS[key], o = step(POOLS[key])
        np.asarray(o)
        t2 = time.perf_counter()
        us = ((t2 - t1) - (t1 - t0)) / (n2 - n1) / NL * 1e6
        results[name].append(round(us, 1))
        print(f"## round {r} {name}: {us:.0f} us/layer", flush=True)

med = {
    name: sorted(v)[len(v) // 2] for name, v in results.items()
}
print(json.dumps({"rounds_us_per_layer": results, "median": med}),
      flush=True)
