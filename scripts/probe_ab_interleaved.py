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
  v5i | v9tNi | v9tNpi   int8 KV (folded scales; codes only — timing)
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
)
from xllm_tpu.ops.pallas.legacy.decode_attention import (
    paged_decode_attention_write_v10_tpu as v10,
)

B, HKV, G, D, BS = 128, 8, 2, 128, 64
CTX = 192
NPAGES = CTX // BS
NL, NB_TOTAL, NBT = 28, 1100, 5
ROUNDS = int(os.environ.get("XLLM_AB_ROUNDS", "4"))
ITERS = 8  # scan passes per timed segment

rng = np.random.default_rng(0)
q = jnp.asarray(
    rng.standard_normal((B, HKV * G, D), dtype=np.float32), jnp.bfloat16
)
kn = rng.standard_normal((B, HKV, D), dtype=np.float32)
vn = rng.standard_normal((B, HKV, D), dtype=np.float32)
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
cum_np = np.zeros(B + 1, np.int32)
np.cumsum(-(-seq_lens_np // BS), out=cum_np[1:])
CUM = jnp.asarray(cum_np)


def parse_variant(name):
    name = name.strip()
    int8 = name.endswith("i")
    base = name[:-1] if int8 else name
    premask = base.endswith("p")
    if premask:
        base = base[:-1]
    sm16 = base.endswith("s")
    if sm16:
        base = base[:-1]
    if base == "v5":
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
                                 nslots_override=ns)
    elif base == "v9":
        kern = functools.partial(v9, cum=CUM, tile=4, softmax16=sm16,
                                 premask=premask)
    else:
        raise ValueError(name)
    return name, kern, (jnp.int8 if int8 else jnp.bfloat16)


VARIANTS = [
    parse_variant(v)
    for v in os.environ.get("XLLM_AB", "v9t4,v5").split(",")
]
DTYPES = {dt for _, _, dt in VARIANTS}


def make_pool(dtype):
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


# ONE pool pair per dtype, shared by every variant of that dtype
POOLS = {dt: (make_pool(dt), make_pool(dt)) for dt in DTYPES}
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


def build_step(kern, dtype):
    k_new, v_new = ROWS[dtype if dtype in ROWS else jnp.bfloat16]

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

    return step


STEPS = {name: build_step(kern, dt) for name, kern, dt in VARIANTS}
DT_OF = {name: dt for name, _, dt in VARIANTS}

# compile + warm every variant once on its shared pool
for name in STEPS:
    ka, va = POOLS[DT_OF[name]]
    ka, va, o = STEPS[name](ka, va)
    POOLS[DT_OF[name]] = (ka, va)
    np.asarray(o)

results = {name: [] for name in STEPS}
for r in range(ROUNDS):
    for name in STEPS:
        ka, va = POOLS[DT_OF[name]]
        step = STEPS[name]
        n1, n2 = 2, ITERS
        t0 = time.perf_counter()
        for _ in range(n1):
            ka, va, o = step(ka, va)
        np.asarray(o)
        t1 = time.perf_counter()
        for _ in range(n2):
            ka, va, o = step(ka, va)
        np.asarray(o)
        t2 = time.perf_counter()
        POOLS[DT_OF[name]] = (ka, va)
        us = ((t2 - t1) - (t1 - t0)) / (n2 - n1) / NL * 1e6
        results[name].append(round(us, 1))
        print(f"## round {r} {name}: {us:.0f} us/layer", flush=True)

med = {
    name: sorted(v)[len(v) // 2] for name, v in results.items()
}
print(json.dumps({"rounds_us_per_layer": results, "median": med}),
      flush=True)
