"""r4 in-context decode-kernel tournament: host-precomputed page maps.

The r3 full-config run (probe_r3_kernels.py) measured v6 at 243 us/layer
vs its r2 standalone 145 — but the r3 harness (like the production
decoder before this round) recomputed `cum` (cumsum) and `seq_of_page`
(jnp.searchsorted — a SEQUENTIAL binary-search loop on TPU) inside every
layer of the scan. This probe passes both maps in as scan-invariant
constants (what DecodeInput.page_cum/page_seq now do in production) and
re-runs the tournament at the exact bench config: 28 layers, 1100-page
pool, 5 block-table columns, batch 128 x ctx 192, donated caches,
slope-timed.
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

# host-precomputed page maps (input_builder.build_decode_input)
pages_np = -(-seq_lens_np // BS)
cum_np = np.zeros(B + 1, np.int32)
np.cumsum(pages_np, out=cum_np[1:])
seq_np = np.searchsorted(
    cum_np[1:], np.arange(B * NBT), side="right"
).astype(np.int32)
CUM = jnp.asarray(cum_np)
SEQ = jnp.asarray(seq_np)


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


def check(tag, kern):
    """Premap vs in-kernel prep must be bit-identical on chip."""
    ka = jnp.asarray(
        rng.standard_normal((1, NB_TOTAL, HKV, BS, D)) * 0.1, jnp.bfloat16
    )
    va = jnp.asarray(
        rng.standard_normal((1, NB_TOTAL, HKV, BS, D)) * 0.1, jnp.bfloat16
    )
    kb, vb = jnp.copy(ka), jnp.copy(va)
    o1, ka, va = kern(
        q, k_new, v_new, ka, va, jnp.int32(0), slots, btj, seq_lens,
        scale=D ** -0.5,
    )
    o2, kb, vb = kern(
        q, k_new, v_new, kb, vb, jnp.int32(0), slots, btj, seq_lens,
        scale=D ** -0.5, cum=CUM,
    )
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    kerr = float(jnp.max(jnp.abs(ka.astype(jnp.float32) - kb.astype(jnp.float32))))
    print(f"## check {tag}: max|o_pre-o_dev|={err} max|k-k|={kerr}", flush=True)
    del ka, va, kb, vb
    return err, kerr


res = {}
res["v5_dev"] = run("v5_dev (r3 default, device prep)", v5)
res["v5_pre"] = run("v5_pre", functools.partial(v5, cum=CUM))
res["v5_pre_s1"] = run(
    "v5_pre_s1", functools.partial(v5, cum=CUM, split_override=1)
)
res["v6_pre"] = run(
    "v6_pre", functools.partial(v6, cum=CUM, seq_of_page=SEQ)
)
res["v6_pre_n12"] = run(
    "v6_pre_n12",
    functools.partial(v6, cum=CUM, seq_of_page=SEQ, nslots_override=12),
)
res["v6_pre_s2"] = run(
    "v6_pre_s2",
    functools.partial(v6, cum=CUM, seq_of_page=SEQ, split_override=2),
)
res["v6_dev"] = run("v6_dev (r3 comparison)", v6)
res["v5_pre_b"] = run("v5_pre_b (variance repeat)", functools.partial(v5, cum=CUM))

def v6_pre(*a, cum=None, **kw):
    if cum is not None:
        kw.update(cum=cum, seq_of_page=SEQ)
    return v6(*a, **kw)


errs = {}
e, k = check("v5", v5)
errs["v5"] = {"o": e, "k": k}
e, k = check("v6", v6_pre)
errs["v6"] = {"o": e, "k": k}
print(json.dumps({"timing_us_per_layer": res, "numeric": errs}), flush=True)
