"""In-context decode-attention DMA floor: v4 nocompute at the bench config.

r4 data (probe_r4_kernels.py): v5/v6 sit at ~205 us/layer in-context
regardless of prep/splits — so the binding constraint is per-page work
inside the loop, not XLA prep. This probe runs the SAME 28-layer
full-config scan with v4's nocompute ablation (DMA issue + waits, no
attention math) to split the 205 us into (DMA+issue) vs (compute):

  - if nocompute ~= 145 us/layer (the standalone floor), ~60 us of VPU/MXU
    per layer is the target for kernel surgery;
  - if nocompute ~= 200 us, the kernels are AT the in-context floor and
    attention optimization is done at this page size.
"""

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from xllm_tpu.ops.pallas.legacy.decode_attention import (
    paged_decode_attention_write_v4_tpu as v4,
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
res["v4_nocompute_s4"] = run(
    "v4_nocompute_s4", functools.partial(v4, nocompute=True)
)
res["v4_nocompute_s1"] = run(
    "v4_nocompute_s1",
    functools.partial(v4, nocompute=True, split_override=1),
)
res["v4_nocompute_s1_n16"] = run(
    "v4_nocompute_s1_n16",
    functools.partial(
        v4, nocompute=True, split_override=1, nslots_override=16
    ),
)
res["v4_full_s4"] = run("v4_full_s4 (compute back on)", v4)
print(json.dumps({"timing_us_per_layer": res}), flush=True)
