"""r11: where does prefill matmul MFU go? (bare dots vs the scan path)

The r4 prefill profile measured the attention-less layer scan at 148 ms
for a [4x2048]-token chunk = ~40% MFU, while the dispatch e2e is 23.3%.
This probe separates dot-level from structure-level losses:

  bare_qkv / bare_gate / bare_down : single XLA dots at the exact layer
      shapes, slope-timed -> per-dot MFU ceiling on this chip
  fused_gateup : gate+up as ONE [D, 2I] dot (candidate fusion)
  scan_mlp : 28-layer scan of the mlp dots only (structure cost)

All bf16, f32 accumulation. Slope timing per CLAUDE.md.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

T = 8192  # 4 rows x 2048 tokens
D, I, HQKV = 2048, 6144, 6144  # qkv out = hkv*(g+2)*dh = 8*6*128
NL = 28
PEAK = 394e12

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((T, D), dtype=np.float32) * 0.1,
                jnp.bfloat16)


def timed(fn, *args, iters=16):
    out = fn(*args)
    np.asarray(out[:1, :1].astype(jnp.float32))
    n1, n2 = iters // 4, iters
    t0 = time.perf_counter()
    for _ in range(n1):
        out = fn(*args)
    np.asarray(out[:1, :1].astype(jnp.float32))
    t1 = time.perf_counter()
    for _ in range(n2):
        out = fn(*args)
    np.asarray(out[:1, :1].astype(jnp.float32))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


RES = {}


def report(tag, secs, flops):
    mfu = flops / secs / PEAK * 100
    RES[tag] = {"ms": round(secs * 1e3, 3), "mfu_pct": round(mfu, 1)}
    print(f"## {tag}: {secs*1e3:.3f} ms  MFU {mfu:.1f}%", flush=True)


def dot(w):
    return jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16))


w_qkv = jnp.asarray(rng.standard_normal((D, HQKV), dtype=np.float32) * 0.02,
                    jnp.bfloat16)
w_gate = jnp.asarray(rng.standard_normal((D, I), dtype=np.float32) * 0.02,
                     jnp.bfloat16)
w_gateup = jnp.asarray(
    rng.standard_normal((D, 2 * I), dtype=np.float32) * 0.02, jnp.bfloat16
)
w_down = jnp.asarray(rng.standard_normal((I, D), dtype=np.float32) * 0.02,
                     jnp.bfloat16)
xi = jnp.asarray(rng.standard_normal((T, I), dtype=np.float32) * 0.1,
                 jnp.bfloat16)

report("bare_qkv", timed(dot(w_qkv), x, w_qkv), 2 * T * D * HQKV)
report("bare_gate", timed(dot(w_gate), x, w_gate), 2 * T * D * I)
report("fused_gateup", timed(dot(w_gateup), x, w_gateup), 2 * T * D * 2 * I)
report("bare_down", timed(dot(w_down), xi, w_down), 2 * T * I * D)

# 28-layer scan of the full mlp (gate/up/down + silu), stacked weights
wg = jnp.asarray(
    rng.standard_normal((NL, D, I), dtype=np.float32) * 0.02, jnp.bfloat16
)
wu = jnp.asarray(
    rng.standard_normal((NL, D, I), dtype=np.float32) * 0.02, jnp.bfloat16
)
wd = jnp.asarray(
    rng.standard_normal((NL, I, D), dtype=np.float32) * 0.02, jnp.bfloat16
)


@jax.jit
def scan_mlp(x, wg, wu, wd):
    # stacks as EXPLICIT args: closure capture lifts them into lowering
    # constants (a 2.1 GB HLO that spends minutes serializing through
    # the tunnel — CLAUDE.md gotcha; bit this probe's first run)
    def body(h, ws):
        g, u, d = ws
        a = jax.nn.silu(
            jax.lax.dot_general(h, g, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        )
        b = jax.lax.dot_general(h, u, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = jax.lax.dot_general(
            (a * b).astype(jnp.bfloat16), d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return h + o, None

    out, _ = jax.lax.scan(body, x, (wg, wu, wd))
    return out


report("scan_mlp_28L", timed(scan_mlp, x, wg, wu, wd, iters=6),
       NL * 2 * T * D * I * 3)
print(json.dumps(RES), flush=True)
