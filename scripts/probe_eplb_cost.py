"""On-chip cost of one EPLB rebalance at 8B-MoE scale (VERDICT r4 weak
5): the between-steps expert re-placement is a donated gather over every
expert stack — this measures the step-time spike it injects.

Config: 24 MoE layers x 64 experts (+2 replica slots), D=2048, I=768
bf16 — ~7.4 GB of expert weights (qwen3-30B-A3B-class shard). Slope
timing (iters inside one jit-free loop; np.asarray forces sync)."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

assert jax.default_backend() == "tpu", jax.default_backend()

import ml_dtypes

L, E, R, D, I = 24, 64, 2, 2048, 768
EP = E + R
rng = np.random.default_rng(0)
# host-side bf16: a device-staged f32 intermediate would itself OOM
gate_up = jnp.asarray(
    rng.standard_normal((L, EP, D, 2 * I))
    .astype(ml_dtypes.bfloat16)
)
down = jnp.asarray(
    rng.standard_normal((L, EP, I, D)).astype(ml_dtypes.bfloat16)
)
nbytes = (gate_up.size + down.size) * 2
print(f"expert stacks: {nbytes/1e9:.2f} GB")


@partial(jax.jit, donate_argnums=(0, 1))
def permute(gu, dn, rel):
    # layer-at-a-time donated gather (runner apply_expert_placement):
    # whole-stack take_along_axis doubles expert HBM transiently and
    # OOMed this very probe (24.4 G > 15.75 G)
    def permute_stack(stack):
        def body(li, st):
            layer = jnp.take(st[li], rel[li], axis=0)
            return jax.lax.dynamic_update_index_in_dim(st, layer, li, 0)

        return jax.lax.fori_loop(0, stack.shape[0], body, stack)

    return permute_stack(gu), permute_stack(dn)


rel = jnp.asarray(
    np.stack([rng.permutation(EP) for _ in range(L)]).astype(np.int32)
)
# warm + compile
gate_up, down = permute(gate_up, down, rel)
np.asarray(down[0, 0, 0, :2])

for iters in (2, 6):
    t0 = time.perf_counter()
    for _ in range(iters):
        gate_up, down = permute(gate_up, down, rel)
    np.asarray(down[0, 0, 0, :2])
    dt = time.perf_counter() - t0
    print(f"iters={iters}: total {dt*1e3:.1f} ms")
    if iters == 2:
        t2 = dt
    else:
        per = (dt - t2) / 4
        print(f"slope: {per*1e3:.1f} ms per rebalance "
              f"({nbytes*2/per/1e9:.0f} GB/s effective r+w)")
print("EPLB rebalance cost probe done")
