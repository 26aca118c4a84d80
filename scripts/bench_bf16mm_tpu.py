"""A/B: XLA dot vs Pallas split-DMA bf16 matmul at decode shapes."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from xllm_tpu.ops.pallas.quant_matmul import matmul_bf16_v2

M, K = 128, 2048
SHAPES = [(K, 4096), (2048, 2048), (K, 6144), (6144, 2048)]
L = 28
ITERS = 24

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)


def run(tag, fn, k, n):
    w = jnp.asarray(rng.standard_normal((L, k, n)) * 0.02, jnp.bfloat16)
    xx = jnp.asarray(rng.standard_normal((M, k)), jnp.bfloat16)

    @jax.jit
    def step(w):
        def body(acc, wl):
            return acc + fn(xx, wl)[:, :1], None
        acc, _ = jax.lax.scan(body, jnp.zeros((M, 1), jnp.float32), w)
        return acc
    o = step(w); np.asarray(o)
    n1, n2 = ITERS // 4, ITERS
    t0 = time.perf_counter()
    for _ in range(n1):
        o = step(w)
    np.asarray(o); t1 = time.perf_counter()
    for _ in range(n2):
        o = step(w)
    np.asarray(o); t2 = time.perf_counter()
    ms = ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3
    gb = L * k * n * 2 / 1e9
    print(f"## {tag} [{k}x{n}]: {ms/L*1e3:.0f} us/layer {gb/(ms/1e3):.0f} GB/s",
          flush=True)


xla = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
for k, n in SHAPES:
    run("xla", xla, k, n)
    run("pallas_v2", functools.partial(matmul_bf16_v2), k, n)
