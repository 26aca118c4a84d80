"""Small-scale v3 decode kernel compile+run on the real chip."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from xllm_tpu.ops.pallas.legacy.decode_attention import (
    paged_decode_attention_write_v3_tpu,
)


def main():
    for attempt in range(8):
        try:
            np.asarray(jax.jit(lambda: jnp.ones(8) * 2)())
            break
        except Exception as e:
            print(f"probe fail {attempt}: {type(e).__name__}", flush=True)
            time.sleep(60)

    L, NB, HKV, BS, D, B, NBT = 2, 64, 8, 64, 128, 8, 4
    rng = np.random.default_rng(0)
    k_all = jnp.asarray(rng.standard_normal((L, NB, HKV, BS, D)), jnp.bfloat16)
    v_all = jnp.asarray(rng.standard_normal((L, NB, HKV, BS, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, 16, D)), jnp.bfloat16)
    knew = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
    vnew = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
    seq_lens = np.asarray([130, 1, 65, 200, 64, 0, 0, 0], np.int32)
    bt = np.zeros((B, NBT), np.int32)
    nxt = 1
    for i, sl in enumerate(seq_lens):
        for j in range((sl + BS - 1) // BS):
            bt[i, j] = nxt
            nxt += 1
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens):
        if sl:
            slots[i] = bt[i, (sl - 1) // BS] * BS + (sl - 1) % BS

    out, k_out, v_out = paged_decode_attention_write_v3_tpu(
        q, knew, vnew, k_all, v_all, jnp.int32(1), jnp.asarray(slots),
        jnp.asarray(bt), jnp.asarray(seq_lens), D**-0.5,
    )
    out_np = np.asarray(out)
    print("v3 ran:", out_np.shape, "finite:", np.isfinite(out_np[:5]).all(),
          flush=True)

    # oracle comparison on-chip
    from xllm_tpu.ops.attention_ref import paged_attention_decode_ref
    from xllm_tpu.ops.kv_cache_ops import write_kv

    valid = [i for i, sl in enumerate(seq_lens) if sl > 0]
    k_ref, v_ref = write_kv(
        k_all, v_all, jnp.int32(1),
        knew[jnp.asarray(valid)], vnew[jnp.asarray(valid)],
        jnp.asarray(slots)[jnp.asarray(valid)],
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, jnp.int32(1), jnp.asarray(bt),
        jnp.asarray(seq_lens), D**-0.5,
    )
    err = np.abs(
        np.asarray(out, np.float32)[valid] - np.asarray(ref, np.float32)[valid]
    ).max()
    print(f"max err vs oracle: {err:.4f}", flush=True)
    # cache write check
    for i in valid:
        pos = int(seq_lens[i]) - 1
        blk, off = bt[i, pos // BS], pos % BS
        werr = np.abs(
            np.asarray(k_out[1, blk, :, off, :], np.float32)
            - np.asarray(knew[i], np.float32)
        ).max()
        assert werr == 0.0, (i, werr)
    print("cache writes OK", flush=True)


if __name__ == "__main__":
    main()
