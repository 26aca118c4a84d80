"""r5 end-to-end verify drive: interleaved KV layout on the real chip.

1. On-chip numeric check of the v11 decode kernel + ilv prefill kernels
   against the jnp oracle at small-but-real shapes (catches Mosaic
   miscompiles that interpret mode cannot).
2. Engine drive (verify-skill recipe) with kv_layout=interleaved:
   generation completes, tokens match the split-layout engine run (bf16;
   random weights can flip argmax at near-ties, so allow a small prefix
   mismatch rate), and the block manager leaks nothing.
"""

import numpy as np
import jax
import jax.numpy as jnp

from xllm_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams

assert jax.default_backend() == "tpu", jax.default_backend()

# ---- 1. on-chip kernel numerics ----------------------------------------
from xllm_tpu.ops import attention_ref
from xllm_tpu.ops.pallas.decode_attention import (
    paged_decode_attention_write_v11_tpu,
)

rng = np.random.default_rng(0)
B, HKV, G, D, BS, NL, NB = 8, 8, 2, 128, 64, 2, 40
HQ = HKV * G
seq_lens = np.array([150, 1, 64, 65, 192, 30, 0, 100], np.int32)
npages = -(-seq_lens // BS)
for contig in (True, False):
    bt = np.zeros((B, 4), np.int32)
    if contig:
        nxt = 1
        for i in range(B):
            for j in range(npages[i]):
                bt[i, j] = nxt
                nxt += 1
    else:
        order = [(i, j) for i in range(B) for j in range(npages[i])]
        rng.shuffle(order)
        for blk, (i, j) in enumerate(order, start=1):
            bt[i, j] = blk
    slots = np.array(
        [bt[i, (s - 1) // BS] * BS + (s - 1) % BS if s > 0 else 0
         for i, s in enumerate(seq_lens)], np.int32)
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
    kv = jnp.asarray(
        rng.standard_normal((NL, NB, 2, HKV, BS, D)) * 0.1, jnp.bfloat16)
    li = jnp.asarray(1, jnp.int32)
    out, kv2 = paged_decode_attention_write_v11_tpu(
        q, kn, vn, kv, li, jnp.asarray(slots), jnp.asarray(bt),
        jnp.asarray(seq_lens), scale=D ** -0.5, tile=4)
    k_ref = np.array(kv[:, :, 0], np.float32)
    v_ref = np.array(kv[:, :, 1], np.float32)
    for i in range(B):
        if seq_lens[i] > 0:
            blk, off = slots[i] // BS, slots[i] % BS
            k_ref[1, blk, :, off, :] = np.asarray(kn[i], np.float32)
            v_ref[1, blk, :, off, :] = np.asarray(vn[i], np.float32)
    np.testing.assert_array_equal(
        np.asarray(kv2[:, :, 0], dtype=np.float32), k_ref)
    np.testing.assert_array_equal(
        np.asarray(kv2[:, :, 1], dtype=np.float32), v_ref)
    ref = attention_ref.paged_attention_decode_ref(
        q, jnp.asarray(k_ref, jnp.bfloat16), jnp.asarray(v_ref, jnp.bfloat16),
        li, jnp.asarray(bt), jnp.asarray(seq_lens), D ** -0.5)
    ref = jnp.where(jnp.asarray(seq_lens > 0)[:, None, None], ref, 0.0)
    d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                              - ref.astype(jnp.float32))))
    print(f"v11 on-chip numerics (contig={contig}): max|d| = {d:.2e}")
    assert d < 2e-2, d
print("v11 on-chip kernel numerics OK")

# ---- 2. engine drive ---------------------------------------------------
def make(layout):
    return EngineConfig(
        model=ModelConfig(
            model_type="qwen3", vocab_size=32000, hidden_size=1024,
            intermediate_size=2816, num_hidden_layers=8,
            num_attention_heads=16, num_key_value_heads=8,
            head_dim=128, qk_norm=True, max_position_embeddings=2048),
        cache=CacheConfig(block_size=64, num_blocks=256, kv_layout=layout),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=8, decode_batch_buckets=[8],
            prefill_token_buckets=[128, 512], max_model_len=2048),
    )


prompts = [
    [int(x) for x in np.random.default_rng(i).integers(1, 31999, size=n)]
    for i, n in enumerate((17, 80, 5, 200, 64, 129, 33, 300))
]
toks = {}
for layout in ("interleaved", "split"):
    eng = LLMEngine(make(layout))
    assert eng.runner.k_cache.ndim == (6 if layout == "interleaved" else 5)
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    for i, p in enumerate(prompts):
        eng.add_request(prompt_token_ids=list(p), sampling_params=sp,
                        request_id=f"r{i}")
    outs = eng.generate_all(timeout_s=900)
    toks[layout] = {o.request_id: o.outputs[0].token_ids for o in outs}
    assert all(len(t) == 24 for t in toks[layout].values())
    assert eng.scheduler.block_manager.num_used_blocks == 0, "block leak"
    print(f"{layout}: 8 requests x 24 tokens, no block leak")

agree = sum(
    a == b
    for r in toks["split"]
    for a, b in zip(toks["split"][r], toks["interleaved"][r])
)
total = sum(len(v) for v in toks["split"].values())
print(f"split-vs-interleaved token agreement: {agree}/{total}")
# bf16 + random weights: near-tie argmax flips are expected across any
# two different-kernel reduction orders; require strong agreement only
assert agree >= total * 0.7, (agree, total)
print("VERIFY r5 interleaved: OK")
