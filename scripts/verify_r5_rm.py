"""r5 verify drive: row-major tail pages (kv_layout=interleaved_rm).

1. On-chip numeric check of the v12 decode kernel against the logical
   K/V oracle (token-major tail content built host-side), covering
   page-completion and fresh-page boundaries.
2. Engine drive: interleaved_rm generation end-to-end on the chip —
   chunked prefill, decode across page completions — tokens matching
   the split-layout engine (bf16 near-ties tolerated), no block leaks.
"""

import numpy as np
import jax
import jax.numpy as jnp

from xllm_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.ops.pallas.decode_attention import (
    paged_decode_attention_write_v12_tpu,
)

assert jax.default_backend() == "tpu", jax.default_backend()

rng = np.random.default_rng(0)
HKV, G, D, BS, NL, NB = 8, 2, 128, 64, 2, 40
HQ, TWO_H = HKV * G, 2 * HKV

seq_lens = np.array([70, 1, 64, 65, 128, 129, 192, 30], np.int32)
B = len(seq_lens)
bt = np.zeros((B, 5), np.int32)
nxt = 1
for i in range(B):
    for j in range(max(-(-seq_lens[i] // BS), 1)):
        bt[i, j] = nxt
        nxt += 1
pool = rng.standard_normal((NL, NB, 2, HKV, BS, D)).astype(np.float32) * 0.1
k_log, v_log = {}, {}
for i, sl in enumerate(seq_lens):
    nc = sl - 1
    if nc < 0:
        continue
    k = rng.standard_normal((nc, HKV, D)).astype(np.float32)
    v = rng.standard_normal((nc, HKV, D)).astype(np.float32)
    k_log[i], v_log[i] = k, v
    nfull = nc // BS
    for pg in range(nfull):
        blk = bt[i, pg]
        pool[1, blk, 0] = k[pg * BS:(pg + 1) * BS].transpose(1, 0, 2)
        pool[1, blk, 1] = v[pg * BS:(pg + 1) * BS].transpose(1, 0, 2)
    nwin = nc - nfull * BS
    if nwin > 0:
        blk = bt[i, nfull]
        cont = pool[1, blk].reshape(BS, TWO_H, D).copy()
        cont[:nwin, :HKV] = k[nfull * BS:]
        cont[:nwin, HKV:] = v[nfull * BS:]
        pool[1, blk] = cont.reshape(2, HKV, BS, D)
slots = np.array(
    [bt[i, (s - 1) // BS] * BS + (s - 1) % BS if s > 0 else 0
     for i, s in enumerate(seq_lens)], np.int32)
q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.bfloat16)
kn = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
vn = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
li = jnp.asarray(1, jnp.int32)
out, kv2 = paged_decode_attention_write_v12_tpu(
    q, kn, vn, jnp.asarray(pool, jnp.bfloat16), li, jnp.asarray(slots),
    jnp.asarray(bt), jnp.asarray(seq_lens), scale=D ** -0.5, tile=4)
out = np.asarray(out, dtype=np.float32)
kv2 = np.asarray(kv2, dtype=np.float32)
for i in range(B):
    sl = int(seq_lens[i])
    if sl == 0:
        continue
    k_all = np.concatenate(
        [k_log.get(i, np.zeros((0, HKV, D), np.float32)),
         np.asarray(kn[i], np.float32)[None]], 0)
    v_all = np.concatenate(
        [v_log.get(i, np.zeros((0, HKV, D), np.float32)),
         np.asarray(vn[i], np.float32)[None]], 0)
    qg = np.asarray(q[i], np.float32).reshape(HKV, G, D)
    sc = np.einsum("hgd,shd->hgs", qg, k_all) * D ** -0.5
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    o_ref = np.einsum("hgs,shd->hgd", p, v_all).reshape(HQ, D)
    dd = np.abs(out[i] - o_ref).max()
    assert dd < 2e-2, (i, dd)
    nc = sl - 1
    wblk, w = bt[i, nc // BS], nc % BS
    bf = lambda a: np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)
    if w == BS - 1:
        # the pool stored bf16-rounded values; the canonicalized page is
        # a bit-exact shuffle of them
        exp_k = np.concatenate(
            [bf(k_log[i][(nc // BS) * BS:]),
             np.asarray(kn[i], np.float32)[None]], 0)
        np.testing.assert_array_equal(kv2[1, wblk, 0],
                                      exp_k.transpose(1, 0, 2))
    else:
        cont = kv2[1, wblk].reshape(BS, TWO_H, D)
        np.testing.assert_array_equal(
            cont[w, :HKV], np.asarray(kn[i], np.float32))
print("v12 on-chip numerics OK (tails, completion, fresh pages)")


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
for layout in ("interleaved_rm", "split"):
    eng = LLMEngine(make(layout))
    assert eng.runner.k_cache.ndim == (6 if layout != "split" else 5)
    if layout == "interleaved_rm":
        assert eng.runner.model.kv_layout == "interleaved_rm"
    sp = SamplingParams(temperature=0.0, max_tokens=80, ignore_eos=True)
    for i, p in enumerate(prompts):
        eng.add_request(prompt_token_ids=list(p), sampling_params=sp,
                        request_id=f"r{i}")
    outs = eng.generate_all(timeout_s=900)
    toks[layout] = {o.request_id: o.outputs[0].token_ids for o in outs}
    assert all(len(t) == 80 for t in toks[layout].values())
    assert eng.scheduler.block_manager.num_used_blocks == 0, "block leak"
    print(f"{layout}: 8 requests x 80 tokens, no block leak")

agree = sum(
    a == b
    for r in toks["split"]
    for a, b in zip(toks["split"][r], toks["interleaved_rm"][r])
)
total = sum(len(v) for v in toks["split"].values())
print(f"split vs interleaved_rm token agreement: {agree}/{total}")
assert agree >= total * 0.7, (agree, total)
print("VERIFY r5 rowmajor tails: OK")
