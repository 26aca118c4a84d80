"""MLA latent attention: kernel parity vs oracle + deepseek-v2 engine E2E."""

import jax.numpy as jnp
import numpy as np
import pytest

from xllm_tpu.ops.mla_ref import mla_decode_ref, mla_prefill_ref
from xllm_tpu.ops.pallas.kv_write import (
    latent_write_prefill_tpu,
    latent_write_rmw_tpu,
)
from xllm_tpu.ops.pallas.mla_attention import (
    mla_decode_attention_write_tpu,
    mla_prefill_attention_tpu,
)


def _cache(rng, L, NB, bs, Dk, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal((L, NB, 1, bs, Dk)), dtype)


def test_mla_decode_kernel_matches_ref():
    rng = np.random.default_rng(0)
    L, NB, bs, Dk, dv, H, B, NBmax = 2, 24, 16, 96, 64, 4, 4, 6
    cache = _cache(rng, L, NB, bs, Dk)
    q = jnp.asarray(rng.standard_normal((B, H, Dk)), jnp.float32)
    lat_new = jnp.asarray(rng.standard_normal((B, Dk)), jnp.float32)
    seq_lens_np = [18, 1, 33, 0]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        if sl:
            slots[i] = bt[i, (sl - 1) // bs] * bs + (sl - 1) % bs
    scale = Dk**-0.5
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)

    # oracle: scatter the latent rows, then attend
    cache_ref = cache
    for i, sl in enumerate(seq_lens_np):
        if sl:
            blk, off = bt[i, (sl - 1) // bs], (sl - 1) % bs
            cache_ref = cache_ref.at[1, blk, 0, off].set(lat_new[i])
    ref = mla_decode_ref(
        q, cache_ref, jnp.int32(1), block_tables, seq_lens, scale, dv
    )
    out, cache_out = mla_decode_attention_write_tpu(
        q, lat_new, cache, jnp.int32(1), jnp.asarray(slots), block_tables,
        seq_lens, scale, dv, interpret=True,
    )
    valid = [i for i, sl in enumerate(seq_lens_np) if sl]
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(cache_out[1]), np.asarray(cache_ref[1]), rtol=1e-6
    )


@pytest.mark.parametrize("q_offset_v,kv_len_v,s", [(0, 48, 48), (32, 64, 32)])
def test_mla_prefill_kernel_matches_ref(q_offset_v, kv_len_v, s):
    rng = np.random.default_rng(1)
    L, NB, bs, Dk, dv, H, NBmax = 2, 16, 16, 96, 64, 4, 8
    cache = _cache(rng, L, NB, bs, Dk)
    q = jnp.asarray(rng.standard_normal((s, H, Dk)), jnp.float32)
    block_table = jnp.asarray(list(range(1, NBmax + 1)), jnp.int32)
    scale = Dk**-0.5
    ref = mla_prefill_ref(
        q, cache, jnp.int32(0), block_table, jnp.int32(q_offset_v),
        jnp.int32(kv_len_v), scale, dv,
    )
    out = mla_prefill_attention_tpu(
        q, cache, jnp.int32(0), block_table, jnp.int32(q_offset_v),
        jnp.int32(kv_len_v), scale, dv, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("writer,off,n", [("pages", 0, 40), ("rmw", 13, 5)])
def test_latent_writers(writer, off, n):
    rng = np.random.default_rng(2)
    L, NB, bs, Dk, NBmax = 2, 12, 16, 96, 6
    cache = _cache(rng, L, NB, bs, Dk)
    block_table = jnp.asarray(list(range(1, NBmax + 1)), jnp.int32)
    s_pad = 48 if writer == "pages" else n
    lt = jnp.asarray(rng.standard_normal((s_pad, Dk)), jnp.float32)
    fn = latent_write_prefill_tpu if writer == "pages" else latent_write_rmw_tpu
    out = fn(
        lt, cache, jnp.int32(0), block_table, jnp.int32(off), jnp.int32(n),
        interpret=True,
    )
    for r in range(n):
        pos = off + r
        blk = int(block_table[pos // bs])
        np.testing.assert_allclose(
            np.asarray(out[0, blk, 0, pos % bs]), np.asarray(lt[r]),
            rtol=1e-6, err_msg=f"row {r}",
        )
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(cache[1]))


def _ds_config(**kw):
    from xllm_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig

    return EngineConfig(
        model=ModelConfig(
            model_type="deepseek_v2",
            dtype="float32",
            vocab_size=96,
            hidden_size=48,
            intermediate_size=64,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=4,
            head_dim=16,
            max_position_embeddings=128,
            q_lora_rank=24,
            kv_lora_rank=32,
            qk_nope_head_dim=16,
            qk_rope_head_dim=8,
            v_head_dim=16,
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=16,
            norm_topk_prob=True,
            first_k_dense_replace=1,
            n_shared_experts=1,
            routed_scaling_factor=1.0,
            **kw,
        ),
        cache=CacheConfig(block_size=16, num_blocks=24),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2,
            decode_batch_buckets=[2],
            prefill_token_buckets=[16, 32],
            max_model_len=128,
        ),
    )


def test_deepseek_v2_engine_e2e():
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    eng = LLMEngine(_ds_config())
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    eng.add_request(prompt_token_ids=[3, 5, 7, 9, 11, 13], sampling_params=sp)
    eng.add_request(prompt_token_ids=list(range(1, 25)), sampling_params=sp)
    outs = eng.generate_all()
    assert len(outs) == 2
    for o in outs:
        assert len(o.outputs[0].token_ids) == 6
    assert eng.block_manager.num_used_blocks == 0


def test_deepseek_chunked_equals_single_shot():
    """Chunked prefill through the MLA path == one-shot prefill."""
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    prompt = list(range(1, 50))
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    outs = []
    for chunk in (16, 64):
        cfg = _ds_config()
        cfg.scheduler.max_tokens_per_chunk_for_prefill = chunk
        cfg.scheduler.prefill_token_buckets = [16, 32, 64]
        eng = LLMEngine(cfg)
        eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
        outs.append(eng.generate_all()[0].outputs[0].token_ids)
    assert outs[0] == outs[1]


def test_mla_batched_prefill_kernel_matches_ref():
    """Interpret-mode: batched latent prefill kernel + writers == vmap'd
    oracle (the dense batched kernels' MLA twin)."""
    import jax
    import jax.numpy as jnp

    from xllm_tpu.ops import mla_ref
    from xllm_tpu.ops.mla import _write_latent_scatter
    from xllm_tpu.ops.pallas.kv_write import (
        latent_write_prefill_batched_tpu,
        latent_write_rmw_batched_tpu,
    )
    from xllm_tpu.ops.pallas.mla_attention import (
        mla_prefill_attention_batched_tpu,
    )

    rng = np.random.default_rng(7)
    L, NB, bs, Dk, DV, H = 2, 32, 16, 64, 48, 4
    s = 32
    specs = [(0, 32), (16, 48), (0, 9), (0, 0)]  # incl. padded row
    p = len(specs)
    cache = jnp.asarray(rng.standard_normal((L, NB, 1, bs, Dk)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((p, s, H, Dk)), jnp.float32)
    lat = jnp.asarray(rng.standard_normal((p, s, Dk)), jnp.float32)
    bt = np.zeros((p, 8), np.int32)
    nxt = 1
    for i, (qo, kl) in enumerate(specs):
        for j in range((max(kl, 1) + bs - 1) // bs):
            bt[i, j] = nxt
            nxt += 1
    q_offsets = jnp.asarray([qo for qo, _ in specs], jnp.int32)
    kv_lens = jnp.asarray([kl for _, kl in specs], jnp.int32)
    ntoks = kv_lens - q_offsets
    layer_idx = jnp.int32(1)
    scale = Dk**-0.5

    # oracle: scatter writes + per-row ref
    slots = np.zeros((p, s), np.int32)
    for i, (qo, kl) in enumerate(specs):
        for j in range(kl - qo):
            pos = qo + j
            slots[i, j] = bt[i, pos // bs] * bs + pos % bs
    valid_rows = [(i, kl - qo) for i, (qo, kl) in enumerate(specs) if kl > 0]
    c_ref = cache
    for i, n in valid_rows:
        c_ref = _write_latent_scatter(
            c_ref, layer_idx, lat[i, :n], jnp.asarray(slots[i, :n])
        )

    c_out = latent_write_prefill_batched_tpu(
        lat, cache, layer_idx, jnp.asarray(bt), q_offsets, ntoks,
        interpret=True,
    )
    for i, n in valid_rows:
        qo = specs[i][0]
        for j in range(n):
            pos = qo + j
            blk, off = int(bt[i, pos // bs]), pos % bs
            np.testing.assert_allclose(
                np.asarray(c_out[1, blk, 0, off]),
                np.asarray(c_ref[1, blk, 0, off]),
                rtol=1e-6, err_msg=f"row {i} tok {j}",
            )

    out = mla_prefill_attention_batched_tpu(
        q, c_ref, layer_idx, jnp.asarray(bt), q_offsets, kv_lens, scale,
        DV, interpret=True,
    )
    for i, (qo, kl) in enumerate(specs):
        if kl == 0:
            continue
        ref = mla_ref.mla_prefill_ref(
            q[i], c_ref, layer_idx, jnp.asarray(bt[i]), jnp.int32(qo),
            jnp.int32(kl), scale, DV,
        )
        valid = min(s, kl - qo)
        np.testing.assert_allclose(
            np.asarray(out[i])[:valid], np.asarray(ref)[:valid],
            rtol=2e-5, atol=2e-5, err_msg=f"row {i}",
        )

    # RMW batched writer on small chunks
    s2 = 5
    lat2 = jnp.asarray(rng.standard_normal((p, s2, Dk)), jnp.float32)
    specs2 = [(13, 18), (3, 8), (30, 33), (0, 0)]
    bt2 = np.zeros((p, 8), np.int32)
    nxt = 1
    for i, (qo, kl) in enumerate(specs2):
        for j in range((max(kl, 1) + bs - 1) // bs):
            bt2[i, j] = nxt
            nxt += 1
    qo2 = jnp.asarray([a for a, _ in specs2], jnp.int32)
    kl2 = jnp.asarray([b for _, b in specs2], jnp.int32)
    c_ref2 = cache
    for i, (a, b) in enumerate(specs2):
        n = b - a
        if n <= 0:
            continue
        sl = np.asarray(
            [int(bt2[i, (a + j) // bs]) * bs + (a + j) % bs for j in range(n)],
            np.int32,
        )
        c_ref2 = _write_latent_scatter(
            c_ref2, layer_idx, lat2[i, :n], jnp.asarray(sl)
        )
    c_out2 = latent_write_rmw_batched_tpu(
        lat2, cache, layer_idx, jnp.asarray(bt2), qo2, kl2 - qo2,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(c_out2), np.asarray(c_ref2), rtol=1e-6
    )


def test_mla_decode_kernel_fp8_latent_matches_dequant_ref():
    """Regression: fp8 latent pages were fed straight into the MXU dots
    and softmax probs were quantized to fp8 before the PV matmul; the
    _mxu upcast keeps the kernel numerically equivalent to attending the
    dequantized cache (up to fp8 storage error, which the ref shares)."""
    rng = np.random.default_rng(9)
    L, NB, bs, Dk, dv, H, B, NBmax = 2, 24, 16, 128, 128, 4, 3, 6
    cache = _cache(rng, L, NB, bs, Dk, jnp.float8_e4m3fn)
    q = jnp.asarray(rng.standard_normal((B, H, Dk)), jnp.bfloat16)
    lat_new = jnp.asarray(rng.standard_normal((B, Dk)), jnp.bfloat16)
    seq_lens_np = [18, 1, 33]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        slots[i] = bt[i, (sl - 1) // bs] * bs + (sl - 1) % bs
    scale = Dk**-0.5
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)

    # oracle attends the bf16-dequantized cache with the fp8-rounded
    # latent rows scattered in
    cache_ref = cache
    for i, sl in enumerate(seq_lens_np):
        blk, off = bt[i, (sl - 1) // bs], (sl - 1) % bs
        cache_ref = cache_ref.at[1, blk, 0, off].set(
            lat_new[i].astype(jnp.float8_e4m3fn)
        )
    ref = mla_decode_ref(
        q.astype(jnp.float32),
        cache_ref.astype(jnp.float32),
        jnp.int32(1), block_tables, seq_lens, scale, dv,
    )
    out, cache_out = mla_decode_attention_write_tpu(
        q, lat_new, cache, jnp.int32(1), jnp.asarray(slots), block_tables,
        seq_lens, scale, dv, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )
    assert cache_out.dtype == jnp.float8_e4m3fn
