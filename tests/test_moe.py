"""MoE routing + grouped expert MLP vs dense oracle; qwen3-moe E2E."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xllm_tpu.ops.moe import moe_mlp_gmm, moe_mlp_ref, route


def test_route_topk_and_renorm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    topv, topi = route(x, w, 2, norm_topk_prob=True)
    assert topi.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(topv.sum(-1)), 1.0, rtol=1e-5)
    # greedy expert is the argmax of the softmax
    probs = jax.nn.softmax(x @ w, axis=-1)
    np.testing.assert_array_equal(
        np.asarray(topi[:, 0]), np.asarray(jnp.argmax(probs, -1))
    )


def test_moe_ref_matches_manual_loop():
    rng = np.random.default_rng(1)
    T, D, E, I, K = 6, 16, 4, 8, 2
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    rw = jnp.asarray(rng.standard_normal((D, E)), jnp.float32)
    gu = jnp.asarray(rng.standard_normal((E, D, 2 * I)) * 0.3, jnp.float32)
    dn = jnp.asarray(rng.standard_normal((E, I, D)) * 0.3, jnp.float32)

    out = moe_mlp_ref(x, rw, gu, dn, K, norm_topk_prob=False)

    topv, topi = route(x, rw, K, False)
    expect = np.zeros((T, D), np.float32)
    for t in range(T):
        for j in range(K):
            e = int(topi[t, j])
            h = np.asarray(x[t]) @ np.asarray(gu[e])
            act = (h[:I] / (1 + np.exp(-h[:I]))) * h[I:]
            expect[t] += float(topv[t, j]) * (act @ np.asarray(dn[e]))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_moe_gmm_matches_ref():
    rng = np.random.default_rng(2)
    T, D, E, I, K = 16, 128, 4, 128, 2
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    rw = jnp.asarray(rng.standard_normal((D, E)), jnp.float32)
    gu = jnp.asarray(rng.standard_normal((E, D, 2 * I)) * 0.1, jnp.float32)
    dn = jnp.asarray(rng.standard_normal((E, I, D)) * 0.1, jnp.float32)

    ref = moe_mlp_ref(x, rw, gu, dn, K, True)
    # own kernel in interpret mode on CPU
    out = moe_mlp_gmm(x, rw, gu, dn, K, True, impl="own", interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )

    # megablox fallback in interpret mode on CPU
    import functools
    import unittest.mock as mock
    from jax.experimental.pallas.ops.tpu.megablox import gmm as real_gmm

    with mock.patch(
        "jax.experimental.pallas.ops.tpu.megablox.gmm",
        functools.partial(real_gmm, interpret=True),
    ):
        out = moe_mlp_gmm(x, rw, gu, dn, K, True, impl="megablox")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_qwen3_moe_engine_e2e():
    from xllm_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig(
            model_type="qwen3_moe",
            dtype="float32",
            vocab_size=128,
            hidden_size=32,
            intermediate_size=0,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=8,
            qk_norm=True,
            max_position_embeddings=64,
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=16,
            norm_topk_prob=True,
        ),
        cache=CacheConfig(block_size=16, num_blocks=16),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2,
            decode_batch_buckets=[2],
            prefill_token_buckets=[16],
            max_model_len=64,
        ),
    )
    eng = LLMEngine(cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    eng.add_request(prompt_token_ids=[3, 5, 7, 9], sampling_params=sp)
    eng.add_request(prompt_token_ids=[2, 4, 6], sampling_params=sp)
    outs = eng.generate_all()
    assert len(outs) == 2
    for o in outs:
        assert len(o.outputs[0].token_ids) == 6
    assert eng.block_manager.num_used_blocks == 0


def test_sigmoid_noaux_tc_routing():
    """deepseek-v3/kimi-k2 routing: sigmoid scores, selection by
    bias-corrected score under group-limited top-k, combine weights from
    unbiased scores (reference kimi_k2.h topk_method noaux_tc). Checked
    against a plain-loop oracle."""
    import numpy as np

    from xllm_tpu.ops.moe import route

    rng = np.random.default_rng(0)
    t, d, e, k = 16, 8, 32, 4
    n_group, topk_group = 4, 2
    x = rng.standard_normal((t, d)).astype(np.float32)
    w = rng.standard_normal((d, e)).astype(np.float32) * 0.3
    bias = rng.standard_normal(e).astype(np.float32) * 0.1

    topv, topi = route(
        x, w, k, True, scoring="sigmoid", bias=bias,
        n_group=n_group, topk_group=topk_group,
    )
    topv, topi = np.asarray(topv), np.asarray(topi)

    logits = x @ w
    scores = 1.0 / (1.0 + np.exp(-logits))
    sel = scores + bias[None, :]
    gsize = e // n_group
    for row in range(t):
        # oracle: group strength = sum of top-2 biased scores
        gs = [
            np.sort(sel[row, g * gsize:(g + 1) * gsize])[-2:].sum()
            for g in range(n_group)
        ]
        keep = set(np.argsort(gs)[-topk_group:])
        allowed = {
            j for j in range(e) if j // gsize in keep
        }
        assert set(topi[row]) <= allowed
        # chosen = top-k biased scores among allowed experts
        want_ids = sorted(
            allowed, key=lambda j: sel[row, j], reverse=True
        )[:k]
        assert set(topi[row]) == set(want_ids)
        # weights: unbiased sigmoid scores of the chosen, renormalized
        want_w = scores[row, topi[row]]
        want_w = want_w / want_w.sum()
        np.testing.assert_allclose(topv[row], want_w, rtol=1e-5)


def test_mla_engine_with_noaux_tc():
    """MLA MoE engine runs greedy with sigmoid routing + router bias
    (kimi-k2 class config) and stays deterministic."""
    from xllm_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig(
            model_type="kimi_k2",
            dtype="float32",
            vocab_size=128,
            hidden_size=64,
            intermediate_size=96,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=4,
            q_lora_rank=0,
            kv_lora_rank=32,
            qk_nope_head_dim=16,
            qk_rope_head_dim=8,
            v_head_dim=16,
            max_position_embeddings=256,
            num_experts=8,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            n_shared_experts=1,
            first_k_dense_replace=1,
            norm_topk_prob=True,
            scoring_func="sigmoid",
            n_group=2,
            topk_group=1,
            routed_scaling_factor=1.5,
        ),
        cache=CacheConfig(num_blocks=32, block_size=8),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2,
            max_tokens_per_chunk_for_prefill=32,
            max_model_len=128,
            decode_batch_buckets=[2],
            prefill_token_buckets=[32],
        ),
    )
    outs = []
    for _ in range(2):
        eng = LLMEngine(cfg)
        eng.add_request(
            prompt_token_ids=[3, 5, 7, 11, 13],
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=8, ignore_eos=True
            ),
            request_id="r",
        )
        outs.append(eng.generate_all()[0].outputs[0].token_ids)
        assert eng.block_manager.num_used_blocks == 0
    assert outs[0] == outs[1] and len(outs[0]) == 8


def test_minimax_m2_engine():
    """MiniMax-M2 class config: GQA + partial rotary (rotary_dim/head_dim)
    + per-layer MoE with sigmoid routing + bias (reference minimax_m2.h)."""
    from xllm_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams
    from xllm_tpu.models.model_args import model_config_from_hf_dict

    mc = model_config_from_hf_dict({
        "architectures": ["MiniMaxM2ForCausalLM"],
        "vocab_size": 128, "hidden_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16, "rotary_dim": 8,
        "intermediate_size": 96, "num_local_experts": 8,
        "num_experts_per_tok": 2, "scoring_func": "sigmoid",
        "norm_topk_prob": True, "rope_theta": 5e6, "use_qk_norm": True,
        "max_position_embeddings": 256,
    })
    assert mc.model_type == "minimax_m2"
    assert mc.partial_rotary_factor == 0.5 and mc.qk_norm
    mc.dtype = "float32"
    mc.moe_intermediate_size = 32

    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_blocks=32, block_size=8),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2,
            max_tokens_per_chunk_for_prefill=32,
            max_model_len=128,
            decode_batch_buckets=[2],
            prefill_token_buckets=[32],
        ),
    )
    eng = LLMEngine(cfg)
    eng.add_request(
        prompt_token_ids=[3, 5, 7, 11],
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=6, ignore_eos=True
        ),
        request_id="m",
    )
    out = eng.generate_all()[0].outputs[0].token_ids
    assert len(out) == 6
    assert eng.block_manager.num_used_blocks == 0


def test_moe_mlp_ep_matches_ref():
    """shard_map expert-parallel MoE == dense oracle on the 8-device CPU
    mesh (each device computes only its local experts, psum combine)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from xllm_tpu.ops.moe import moe_mlp_ep, moe_mlp_ref

    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("tp",))
    rng = np.random.default_rng(0)
    t, d, e, i, k = 12, 16, 8, 32, 2
    x = jnp.asarray(rng.standard_normal((t, d)), jnp.float32)
    rw = jnp.asarray(rng.standard_normal((d, e)) * 0.3, jnp.float32)
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * i)) * 0.1, jnp.float32)
    dn = jnp.asarray(rng.standard_normal((e, i, d)) * 0.1, jnp.float32)

    want = moe_mlp_ref(x, rw, gu, dn, k, True)

    gu_s = jax.device_put(gu, NamedSharding(mesh, P("tp")))
    dn_s = jax.device_put(dn, NamedSharding(mesh, P("tp")))
    got = jax.jit(
        lambda *a: moe_mlp_ep(*a, num_experts_per_tok=k,
                              norm_topk_prob=True, mesh=mesh)
    )(x, rw, gu_s, dn_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # sigmoid/noaux routing composes
    bias = jnp.asarray(rng.standard_normal(e) * 0.1, jnp.float32)
    from xllm_tpu.ops.moe import moe_mlp_ref as _ref
    want2 = _ref(x, rw, gu, dn, k, True, scoring="sigmoid", bias=bias)
    got2 = jax.jit(
        lambda *a: moe_mlp_ep(*a, num_experts_per_tok=k,
                              norm_topk_prob=True, mesh=mesh,
                              scoring="sigmoid", bias=bias)
    )(x, rw, gu_s, dn_s)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-5, atol=2e-5)


def test_moe_mlp_ep_a2a_matches_ref():
    """Ragged all-to-all EP (DeepEP dispatch/combine analog) == dense
    oracle on the 8-device CPU mesh: tokens sharded over `ep`, one
    ragged_all_to_all each way, grouped local compute."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from xllm_tpu.ops.moe import moe_mlp_ep_a2a, moe_mlp_ref

    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("ep",))
    rng = np.random.default_rng(3)
    t, d, e, i, k = 16, 16, 8, 32, 2
    x = jnp.asarray(rng.standard_normal((t, d)), jnp.float32)
    rw = jnp.asarray(rng.standard_normal((d, e)) * 0.3, jnp.float32)
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * i)) * 0.1, jnp.float32)
    dn = jnp.asarray(rng.standard_normal((e, i, d)) * 0.1, jnp.float32)

    want = moe_mlp_ref(x, rw, gu, dn, k, True)

    x_s = jax.device_put(x, NamedSharding(mesh, P("ep")))
    gu_s = jax.device_put(gu, NamedSharding(mesh, P("ep")))
    dn_s = jax.device_put(dn, NamedSharding(mesh, P("ep")))
    got = jax.jit(
        lambda *a: moe_mlp_ep_a2a(*a, num_experts_per_tok=k,
                                  norm_topk_prob=True, mesh=mesh)
    )(x_s, rw, gu_s, dn_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # sigmoid/noaux routing with bias composes
    bias = jnp.asarray(rng.standard_normal(e) * 0.1, jnp.float32)
    want2 = moe_mlp_ref(x, rw, gu, dn, k, True, scoring="sigmoid", bias=bias)
    got2 = jax.jit(
        lambda *a: moe_mlp_ep_a2a(*a, num_experts_per_tok=k,
                                  norm_topk_prob=True, mesh=mesh,
                                  scoring="sigmoid", bias=bias)
    )(x_s, rw, gu_s, dn_s)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-5, atol=2e-5)


def test_gmm_fp8_weights_interpret_parity():
    """own gmm with fp8_e4m3 expert weights (in-kernel upcast) + per-
    (expert, channel) scales == dequantized oracle."""
    import numpy as np

    import jax.numpy as jnp

    from xllm_tpu.ops.pallas.gmm import gmm as own_gmm
    from xllm_tpu.ops.quant import quantize_fp8

    rng = np.random.default_rng(3)
    e, k, n, m = 4, 64, 128, 32
    w = jnp.asarray(rng.standard_normal((e, k, n)) * 0.05, jnp.float32)
    wq, scale = quantize_fp8(w)  # [E, K, N] f8, [E, N] f32
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    sizes = np.array([10, 0, 14, 8], np.int32)
    offs = jnp.asarray(np.concatenate([[0], np.cumsum(sizes)]), jnp.int32)
    eid = np.repeat(np.arange(e), sizes)

    got = np.asarray(
        own_gmm(x, wq, offs, tm=8, tn=64, interpret=True)
    ) * np.asarray(scale)[eid]
    w_deq = np.asarray(wq.astype(jnp.float32)) * np.asarray(scale)[:, None, :]
    want = np.stack([x[r] @ w_deq[eid[r]] for r in range(m)])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_moe_mlp_gmm_fp8_matches_dequant_ref():
    """moe_mlp_gmm with fp8 expert stacks == moe_mlp_ref on dequantized
    weights (scales applied on the f32 GEMM outputs)."""
    import numpy as np

    import jax.numpy as jnp

    from xllm_tpu.ops.moe import moe_mlp_gmm, moe_mlp_ref
    from xllm_tpu.ops.quant import quantize_fp8

    rng = np.random.default_rng(5)
    t, d, i, e, k = 16, 32, 64, 4, 2
    x = jnp.asarray(rng.standard_normal((t, d)) * 0.3, jnp.float32)
    router = jnp.asarray(rng.standard_normal((d, e)) * 0.3, jnp.float32)
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * i)) * 0.05, jnp.float32)
    dn = jnp.asarray(rng.standard_normal((e, i, d)) * 0.05, jnp.float32)
    guq, gus = quantize_fp8(gu)
    dnq, dns = quantize_fp8(dn)
    gu_deq = (guq.astype(jnp.float32) * gus[:, None, :])
    dn_deq = (dnq.astype(jnp.float32) * dns[:, None, :])

    want = np.asarray(moe_mlp_ref(x, router, gu_deq, dn_deq, k, True))
    got = np.asarray(moe_mlp_gmm(
        x, router, guq, dnq, k, True, interpret=True, impl="own",
        gate_up_scale=gus, down_scale=dns,
    ))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_moe_mlp_fp8_experts_on_ep_mesh():
    """fp8 expert stacks through the top-level moe_mlp dispatcher on the
    8-device EP mesh (dequant-up-front path) == dequantized oracle."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from xllm_tpu.ops.moe import moe_mlp, moe_mlp_ref
    from xllm_tpu.ops.quant import quantize_fp8

    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("tp",))
    rng = np.random.default_rng(2)
    t, d, e, i, k = 16, 16, 8, 32, 2
    x = jnp.asarray(rng.standard_normal((t, d)) * 0.3, jnp.float32)
    rw = jnp.asarray(rng.standard_normal((d, e)) * 0.3, jnp.float32)
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * i)) * 0.05, jnp.float32)
    dn = jnp.asarray(rng.standard_normal((e, i, d)) * 0.05, jnp.float32)
    guq, gus = quantize_fp8(gu)
    dnq, dns = quantize_fp8(dn)
    gu_deq = guq.astype(jnp.float32) * gus[:, None, :]
    dn_deq = dnq.astype(jnp.float32) * dns[:, None, :]
    want = moe_mlp_ref(x, rw, gu_deq, dn_deq, k, True)

    gu_s = jax.device_put(guq, NamedSharding(mesh, P("tp")))
    dn_s = jax.device_put(dnq, NamedSharding(mesh, P("tp")))
    with mesh:
        got = jax.jit(
            lambda xx, rr, g, dd, gs, ds: moe_mlp(
                xx, rr, g, dd, k, True, mesh=mesh,
                gate_up_scale=gs, down_scale=ds,
            )
        )(x, rw, gu_s, dn_s, gus, dns)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4
    )
