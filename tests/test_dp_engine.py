"""Attention-DP production path: engine on a (data, tp) mesh.

VERDICT r1 item 2: the thing the dryrun proves multichip-correct must be
the thing the server runs. These tests drive the REAL LLMEngine with
dp_size > 1 — per-DP-rank block pools, rank-major sharded batches — and
assert greedy token parity with the single-device engine.
"""

import numpy as np
import pytest

from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.block_manager import BlockManagerPool
from xllm_tpu.framework.sampling_params import SamplingParams


def _cfg(dp=1, tp=1):
    return EngineConfig(
        model=ModelConfig(
            model_type="qwen3",
            dtype="float32",  # CPU XLA lacks bf16 dots
            vocab_size=512,
            hidden_size=128,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=8,
            num_key_value_heads=4,
            head_dim=16,
            qk_norm=True,
            max_position_embeddings=256,
        ),
        cache=CacheConfig(num_blocks=32 * dp, block_size=16),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=8,
            max_tokens_per_batch=512,
            decode_batch_buckets=[4 * dp],
            prefill_token_buckets=[64],
            prefill_row_buckets=[1, 4],
            max_model_len=256,
        ),
        parallel=ParallelConfig(dp_size=dp, tp_size=tp),
    )


def _run(cfg, prompts, max_tokens=10):
    eng = LLMEngine(cfg)
    for i, ids in enumerate(prompts):
        eng.add_request(
            prompt_token_ids=ids,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=max_tokens, ignore_eos=True
            ),
            request_id=f"r{i:03d}",
        )
    outs = {o.request_id: o for o in eng.generate_all(timeout_s=300)}
    toks = [outs[rid].outputs[0].token_ids for rid in sorted(outs)]
    return eng, toks


def test_dp_engine_matches_single_device():
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 500, size=n).tolist() for n in (30, 9, 55, 21)]
    # same init seed -> identical weights on both meshes
    _, single = _run(_cfg(dp=1, tp=1), prompts)
    eng, sharded = _run(_cfg(dp=2, tp=2), prompts)
    assert isinstance(eng.block_manager, BlockManagerPool)
    assert sharded == single
    assert eng.block_manager.num_used_blocks == 0


def test_dp_pool_rank_isolation():
    pool = BlockManagerPool(
        num_blocks=32, block_size=16, dp_size=2, enable_prefix_cache=True
    )

    class Seq:
        seq_id = 1
        dp_rank = -1
        block_ids: list = []
        num_tokens = 40
        num_computed_tokens = 0
        num_cached_tokens = 0
        token_ids = list(range(40))
        num_fixed_tokens = 40

        def reset_kv(self):
            self.block_ids = []
            self.num_computed_tokens = 0
            self.num_cached_tokens = 0

    a, b = Seq(), Seq()
    b.seq_id = 2
    a.block_ids, b.block_ids = [], []
    assert pool.allocate(a, 40)
    assert a.dp_rank >= 0
    assert pool.allocate(b, 40)
    # least-loaded assignment puts b on the other rank
    assert b.dp_rank != a.dp_rank
    per = pool.blocks_per_rank
    for blk in a.block_ids:
        assert a.dp_rank * per <= blk < (a.dp_rank + 1) * per
    for blk in b.block_ids:
        assert b.dp_rank * per <= blk < (b.dp_rank + 1) * per
    # null block of each rank is its range's first id
    assert pool.null_block_of(0) == 0
    assert pool.null_block_of(1) == per
    pool.free(a)
    pool.free(b)
    assert pool.num_used_blocks == 0


def test_dp_engine_mixed_sampling_and_preemption():
    rng = np.random.default_rng(5)
    cfg = _cfg(dp=2, tp=1)
    cfg.cache.num_blocks = 16  # tight: forces preemption under decode
    cfg.cache.enable_prefix_cache = False
    eng = LLMEngine(cfg)
    for i in range(4):
        eng.add_request(
            prompt_token_ids=rng.integers(1, 500, size=40).tolist(),
            sampling_params=SamplingParams(
                temperature=0.0 if i % 2 else 0.7,
                max_tokens=30,
                ignore_eos=True,
            ),
        )
    outs = eng.generate_all(timeout_s=300)
    assert len(outs) == 4
    assert all(len(o.outputs[0].token_ids) == 30 for o in outs)
    assert eng.block_manager.num_used_blocks == 0


def test_moe_ep_a2a_engine_matches_single_device():
    """qwen3-moe on a tp=4 mesh routes through the ragged-a2a EP path
    (moe_mlp receives the mesh; E=8 divides tp) and must produce the
    same greedy tokens as the single-device engine."""
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 500, size=n).tolist() for n in (24, 11, 40)]

    def cfg(tp):
        c = _cfg(dp=1, tp=tp)
        c.model.model_type = "qwen3_moe"
        c.model.intermediate_size = 0
        c.model.num_experts = 8
        c.model.num_experts_per_tok = 2
        c.model.moe_intermediate_size = 64
        c.model.norm_topk_prob = True
        return c

    _, single = _run(cfg(1), prompts)
    eng, sharded = _run(cfg(4), prompts)
    assert sharded == single
    assert eng.block_manager.num_used_blocks == 0
