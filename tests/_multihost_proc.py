"""Worker script for the REAL 2-process multihost test.

Launched by tests/test_multihost_2proc.py as `python _multihost_proc.py
<coordinator_port> <num_procs> <proc_id>`. Process 0 drives a real
LLMEngine through prefill + decode over a (tp=8) mesh spanning both
processes (4 virtual CPU devices each) and prints the generated tokens
as one JSON line; process 1 runs FollowerEngine.run() mirroring every
jit dispatch (reference multi-node worker loop, dist_manager.cpp:145,
collective_service.cpp:43).

Importable without side effects (the parity test reuses make_config /
workload for the single-process reference run).
"""

import json


def make_model_config():
    from xllm_tpu.config import ModelConfig

    return ModelConfig(
        model_type="qwen3",
        vocab_size=512,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        head_dim=32,
        qk_norm=True,
        tie_word_embeddings=True,
        dtype="float32",
        max_position_embeddings=256,
    )


def make_config(tp: int, dp: int = 1, cp: int = 1):
    from xllm_tpu.config import (
        CacheConfig,
        EngineConfig,
        ParallelConfig,
        SchedulerConfig,
    )

    return EngineConfig(
        model=make_model_config(),
        cache=CacheConfig(
            block_size=16, num_blocks=64, enable_prefix_cache=False
        ),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=4,
            max_tokens_per_batch=256,
            max_tokens_per_chunk_for_prefill=64,
            max_model_len=128,
            decode_batch_buckets=[4 * dp],
            prefill_token_buckets=[64],
            prefill_row_buckets=[1, 4],
        ),
        parallel=ParallelConfig(tp_size=tp, dp_size=dp, cp_size=cp),
    )


def workload():
    import numpy as np

    rng = np.random.default_rng(42)
    return [rng.integers(1, 500, size=24).tolist() for _ in range(3)]


def main(port: str, nproc: int, pid: int, dp: int = 1, cp: int = 1) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from xllm_tpu.parallel.multihost import FollowerEngine, init_distributed

    init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.device_count() == 4 * nproc, jax.devices()

    cfg = make_config(tp=4 * nproc // dp // cp, dp=dp, cp=cp)
    if pid == 0:
        from xllm_tpu.engine import LLMEngine
        from xllm_tpu.framework.sampling_params import SamplingParams

        engine = LLMEngine(config=cfg, tokenizer=None)
        sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
        for i, ids in enumerate(workload()):
            engine.add_request(prompt_token_ids=ids, sampling_params=sp,
                               request_id=f"r{i}")
        outs = engine.generate_all(timeout_s=600)
        engine.runner.broadcaster.announce_stop()
        print(json.dumps({
            ro.request_id: list(ro.outputs[0].token_ids) for ro in outs
        }), flush=True)
    else:
        from xllm_tpu.runtime.model_runner import ModelRunner

        runner = ModelRunner(cfg)
        runner.load_model()
        runner.initialize_kv_cache()
        FollowerEngine(runner).run()


if __name__ == "__main__":
    import os
    import sys

    _port, _nproc, _pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    _dp = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    _cp = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4 "
        + os.environ.get("XLA_FLAGS", "")
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    main(_port, _nproc, _pid, _dp, _cp)
