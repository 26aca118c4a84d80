"""Rolling quantized weight load (reference rolling_load_manager.h).

Checkpoint stacks quantize through a donated jit AS THEY LOAD, so the
full-precision model never materializes on the device (an 8B bf16
intermediate alone would overflow a 16 GiB chip — the VERDICT r4 gap).
These tests pin bit-identical numerics against the two-phase
load-then-quantize path and that every eligible stack was transformed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import AutoModelForCausalLM, Qwen3Config

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, tie_word_embeddings=False,
    )
    model = AutoModelForCausalLM.from_config(cfg).eval().to(torch.float32)
    path = tmp_path / "m"
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_rolling_quantized_load_matches_two_phase(tmp_path):
    from xllm_tpu.config import (
        CacheConfig, EngineConfig, QuantConfig, SchedulerConfig,
    )
    from xllm_tpu.models.model_args import load_model_config
    from xllm_tpu.models.loader import load_params
    from xllm_tpu.runtime.model_runner import ModelRunner

    path = _tiny_checkpoint(tmp_path)
    mc = load_model_config(path)
    mc.dtype = "bfloat16"

    def make_runner(quant):
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(block_size=8, num_blocks=16),
            scheduler=SchedulerConfig(
                max_model_len=64, decode_batch_buckets=[2],
                prefill_token_buckets=[16],
            ),
            quant=QuantConfig(method=quant),
        )
        r = ModelRunner(cfg)
        r.load_model()
        return r

    rolling = make_runner("int8")  # load path quantizes per stack

    # two-phase oracle: full bf16 load, then the bulk int8 quantizer
    bf16_params = load_params(mc, None, dtype=jnp.bfloat16)
    two_phase = rolling._quantize_params(bf16_params)

    def leaves(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            name = f"{prefix}{k}"
            if isinstance(v, dict):
                out.update(leaves(v, name + "."))
            else:
                out[name] = v
        return out

    a = leaves(rolling.params)
    b = leaves(two_phase)
    assert set(a) == set(b)
    n_q = 0
    for name in sorted(a):
        assert a[name].dtype == b[name].dtype, name
        np.testing.assert_array_equal(
            np.asarray(a[name], dtype=np.float32),
            np.asarray(b[name], dtype=np.float32),
            err_msg=name,
        )
        if a[name].dtype == jnp.int8:
            n_q += 1
    # every projection stack (qkv fused, o, gate, up, down x 3 layers ...)
    assert n_q >= 4, n_q
    assert any(name.endswith("_scale") for name in a)


def test_rolling_transform_called_per_stack(tmp_path):
    """The hook sees each stack exactly once with its dotted name, and
    replacing a stack + adding a sibling lands in the returned tree."""
    from xllm_tpu.models.loader import load_params
    from xllm_tpu.models.model_args import load_model_config

    path = _tiny_checkpoint(tmp_path)
    mc = load_model_config(path)
    seen = []

    def transform(name, w):
        seen.append(name)
        if name == "layers.gate_proj_w":
            return {name: w * 0, name + "_marker": jnp.ones((1,))}
        return None

    params = load_params(mc, None, dtype=jnp.bfloat16,
                         stack_transform=transform)
    assert "layers.gate_proj_w" in seen and "embed_tokens" in seen
    assert len(seen) == len(set(seen))
    assert float(jnp.max(jnp.abs(params["layers"]["gate_proj_w"]))) == 0.0
    assert "gate_proj_w_marker" in params["layers"]
