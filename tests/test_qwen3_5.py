"""qwen3.5 family: split-projection checkpoint layout + text_config
nesting resolve to the qwen3-next architecture.

Counterpart of the reference's Qwen3_5 registration
(reference xllm/models/llm/qwen3_5.h:31-202 — Qwen3Next arch with a
`model.language_model.` weight prefix, text_config-nested args, and
split in_proj_qkv/in_proj_z/in_proj_b/in_proj_a GDN projections merged
back to the next layout, qwen3_5_gated_delta_net.cpp:64-123).

Test strategy: save a tiny HF Qwen3Next checkpoint, rewrite it into the
qwen3.5 on-disk convention (split projections + nested config + prefix),
and assert both load paths produce identical logits.
"""

import json
import os

import numpy as np
import pytest

VOCAB = 128


def _save_tiny_next(tmp_path):
    torch = pytest.importorskip("torch")
    try:
        from transformers import Qwen3NextConfig
        from transformers.models.qwen3_next.modeling_qwen3_next import (
            Qwen3NextForCausalLM,
        )
    except Exception:
        pytest.skip("transformers lacks qwen3_next")
    cfg = Qwen3NextConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        partial_rotary_factor=0.25,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        full_attention_interval=4,
        linear_conv_kernel_dim=3,
        linear_key_head_dim=8,
        linear_num_key_heads=2,
        linear_value_head_dim=8,
        linear_num_value_heads=4,
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        shared_expert_intermediate_size=48,
        norm_topk_prob=True,
        decoder_sparse_step=1,
        mlp_only_layers=[],
    )
    torch.manual_seed(0)
    model = Qwen3NextForCausalLM(cfg).eval().float()
    path = tmp_path / "next"
    model.save_pretrained(path, safe_serialization=True)
    return cfg, str(path)


def _rewrite_as_qwen3_5(next_path, out_path, hf_cfg):
    """Split the fused GDN projections and nest the config under
    text_config with the model.language_model. prefix."""
    from safetensors.numpy import save_file
    from safetensors import safe_open

    os.makedirs(out_path, exist_ok=True)
    tensors = {}
    with safe_open(
        os.path.join(next_path, "model.safetensors"), framework="np"
    ) as f:
        for name in f.keys():
            tensors[name] = f.get_tensor(name)

    hk = hf_cfg.linear_num_key_heads
    hv = hf_cfg.linear_num_value_heads
    dk = hf_cfg.linear_key_head_dim
    dv = hf_cfg.linear_value_head_dim
    r = hv // hk
    key_dim, value_dim = hk * dk, hv * dv

    out = {}
    for name, arr in tensors.items():
        if name.endswith("linear_attn.in_proj_qkvz.weight"):
            d = arr.shape[1]
            grouped = arr.reshape(hk, 2 * dk + 2 * r * dv, d)
            q = grouped[:, :dk].reshape(key_dim, d)
            k = grouped[:, dk : 2 * dk].reshape(key_dim, d)
            v = grouped[:, 2 * dk : 2 * dk + r * dv].reshape(value_dim, d)
            z = grouped[:, 2 * dk + r * dv :].reshape(value_dim, d)
            base = name[: -len("in_proj_qkvz.weight")]
            pre = "model.language_model." + base[len("model."):]
            out[pre + "in_proj_qkv.weight"] = np.concatenate([q, k, v])
            out[pre + "in_proj_z.weight"] = z
        elif name.endswith("linear_attn.in_proj_ba.weight"):
            d = arr.shape[1]
            grouped = arr.reshape(hk, 2 * r, d)
            base = name[: -len("in_proj_ba.weight")]
            pre = "model.language_model." + base[len("model."):]
            out[pre + "in_proj_b.weight"] = grouped[:, :r].reshape(-1, d)
            out[pre + "in_proj_a.weight"] = grouped[:, r:].reshape(-1, d)
        elif name.startswith("model."):
            out["model.language_model." + name[len("model."):]] = arr
        else:
            out[name] = arr  # lm_head.weight stays at root
    save_file(out, os.path.join(out_path, "model.safetensors"))

    with open(os.path.join(next_path, "config.json")) as f:
        base_cfg = json.load(f)
    nested = {
        "model_type": "qwen3_5",
        "architectures": ["Qwen3_5ForConditionalGeneration"],
        "text_config": dict(base_cfg, model_type="qwen3_5_text"),
    }
    with open(os.path.join(out_path, "config.json"), "w") as f:
        json.dump(nested, f)


def test_qwen3_5_checkpoint_equals_next(tmp_path):
    hf_cfg, next_path = _save_tiny_next(tmp_path)
    q35_path = str(tmp_path / "q35")
    _rewrite_as_qwen3_5(next_path, q35_path, hf_cfg)

    from xllm_tpu.models.loader import load_params
    from xllm_tpu.models.model_args import load_model_config
    from xllm_tpu.models.registry import create_model

    mc_next = load_model_config(next_path)
    mc_35 = load_model_config(q35_path)
    assert mc_35.model_type == "qwen3_5"
    # nested text_config resolved: same architecture hyperparameters
    for f in ("hidden_size", "num_hidden_layers", "linear_num_key_heads",
              "linear_num_value_heads", "full_attention_interval",
              "num_experts"):
        assert getattr(mc_35, f) == getattr(mc_next, f), f
    mc_next.dtype = mc_35.dtype = "float32"

    p_next = load_params(mc_next)
    p_35 = load_params(mc_35)

    import jax

    flat_n, _ = jax.tree_util.tree_flatten_with_path(p_next)
    flat_5, _ = jax.tree_util.tree_flatten_with_path(p_35)
    assert len(flat_n) == len(flat_5)
    for (kn, vn), (k5, v5) in zip(flat_n, flat_5):
        assert kn == k5
        np.testing.assert_array_equal(
            np.asarray(vn), np.asarray(v5), err_msg=str(kn)
        )

    # and the registry resolves qwen3_5 to the same (runnable) model class
    m = create_model(mc_35)
    assert type(m).__name__ == "Qwen3NextModel"
