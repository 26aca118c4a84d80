"""C API: a real C host embeds the runtime via libxllm_c.so
(reference xllm/c_api/llm.h + c_api/test) — compile tests/c_api_driver.c,
run it against a tiny word-level tokenizer + random-weight model."""

import json
import os
import subprocess

import pytest


def _make_model_dir(tmp_path) -> str:
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {f"w{i}": i for i in range(200)}
    vocab["<unk>"] = 200
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    d = str(tmp_path)
    tok.save(os.path.join(d, "tokenizer.json"))
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"eos_token": "w0"}, f)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(
            {
                "architectures": ["Qwen3ForCausalLM"],
                "model_type": "qwen3",
                "vocab_size": 256,
                "hidden_size": 64,
                "intermediate_size": 128,
                "num_hidden_layers": 2,
                "num_attention_heads": 4,
                "num_key_value_heads": 2,
                "head_dim": 16,
                "max_position_embeddings": 128,
                "rope_theta": 10000.0,
                "torch_dtype": "float32",
            },
            f,
        )
    return d


def test_c_host_drives_engine(tmp_path):
    from xllm_tpu.native import build_c_api

    lib = build_c_api()
    inc = os.path.join(os.path.dirname(os.path.dirname(lib)), "include")
    model_dir = _make_model_dir(tmp_path)
    exe = os.path.join(str(tmp_path), "c_api_driver")
    src = os.path.join(os.path.dirname(__file__), "c_api_driver.c")
    try:
        subprocess.run(
            ["gcc", "-O1", src, f"-I{inc}", "-o", exe, lib,
             f"-Wl,-rpath,{os.path.dirname(lib)}"],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"no C toolchain: {e}")

    extra = json.dumps(
        {
            "engine": {"load_format": "dummy"},
            "model": {"dtype": "float32"},
            "scheduler": {
                "decode_batch_buckets": [4],
                "prefill_token_buckets": [32],
                "max_model_len": 128,
            },
        }
    )
    env = dict(
        os.environ,
        XLLM_TPU_ROOT=os.path.dirname(os.path.dirname(__file__)),
        XLLM_C_PLATFORM="cpu",
    )
    proc = subprocess.run(
        [exe, model_dir, extra], env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "C_API_OK" in proc.stdout, proc.stdout


def test_cc_host_drives_engine(tmp_path):
    """C++ host through the header-only RAII wrapper (xllm_cc.h —
    reference cc_api/llm.h:32): Initialize + Completions +
    ChatCompletions + move semantics over libxllm_c.so."""
    from xllm_tpu.native import build_c_api

    lib = build_c_api()
    inc = os.path.join(os.path.dirname(os.path.dirname(lib)), "include")
    model_dir = _make_model_dir(tmp_path)
    exe = os.path.join(str(tmp_path), "cc_api_driver")
    src = os.path.join(os.path.dirname(__file__), "cc_api_driver.cpp")
    try:
        subprocess.run(
            ["g++", "-std=c++17", "-O1", src, f"-I{inc}", "-o", exe, lib,
             f"-Wl,-rpath,{os.path.dirname(lib)}"],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"no C++ toolchain: {e}")

    extra = json.dumps(
        {
            "engine": {"load_format": "dummy"},
            "model": {"dtype": "float32"},
            "scheduler": {
                "decode_batch_buckets": [4],
                "prefill_token_buckets": [32],
                "max_model_len": 128,
            },
        }
    )
    env = dict(
        os.environ,
        XLLM_TPU_ROOT=os.path.dirname(os.path.dirname(__file__)),
        XLLM_C_PLATFORM="cpu",
    )
    proc = subprocess.run(
        [exe, model_dir, extra], env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "CC API OK" in proc.stdout, proc.stdout
