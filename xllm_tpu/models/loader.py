"""HF safetensors checkpoint loader.

Counterpart of the reference's HFModelLoader + StateDict
(reference xllm/core/framework/hf_model_loader.h:32-59,
xllm/core/framework/state_dict/state_dict.h): reads config.json +
model.safetensors[.index.json], maps HF tensor names to our param tree,
stacks the per-layer tensors along the leading layer axis, and places each
array on the mesh with its TP sharding (sharded host->device transfer, the
TPU equivalent of the reference's per-rank weight-slice loading in
npu_column_parallel_linear_impl.*).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from safetensors import safe_open

from xllm_tpu.config import ModelConfig
from xllm_tpu.utils import get_logger

logger = get_logger(__name__)


class SafetensorsReader:
    """Uniform access over a single-file or index-sharded checkpoint."""

    def __init__(self, model_path: str):
        self.model_path = model_path
        index_path = os.path.join(model_path, "model.safetensors.index.json")
        self.name_to_file: dict[str, str] = {}
        if os.path.exists(index_path):
            with open(index_path) as f:
                index = json.load(f)
            self.name_to_file = dict(index["weight_map"])
        else:
            single = os.path.join(model_path, "model.safetensors")
            if not os.path.exists(single):
                raise FileNotFoundError(f"no safetensors checkpoint in {model_path}")
            with safe_open(single, framework="np") as f:
                for name in f.keys():
                    self.name_to_file[name] = "model.safetensors"
        self._handles: dict[str, object] = {}

    def __contains__(self, name: str) -> bool:
        return name in self.name_to_file

    def get(self, name: str) -> np.ndarray:
        fname = self.name_to_file[name]
        if fname not in self._handles:
            self._handles[fname] = safe_open(
                os.path.join(self.model_path, fname), framework="np"
            )
        return self._handles[fname].get_tensor(name)

    def close(self) -> None:
        self._handles.clear()


# our stacked-layer param name -> (HF per-layer template, transpose?)
_LAYER_MAP = {
    "input_layernorm": ("model.layers.{i}.input_layernorm.weight", False),
    "post_attention_layernorm": (
        "model.layers.{i}.post_attention_layernorm.weight",
        False,
    ),
    "q_proj_w": ("model.layers.{i}.self_attn.q_proj.weight", True),
    "k_proj_w": ("model.layers.{i}.self_attn.k_proj.weight", True),
    "v_proj_w": ("model.layers.{i}.self_attn.v_proj.weight", True),
    "o_proj_w": ("model.layers.{i}.self_attn.o_proj.weight", True),
    "q_proj_b": ("model.layers.{i}.self_attn.q_proj.bias", False),
    "k_proj_b": ("model.layers.{i}.self_attn.k_proj.bias", False),
    "v_proj_b": ("model.layers.{i}.self_attn.v_proj.bias", False),
    "q_norm": ("model.layers.{i}.self_attn.q_norm.weight", False),
    "k_norm": ("model.layers.{i}.self_attn.k_norm.weight", False),
    "gate_proj_w": ("model.layers.{i}.mlp.gate_proj.weight", True),
    "up_proj_w": ("model.layers.{i}.mlp.up_proj.weight", True),
    "down_proj_w": ("model.layers.{i}.mlp.down_proj.weight", True),
}


def load_dense_params(
    cfg: ModelConfig,
    shardings: dict | None = None,
    dtype=None,
) -> dict:
    """Load a llama/qwen2/qwen3 checkpoint into the stacked param tree.

    ``shardings`` is the model's param_shardings() tree materialized as
    NamedShardings (or None for single-device).
    """
    import jax.numpy as jnp

    dt = dtype or jnp.bfloat16
    reader = SafetensorsReader(cfg.model_path)
    L = cfg.num_hidden_layers

    def put(name: str, arr: np.ndarray):
        arr = arr.astype(dt) if arr.dtype != dt else arr
        sh = None
        if shardings is not None:
            sh = shardings
            for part in name.split("."):
                sh = sh[part]
        return jax.device_put(arr, sh)

    params: dict = {"layers": {}}
    params["embed_tokens"] = put("embed_tokens", reader.get("model.embed_tokens.weight"))
    params["norm"] = put("norm", reader.get("model.norm.weight"))
    if not cfg.tie_word_embeddings:
        lm = reader.get("lm_head.weight")
        params["lm_head"] = put("lm_head", np.ascontiguousarray(lm.T))

    for pname, (template, transpose) in _LAYER_MAP.items():
        first = template.format(i=0)
        if first not in reader:
            continue
        per_layer = []
        for i in range(L):
            t = reader.get(template.format(i=i))
            if transpose:
                t = np.ascontiguousarray(t.T)
            per_layer.append(t)
        stacked = np.stack(per_layer, axis=0)
        params["layers"][pname] = put(f"layers.{pname}", stacked)
        logger.info("loaded %s %s", pname, stacked.shape)

    reader.close()
    return params
