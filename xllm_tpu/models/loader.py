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
        # multimodal checkpoints (qwen3-vl, qwen3.5) nest the LM under
        # model.language_model. — alias "model.X" to it transparently so
        # every family loader works on nested checkpoints
        self._lm_prefix = ""
        if (
            "model.language_model.embed_tokens.weight" in self.name_to_file
            and "model.embed_tokens.weight" not in self.name_to_file
        ):
            self._lm_prefix = "model.language_model."

    def _resolve(self, name: str) -> str:
        if (
            self._lm_prefix
            and name not in self.name_to_file
            and name.startswith("model.")
            and not name.startswith("model.language_model.")
        ):
            alias = self._lm_prefix + name[len("model."):]
            if alias in self.name_to_file:
                return alias
        return name

    def __contains__(self, name: str) -> bool:
        return self._resolve(name) in self.name_to_file

    def get(self, name: str) -> np.ndarray:
        name = self._resolve(name)
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
    "o_proj_w": ("model.layers.{i}.self_attn.o_proj.weight", True),
    "q_norm": ("model.layers.{i}.self_attn.q_norm.weight", False),
    "k_norm": ("model.layers.{i}.self_attn.k_norm.weight", False),
    "post_self_attn_layernorm": (
        "model.layers.{i}.post_self_attn_layernorm.weight", False,
    ),
    "post_mlp_layernorm": (
        "model.layers.{i}.post_mlp_layernorm.weight", False,
    ),
    "down_proj_w": ("model.layers.{i}.mlp.down_proj.weight", True),
}


def _fuse_qkv(
    cfg: ModelConfig, q: np.ndarray, k: np.ndarray, v: np.ndarray
) -> np.ndarray:
    """HF [out, in] (or [out] bias) q/k/v -> group-major fused out layout.

    Out dim order: hkv groups x (G q-heads + 1 K head + 1 V head) x head_dim
    — matches DenseDecoderModel.init_params, keeping TP shards on whole
    GQA groups.
    """
    hkv, dh = cfg.num_key_value_heads, cfg.head_dim
    g = cfg.num_attention_heads // hkv
    vec = q.ndim == 1

    def heads(t, n):  # [n*dh, in] -> [n, dh, in]
        return t.reshape(n, dh, -1) if not vec else t.reshape(n, dh, 1)

    qh, kh, vh = heads(q, hkv * g), heads(k, hkv), heads(v, hkv)
    groups = []
    for j in range(hkv):
        groups.append(qh[j * g : (j + 1) * g])
        groups.append(kh[j : j + 1])
        groups.append(vh[j : j + 1])
    fused = np.concatenate(groups, axis=0)  # [hkv*(g+2), dh, in]
    fused = fused.reshape(hkv * (g + 2) * dh, -1)
    if vec:
        return fused[:, 0]
    return np.ascontiguousarray(fused.T)  # [in, out]


def load_params(
    cfg: ModelConfig, shardings: dict | None = None, dtype=None,
    stack_transform=None,
) -> dict:
    """Family-dispatching checkpoint loader (reference ModelRegistry loaders).

    ``stack_transform(dotted_name, device_array) -> dict | None`` runs on
    each weight stack AS IT LOADS — the rolling-load hook (reference
    layers/npu/loader/rolling_load_manager.h: layer weights stream
    through a bounded device buffer). The runner quantizes each stack
    in place here (donated jit), so the full-precision model never
    materializes in HBM; returning a dict replaces the stack and may add
    siblings (e.g. {name: int8_codes, name + "_scale": scales})."""
    if cfg.model_type in ("qwen3_next", "qwen3_5", "qwen3_5_text",
                          "qwen3_5_moe_text"):
        return load_qwen3_next_params(cfg, shardings, dtype)
    if cfg.kv_lora_rank > 0:
        return load_mla_params(cfg, shardings, dtype,
                               stack_transform=stack_transform)
    params = load_dense_params(cfg, shardings, dtype,
                               stack_transform=stack_transform)
    if cfg.vision is not None:
        if cfg.model_type in ("qwen3_vl", "qwen3_vl_moe"):
            params["visual"] = load_vision3_params(cfg, shardings, dtype)
        elif cfg.model_type in ("glm4v", "glm4v_moe"):
            params["visual"] = load_glm_vision_params(cfg, shardings, dtype)
        else:
            params["visual"] = load_vision_params(cfg, shardings, dtype)
    return params


def load_glm_vision_params(
    cfg: ModelConfig, shardings: dict | None = None, dtype=None
) -> dict:
    """glm4v vision-tower weights (HF ``model.visual.*``/``visual.*``) into
    the GlmVisionEncoder tree (models/vision_glm.py init_params layout) —
    reference glm4v VLM weight mapping. The conv2d downsample reshapes to
    a channel-major linear; RMS block norms carry no biases."""
    import jax.numpy as jnp

    dt = dtype or jnp.bfloat16
    reader = SafetensorsReader(cfg.model_path)
    vc = cfg.vision or {}
    depth = int(vc.get("depth", 24))
    prefix = (
        "model.visual."
        if "model.visual.patch_embed.proj.weight" in reader
        else "visual."
    )

    def put(name: str, arr: np.ndarray):
        if arr.dtype != dt:
            arr = arr.astype(dt)
        sh = None
        if shardings is not None:
            sh = shardings["visual"]
            for part in name.split("."):
                sh = sh[part]
        return jax.device_put(arr, sh)

    def g(name):
        return reader.get(prefix + name).astype(np.float32)

    blocks: dict[str, list] = {}

    def blk(pname, hf, transpose=False):
        ts = []
        for i in range(depth):
            t = g(f"blocks.{i}.{hf}")
            ts.append(np.ascontiguousarray(t.T) if transpose else t)
        blocks[pname] = np.stack(ts, axis=0)

    blk("norm1_w", "norm1.weight")
    blk("norm2_w", "norm2.weight")
    blk("qkv_w", "attn.qkv.weight", transpose=True)
    if prefix + "blocks.0.attn.qkv.bias" in reader:
        blk("qkv_b", "attn.qkv.bias")
    blk("proj_w", "attn.proj.weight", transpose=True)
    blk("gate_w", "mlp.gate_proj.weight", transpose=True)
    blk("up_w", "mlp.up_proj.weight", transpose=True)
    blk("down_w", "mlp.down_proj.weight", transpose=True)

    pe = g("patch_embed.proj.weight")  # [d, C, Tp, ph, pw]
    ds = g("downsample.weight")  # [out, d, m, m]
    params = {
        "patch_embed_w": put(
            "patch_embed_w", np.ascontiguousarray(pe.reshape(pe.shape[0], -1).T)
        ),
        "patch_embed_b": put("patch_embed_b", g("patch_embed.proj.bias")),
        "post_conv_ln_w": put(
            "post_conv_ln_w", g("post_conv_layernorm.weight")
        ),
        "pos_embed": put(
            "pos_embed", g("embeddings.position_embedding.weight")
        ),
        "blocks": {k: put(f"blocks.{k}", v) for k, v in blocks.items()},
        "post_ln_w": put("post_ln_w", g("post_layernorm.weight")),
        "downsample_w": put(
            "downsample_w", np.ascontiguousarray(ds.reshape(ds.shape[0], -1).T)
        ),
        "downsample_b": put("downsample_b", g("downsample.bias")),
        "merger_proj_w": put(
            "merger_proj_w", np.ascontiguousarray(g("merger.proj.weight").T)
        ),
        "merger_ln_w": put(
            "merger_ln_w", g("merger.post_projection_norm.weight")
        ),
        "merger_ln_b": put(
            "merger_ln_b", g("merger.post_projection_norm.bias")
        ),
        "merger_gate_w": put(
            "merger_gate_w", np.ascontiguousarray(g("merger.gate_proj.weight").T)
        ),
        "merger_up_w": put(
            "merger_up_w", np.ascontiguousarray(g("merger.up_proj.weight").T)
        ),
        "merger_down_w": put(
            "merger_down_w", np.ascontiguousarray(g("merger.down_proj.weight").T)
        ),
    }
    logger.info("loaded glm vision tower (%d blocks)", depth)
    reader.close()
    return params


def load_qwen3_next_params(
    cfg: ModelConfig, shardings: dict | None = None, dtype=None
) -> dict:
    """HF Qwen3Next checkpoint -> the grouped hybrid param tree.

    Layers regroup as [G, interval] with the full-attention layer last in
    each group; qwen3-next's centered RMSNorms (applied as 1 + w) fold
    into plain rms_norm weights by adding 1 here (q/k norms, input/post
    layernorms, final norm — NOT the gated GDN norm).
    """
    import jax.numpy as jnp

    dt = dtype or jnp.bfloat16
    reader = SafetensorsReader(cfg.model_path)
    L = cfg.num_hidden_layers
    interval = cfg.full_attention_interval
    G, I1 = L // interval, interval - 1

    _F32_KEYS = ("lin_A_log", "lin_dt_bias")  # exp/softplus path stays f32

    def put(name: str, arr: np.ndarray):
        if (
            not np.issubdtype(arr.dtype, np.integer)
            and arr.dtype != dt
            and not name.endswith(_F32_KEYS)
        ):
            arr = arr.astype(dt)
        sh = None
        if shardings is not None:
            sh = shardings
            for part in name.split("."):
                sh = sh[part]
        return jax.device_put(arr, sh)

    # qwen3.5 checkpoints nest the LM under model.language_model.
    # (reference Qwen3_5ForCausalLM::load_model prefix, qwen3_5.h:55-59)
    prefix = (
        "model.language_model."
        if "model.language_model.embed_tokens.weight" in reader
        else "model."
    )

    def g(name):
        return reader.get(prefix + name).astype(np.float32)

    def centered(name):
        return g(name) + 1.0

    def fused_qkvz(i):
        """Fused per-k-head-interleaved qkvz weight [out, D]. qwen3.5
        ships split in_proj_qkv/in_proj_z tensors (reference
        merge_qkvz_from_split_activations,
        qwen3_5_gated_delta_net.cpp:64-98) — merge the WEIGHTS into the
        qwen3-next layout, a fixed output-channel permutation."""
        base = f"layers.{i}.linear_attn."
        if prefix + base + "in_proj_qkvz.weight" in reader:
            return g(base + "in_proj_qkvz.weight")
        hk = cfg.linear_num_key_heads
        hv = cfg.linear_num_value_heads
        dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
        r = hv // hk
        qkv = g(base + "in_proj_qkv.weight")
        z = g(base + "in_proj_z.weight")
        d = qkv.shape[1]
        key_dim = hk * dk
        q = qkv[:key_dim].reshape(hk, dk, d)
        k = qkv[key_dim : 2 * key_dim].reshape(hk, dk, d)
        v = qkv[2 * key_dim :].reshape(hk, r * dv, d)
        zz = z.reshape(hk, r * dv, d)
        return np.concatenate([q, k, v, zz], axis=1).reshape(-1, d)

    def fused_ba(i):
        base = f"layers.{i}.linear_attn."
        if prefix + base + "in_proj_ba.weight" in reader:
            return g(base + "in_proj_ba.weight")
        hk = cfg.linear_num_key_heads
        hv = cfg.linear_num_value_heads
        r = hv // hk
        b = g(base + "in_proj_b.weight")
        a = g(base + "in_proj_a.weight")
        d = b.shape[1]
        return np.concatenate(
            [b.reshape(hk, r, d), a.reshape(hk, r, d)], axis=1
        ).reshape(-1, d)

    lin_ids = [i for i in range(L) if (i + 1) % interval != 0]
    full_ids = [i for i in range(L) if (i + 1) % interval == 0]

    def stack(ids, fn, *shape_hint):
        return np.stack([fn(i) for i in ids], axis=0)

    gp: dict = {}
    # linear sublayers, regrouped [G, I1, ...]
    def regroup(flat):  # [G*I1, ...] -> [G, I1, ...]
        return flat.reshape(G, I1, *flat.shape[1:])

    gp["lin_input_layernorm"] = regroup(stack(
        lin_ids, lambda i: centered(f"layers.{i}.input_layernorm.weight")))
    gp["lin_post_layernorm"] = regroup(stack(
        lin_ids,
        lambda i: centered(f"layers.{i}.post_attention_layernorm.weight")))
    gp["lin_qkvz_w"] = regroup(stack(
        lin_ids, lambda i: np.ascontiguousarray(fused_qkvz(i).T)))
    gp["lin_ba_w"] = regroup(stack(
        lin_ids, lambda i: np.ascontiguousarray(fused_ba(i).T)))
    gp["lin_conv_w"] = regroup(stack(
        lin_ids,
        lambda i: g(f"layers.{i}.linear_attn.conv1d.weight")[:, 0, :]))
    gp["lin_dt_bias"] = regroup(stack(
        lin_ids, lambda i: g(f"layers.{i}.linear_attn.dt_bias")))
    gp["lin_A_log"] = regroup(stack(
        lin_ids, lambda i: g(f"layers.{i}.linear_attn.A_log")))
    gp["lin_norm_w"] = regroup(stack(
        lin_ids, lambda i: g(f"layers.{i}.linear_attn.norm.weight")))
    gp["lin_out_w"] = regroup(stack(
        lin_ids,
        lambda i: np.ascontiguousarray(
            g(f"layers.{i}.linear_attn.out_proj.weight").T)))
    # A_log / dt_bias stay f32 for the softplus/exp path
    gp["lin_dt_bias"] = gp["lin_dt_bias"].astype(np.float32)
    gp["lin_A_log"] = gp["lin_A_log"].astype(np.float32)

    gp["full_input_layernorm"] = stack(
        full_ids, lambda i: centered(f"layers.{i}.input_layernorm.weight"))
    gp["full_post_layernorm"] = stack(
        full_ids,
        lambda i: centered(f"layers.{i}.post_attention_layernorm.weight"))
    gp["full_q_w"] = stack(
        full_ids,
        lambda i: np.ascontiguousarray(
            g(f"layers.{i}.self_attn.q_proj.weight").T))
    gp["full_k_w"] = stack(
        full_ids,
        lambda i: np.ascontiguousarray(
            g(f"layers.{i}.self_attn.k_proj.weight").T))
    gp["full_v_w"] = stack(
        full_ids,
        lambda i: np.ascontiguousarray(
            g(f"layers.{i}.self_attn.v_proj.weight").T))
    gp["full_o_w"] = stack(
        full_ids,
        lambda i: np.ascontiguousarray(
            g(f"layers.{i}.self_attn.o_proj.weight").T))
    gp["full_q_norm"] = stack(
        full_ids, lambda i: centered(f"layers.{i}.self_attn.q_norm.weight"))
    gp["full_k_norm"] = stack(
        full_ids, lambda i: centered(f"layers.{i}.self_attn.k_norm.weight"))

    # MLPs: [G, interval, ...] in layer order (full layer last per group)
    def mlp_stack(fn):
        flat = np.stack([fn(i) for i in range(L)], axis=0)
        return flat.reshape(G, interval, *flat.shape[1:])

    if cfg.num_experts > 0:
        E = cfg.num_experts
        gp["router_w"] = mlp_stack(
            lambda i: np.ascontiguousarray(
                g(f"layers.{i}.mlp.gate.weight").T))

        def gu(i):
            return np.stack([
                np.concatenate([
                    np.ascontiguousarray(
                        g(f"layers.{i}.mlp.experts.{j}.gate_proj.weight").T),
                    np.ascontiguousarray(
                        g(f"layers.{i}.mlp.experts.{j}.up_proj.weight").T),
                ], axis=1)
                for j in range(E)
            ], axis=0)

        gp["experts_gate_up"] = mlp_stack(gu)
        gp["experts_down"] = mlp_stack(lambda i: np.stack([
            np.ascontiguousarray(
                g(f"layers.{i}.mlp.experts.{j}.down_proj.weight").T)
            for j in range(E)
        ], axis=0))
        gp["shared_gate_proj_w"] = mlp_stack(
            lambda i: np.ascontiguousarray(
                g(f"layers.{i}.mlp.shared_expert.gate_proj.weight").T))
        gp["shared_up_proj_w"] = mlp_stack(
            lambda i: np.ascontiguousarray(
                g(f"layers.{i}.mlp.shared_expert.up_proj.weight").T))
        gp["shared_down_proj_w"] = mlp_stack(
            lambda i: np.ascontiguousarray(
                g(f"layers.{i}.mlp.shared_expert.down_proj.weight").T))
        gp["shared_gate_w"] = mlp_stack(
            lambda i: g(f"layers.{i}.mlp.shared_expert_gate.weight")[0])
    else:
        gp["gate_proj_w"] = mlp_stack(
            lambda i: np.ascontiguousarray(
                g(f"layers.{i}.mlp.gate_proj.weight").T))
        gp["up_proj_w"] = mlp_stack(
            lambda i: np.ascontiguousarray(
                g(f"layers.{i}.mlp.up_proj.weight").T))
        gp["down_proj_w"] = mlp_stack(
            lambda i: np.ascontiguousarray(
                g(f"layers.{i}.mlp.down_proj.weight").T))

    params = {
        "embed_tokens": put("embed_tokens", g("embed_tokens.weight")),
        "norm": put("norm", centered("norm.weight")),
        "groups": {k: put(f"groups.{k}", v) for k, v in gp.items()},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = put(
            "lm_head",
            np.ascontiguousarray(reader.get("lm_head.weight").T),
        )
    logger.info("loaded qwen3-next: %d groups x %d layers", G, interval)
    reader.close()
    return params


def load_vision_params(
    cfg: ModelConfig, shardings: dict | None = None, dtype=None
) -> dict:
    """qwen2-vl vision-tower weights (HF ``visual.*`` keys) into the
    VisionEncoder stacked-block tree (models/vision.py init_params layout).

    Counterpart of the reference's VLM checkpoint loading
    (reference xllm/models/vlm/qwen2_vl.h weight mapping).
    """
    import jax.numpy as jnp

    dt = dtype or jnp.bfloat16
    reader = SafetensorsReader(cfg.model_path)
    depth = int((cfg.vision or {}).get("depth", 32))

    def put(name: str, arr: np.ndarray):
        if arr.dtype != dt:
            arr = arr.astype(dt)
        sh = None
        if shardings is not None:
            sh = shardings["visual"]
            for part in name.split("."):
                sh = sh[part]
        return jax.device_put(arr, sh)

    def g(name):
        return reader.get("visual." + name).astype(np.float32)

    blocks: dict[str, list] = {}

    def blk(pname, hf, transpose=False):
        ts = []
        for i in range(depth):
            t = g(f"blocks.{i}.{hf}")
            ts.append(np.ascontiguousarray(t.T) if transpose else t)
        blocks[pname] = np.stack(ts, axis=0)

    blk("norm1_w", "norm1.weight")
    blk("norm1_b", "norm1.bias")
    blk("norm2_w", "norm2.weight")
    blk("norm2_b", "norm2.bias")
    blk("qkv_w", "attn.qkv.weight", transpose=True)
    blk("qkv_b", "attn.qkv.bias")
    blk("proj_w", "attn.proj.weight", transpose=True)
    blk("proj_b", "attn.proj.bias")
    blk("fc1_w", "mlp.fc1.weight", transpose=True)
    blk("fc1_b", "mlp.fc1.bias")
    blk("fc2_w", "mlp.fc2.weight", transpose=True)
    blk("fc2_b", "mlp.fc2.bias")

    pe = g("patch_embed.proj.weight")  # [dim, C, Tp, ph, pw]
    params = {
        "patch_embed_w": put(
            "patch_embed_w",
            np.ascontiguousarray(pe.reshape(pe.shape[0], -1).T),
        ),
        "blocks": {k: put(f"blocks.{k}", v) for k, v in blocks.items()},
        "merger_ln_w": put("merger_ln_w", g("merger.ln_q.weight")),
        "merger_ln_b": put("merger_ln_b", g("merger.ln_q.bias")),
        "merger_fc1_w": put(
            "merger_fc1_w", np.ascontiguousarray(g("merger.mlp.0.weight").T)
        ),
        "merger_fc1_b": put("merger_fc1_b", g("merger.mlp.0.bias")),
        "merger_fc2_w": put(
            "merger_fc2_w", np.ascontiguousarray(g("merger.mlp.2.weight").T)
        ),
        "merger_fc2_b": put("merger_fc2_b", g("merger.mlp.2.bias")),
    }
    logger.info("loaded vision tower (%d blocks)", depth)
    reader.close()
    return params


def load_mla_params(
    cfg: ModelConfig,
    shardings: dict | None = None,
    dtype=None,
    stack_transform=None,
) -> dict:
    """DeepSeek v2/v3 checkpoint -> MlaDecoderModel param tree.

    HF names: self_attn.{q_a_proj,q_a_layernorm,q_b_proj | q_proj},
    kv_a_proj_with_mqa, kv_a_layernorm, kv_b_proj (fused
    [H*(nope+v_head), kv_lora]), o_proj; mlp.{gate,up,down}_proj on dense
    layers; mlp.gate (router), mlp.experts.{j}.*, mlp.shared_experts.* on
    MoE layers.
    """
    import jax.numpy as jnp

    dt = dtype or jnp.bfloat16
    reader = SafetensorsReader(cfg.model_path)
    L = cfg.num_hidden_layers
    H = cfg.num_attention_heads
    nope, rope, vh = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    kvr = cfg.kv_lora_rank
    n_dense = cfg.first_k_dense_replace if cfg.num_experts > 0 else L
    extras: dict = {}

    def put(name: str, arr: np.ndarray):
        if not np.issubdtype(arr.dtype, np.integer) and arr.dtype != dt:
            arr = arr.astype(dt)
        sh = None
        if shardings is not None:
            sh = shardings
            for part in name.split("."):
                sh = sh[part]
        val = jax.device_put(arr, sh)
        if stack_transform is not None:
            repl = stack_transform(name, val)
            if repl is not None:
                repl = dict(repl)
                val = repl.pop(name)
                extras.update(repl)
        return val

    def T(name):
        return np.ascontiguousarray(reader.get(name).T)

    def attn_tensors(i):
        p = f"model.layers.{i}.self_attn"
        out = {
            "input_layernorm": reader.get(
                f"model.layers.{i}.input_layernorm.weight"
            ),
            "post_attention_layernorm": reader.get(
                f"model.layers.{i}.post_attention_layernorm.weight"
            ),
            "kv_a_proj_w": T(f"{p}.kv_a_proj_with_mqa.weight"),
            "kv_a_norm": reader.get(f"{p}.kv_a_layernorm.weight"),
            "o_proj_w": T(f"{p}.o_proj.weight"),
        }
        kv_b = reader.get(f"{p}.kv_b_proj.weight")  # [H*(nope+vh), kvr]
        kv_b = kv_b.reshape(H, nope + vh, kvr)
        out["kv_b_nope_w"] = np.ascontiguousarray(
            kv_b[:, :nope].transpose(0, 2, 1)  # [H, kvr, nope]
        )
        out["kv_b_v_w"] = np.ascontiguousarray(
            kv_b[:, nope:].transpose(0, 2, 1)  # [H, kvr, vh]
        )
        if cfg.q_lora_rank > 0:
            out["q_a_proj_w"] = T(f"{p}.q_a_proj.weight")
            out["q_a_norm"] = reader.get(f"{p}.q_a_layernorm.weight")
            out["q_b_proj_w"] = T(f"{p}.q_b_proj.weight")
        else:
            out["q_proj_w"] = T(f"{p}.q_proj.weight")
        if cfg.index_topk > 0:
            # deepseek-v3.2 lightning indexer (reference indexer.cpp
            # wq_b/wk/k_norm/weights_proj under self_attn.indexer.*)
            ip = f"{p}.indexer"
            out["idx_wq_b"] = T(f"{ip}.wq_b.weight")
            out["idx_wk"] = T(f"{ip}.wk.weight")
            out["idx_k_norm_w"] = reader.get(f"{ip}.k_norm.weight")
            out["idx_k_norm_b"] = reader.get(f"{ip}.k_norm.bias")
            out["idx_weights_w"] = T(f"{ip}.weights_proj.weight")
        return out

    def stack_group(prefix, layer_ids, extra_fn):
        per = [dict(attn_tensors(i), **extra_fn(i)) for i in layer_ids]
        group = {}
        for name in per[0]:
            group[name] = put(
                f"{prefix}.{name}", np.stack([p[name] for p in per], axis=0)
            )
        return group

    def dense_mlp(i):
        p = f"model.layers.{i}.mlp"
        return {
            "gate_proj_w": T(f"{p}.gate_proj.weight"),
            "up_proj_w": T(f"{p}.up_proj.weight"),
            "down_proj_w": T(f"{p}.down_proj.weight"),
        }

    def moe_mlp_tensors(i):
        p = f"model.layers.{i}.mlp"
        E = cfg.num_experts
        out = {"router_w": T(f"{p}.gate.weight")}
        if f"{p}.gate.e_score_correction_bias" in reader:
            out["router_bias"] = reader.get(
                f"{p}.gate.e_score_correction_bias"
            ).astype(np.float32)
        gus, downs = [], []
        for j in range(E):
            gus.append(
                np.concatenate(
                    [
                        T(f"{p}.experts.{j}.gate_proj.weight"),
                        T(f"{p}.experts.{j}.up_proj.weight"),
                    ],
                    axis=1,
                )
            )
            downs.append(T(f"{p}.experts.{j}.down_proj.weight"))
        out["experts_gate_up"] = np.stack(gus, axis=0)
        out["experts_down"] = np.stack(downs, axis=0)
        out["expert_placement"] = np.arange(E, dtype=np.int32)
        if cfg.n_shared_experts > 0:
            out["shared_gate_proj_w"] = T(f"{p}.shared_experts.gate_proj.weight")
            out["shared_up_proj_w"] = T(f"{p}.shared_experts.up_proj.weight")
            out["shared_down_proj_w"] = T(f"{p}.shared_experts.down_proj.weight")
        return out

    params: dict = {
        "embed_tokens": put(
            "embed_tokens", reader.get("model.embed_tokens.weight")
        ),
        "norm": put("norm", reader.get("model.norm.weight")),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = put(
            "lm_head", np.ascontiguousarray(reader.get("lm_head.weight").T)
        )
    if n_dense > 0:
        params["dense_layers"] = stack_group(
            "dense_layers", range(n_dense), dense_mlp
        )
    if n_dense < L:
        params["moe_layers"] = stack_group(
            "moe_layers", range(n_dense, L), moe_mlp_tensors
        )
    reader.close()
    logger.info("loaded deepseek MLA params (%d dense + %d moe layers)",
                n_dense, L - n_dense)
    for dotted, v in extras.items():
        node = params
        parts = dotted.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = v

    return params


def load_dense_params(
    cfg: ModelConfig,
    shardings: dict | None = None,
    dtype=None,
    stack_transform=None,
) -> dict:
    """Load a llama/qwen2/qwen3 checkpoint into the stacked param tree.

    ``shardings`` is the model's param_shardings() tree materialized as
    NamedShardings (or None for single-device); ``stack_transform`` is
    the rolling-load hook (see load_params).
    """
    import jax.numpy as jnp

    dt = dtype or jnp.bfloat16
    reader = SafetensorsReader(cfg.model_path)
    L = cfg.num_hidden_layers
    extras: dict = {}

    def put(name: str, arr: np.ndarray):
        if not np.issubdtype(arr.dtype, np.integer) and arr.dtype != dt:
            arr = arr.astype(dt)
        sh = None
        if shardings is not None:
            sh = shardings
            for part in name.split("."):
                sh = sh[part]
        val = jax.device_put(arr, sh)
        if stack_transform is not None:
            repl = stack_transform(name, val)
            if repl is not None:
                repl = dict(repl)
                val = repl.pop(name)
                extras.update(repl)
        return val

    # glm4-moe: a dense-MLP prefix of first_k_dense_replace layers lives in
    # a separate "dense_layers" stack (mirrors MoeDecoderModel.init_params)
    nd = cfg.first_k_dense_replace if cfg.num_experts > 0 else 0
    params: dict = {"layers": {}}
    if nd > 0:
        params["dense_layers"] = {}
    params["embed_tokens"] = put("embed_tokens", reader.get("model.embed_tokens.weight"))
    params["norm"] = put("norm", reader.get("model.norm.weight"))
    if not cfg.tie_word_embeddings:
        lm = reader.get("lm_head.weight")
        params["lm_head"] = put("lm_head", np.ascontiguousarray(lm.T))

    def put_layer_stack(pname: str, stacked: np.ndarray):
        if nd > 0:
            params["dense_layers"][pname] = put(
                f"dense_layers.{pname}", stacked[:nd]
            )
            params["layers"][pname] = put(f"layers.{pname}", stacked[nd:])
        else:
            params["layers"][pname] = put(f"layers.{pname}", stacked)

    for pname, (template, transpose) in _LAYER_MAP.items():
        if pname == "down_proj_w" and nd > 0:
            continue  # dense-prefix MLP loads below; moe layers have no mlp.down_proj
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
        put_layer_stack(pname, stacked)
        logger.info("loaded %s %s", pname, stacked.shape)

    # fused projections (group-major qkv; [D, 2, I] gate_up)
    attn = "model.layers.{i}.self_attn.{p}_proj.{t}"
    qkv_w = np.stack(
        [
            _fuse_qkv(
                cfg,
                reader.get(attn.format(i=i, p="q", t="weight")),
                reader.get(attn.format(i=i, p="k", t="weight")),
                reader.get(attn.format(i=i, p="v", t="weight")),
            )
            for i in range(L)
        ],
        axis=0,
    )
    put_layer_stack("qkv_proj_w", qkv_w)
    logger.info("loaded qkv_proj_w %s", qkv_w.shape)
    if attn.format(i=0, p="q", t="bias") in reader:
        qkv_b = np.stack(
            [
                _fuse_qkv(
                    cfg,
                    reader.get(attn.format(i=i, p="q", t="bias")),
                    reader.get(attn.format(i=i, p="k", t="bias")),
                    reader.get(attn.format(i=i, p="v", t="bias")),
                )
                for i in range(L)
            ],
            axis=0,
        )
        put_layer_stack("qkv_proj_b", qkv_b)
    if cfg.num_experts > 0:
        if nd > 0:
            for pname, hf in (
                ("gate_proj_w", "gate_proj"),
                ("up_proj_w", "up_proj"),
                ("down_proj_w", "down_proj"),
            ):
                params["dense_layers"][pname] = put(
                    f"dense_layers.{pname}",
                    np.stack(
                        [
                            np.ascontiguousarray(
                                reader.get(
                                    f"model.layers.{i}.mlp.{hf}.weight"
                                ).T
                            )
                            for i in range(nd)
                        ],
                        axis=0,
                    ),
                )
        _load_moe_mlp(cfg, reader, params, put, L, first_layer=nd)
    elif "model.layers.0.mlp.gate_up_proj.weight" in reader:
        # glm4-style fused gate_up: rows [gate | up]
        gates, ups = [], []
        for i in range(L):
            gu = reader.get(f"model.layers.{i}.mlp.gate_up_proj.weight")
            half = gu.shape[0] // 2
            gates.append(np.ascontiguousarray(gu[:half].T))
            ups.append(np.ascontiguousarray(gu[half:].T))
        params["layers"]["gate_proj_w"] = put(
            "layers.gate_proj_w", np.stack(gates, axis=0)
        )
        params["layers"]["up_proj_w"] = put(
            "layers.up_proj_w", np.stack(ups, axis=0)
        )
        logger.info("loaded fused gate_up (glm4) split into gate/up")
    else:
        for pname, hf in (
            ("gate_proj_w", "gate_proj"),
            ("up_proj_w", "up_proj"),
        ):
            stacked = np.stack(
                [
                    np.ascontiguousarray(
                        reader.get(f"model.layers.{i}.mlp.{hf}.weight").T
                    )
                    for i in range(L)
                ],
                axis=0,
            )
            params["layers"][pname] = put(f"layers.{pname}", stacked)
            logger.info("loaded %s %s", pname, stacked.shape)

    reader.close()
    for dotted, v in extras.items():
        node = params
        parts = dotted.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = v

    return params


def _load_moe_mlp(
    cfg: ModelConfig, reader, params, put, L: int, first_layer: int = 0
) -> None:
    """qwen3-moe expert stacks: router [D, E], experts [E, D, 2I]/[E, I, D].

    ``first_layer`` skips a glm4-moe-style dense prefix; the stacks then
    cover layers [first_layer, L).
    """
    E = cfg.num_experts
    lids = range(first_layer, L)
    nm = L - first_layer
    router = np.stack(
        [
            np.ascontiguousarray(
                reader.get(f"model.layers.{i}.mlp.gate.weight").T
            )
            for i in lids
        ],
        axis=0,
    )
    params["layers"]["router_w"] = put("layers.router_w", router)
    # noaux_tc correction bias (minimax-m2 stores it under mlp., deepseek
    # under mlp.gate. — reference minimax_m2.h:135 remap)
    bias_names = [
        "model.layers.{i}.mlp.gate.e_score_correction_bias",
        "model.layers.{i}.mlp.e_score_correction_bias",
    ]
    for tmpl in bias_names:
        if tmpl.format(i=first_layer) in reader:
            params["layers"]["router_bias"] = put(
                "layers.router_bias",
                np.stack(
                    [
                        reader.get(tmpl.format(i=i)).astype(np.float32)
                        for i in lids
                    ],
                    axis=0,
                ),
            )
            break

    def expert(i, j, proj):
        return np.ascontiguousarray(
            reader.get(
                f"model.layers.{i}.mlp.experts.{j}.{proj}_proj.weight"
            ).T
        )

    gus, downs = [], []
    batched = (
        f"model.layers.{first_layer}.mlp.experts.gate_up_proj" in reader
    )
    for i in lids:
        if batched:
            # qwen3-vl-moe convention: ONE [E, D, 2I]/[E, I, D] tensor per
            # layer (HF Qwen3VLMoeTextExperts), gate|up halves — already
            # our layout
            gus.append(
                reader.get(f"model.layers.{i}.mlp.experts.gate_up_proj")
            )
            downs.append(
                reader.get(f"model.layers.{i}.mlp.experts.down_proj")
            )
            continue
        gus.append(
            np.stack(
                [
                    np.concatenate(
                        [expert(i, j, "gate"), expert(i, j, "up")], axis=1
                    )
                    for j in range(E)
                ],
                axis=0,
            )
        )  # [E, D, 2I]
        downs.append(np.stack([expert(i, j, "down") for j in range(E)], axis=0))
    params["layers"]["experts_gate_up"] = put(
        "layers.experts_gate_up", np.stack(gus, axis=0)
    )
    params["layers"]["experts_down"] = put(
        "layers.experts_down", np.stack(downs, axis=0)
    )
    if cfg.n_shared_experts > 0:
        for pname, hf in (
            ("shared_gate_proj_w", "gate_proj"),
            ("shared_up_proj_w", "up_proj"),
            ("shared_down_proj_w", "down_proj"),
        ):
            params["layers"][pname] = put(
                f"layers.{pname}",
                np.stack(
                    [
                        np.ascontiguousarray(
                            reader.get(
                                f"model.layers.{i}.mlp.shared_experts"
                                f".{hf}.weight"
                            ).T
                        )
                        for i in lids
                    ],
                    axis=0,
                ),
            )
    params["layers"]["expert_placement"] = put(
        "layers.expert_placement",
        np.tile(np.arange(E, dtype=np.int32), (nm, 1)),
    )
    logger.info("loaded %d experts x %d moe layers", E, nm)


def load_mtp_head_params(
    draft_model_path: str, init_params: dict, dtype=None,
    cfg: ModelConfig | None = None,
) -> dict:
    """Best-effort MTP/Eagle3 head weight loading.

    Maps MiMo/qwen-style MTP module tensors (enorm, hnorm, eh_proj, one
    dense decoder layer + final norm — reference mtp_worker_impl.h:34
    weight layout) onto the MTPHead parameter tree; any tensor the
    checkpoint lacks keeps its random init (and a warning is logged) so
    structure tests run without real draft checkpoints.
    """
    import jax.numpy as jnp

    from xllm_tpu.utils import get_logger

    logger = get_logger(__name__)
    try:
        reader = SafetensorsReader(draft_model_path)
    except Exception as e:
        logger.warning("MTP head: cannot read %s (%s); random init",
                       draft_model_path, e)
        return init_params
    out = {k: v for k, v in init_params.items()}
    layers = dict(out["layers"])

    def try_put(dst: dict, key: str, names: list[str], transform=None):
        for name in names:
            if name in reader:
                arr = reader.get(name)
                if transform is not None:
                    arr = transform(arr)
                want = dst[key].shape
                if arr.shape != want:
                    logger.warning(
                        "MTP head: %s shape %s != %s; skipped",
                        name, arr.shape, want,
                    )
                    return
                dst[key] = jnp.asarray(arr, dst[key].dtype)
                return

    def t_1(a):  # HF [out, in] -> [1, in, out]
        return np.ascontiguousarray(a.T)[None]

    def ln_1(a):  # [d] -> [1, d]
        return a[None]

    # candidate prefixes: a dedicated mtp dir ("model.layers.0.") or the
    # extra-layer convention ("model.layers.<L>.") — probe both
    prefixes = ["model.layers.0.", "mtp.", "model.mtp."]
    for pfx in prefixes:
        if f"{pfx}enorm.weight" in reader:
            try_put(out, "enorm", [f"{pfx}enorm.weight"])
            try_put(out, "hnorm", [f"{pfx}hnorm.weight"])
            try_put(out, "eh_proj", [f"{pfx}eh_proj.weight"],
                    transform=lambda a: a.T)
            try_put(out, "norm", [f"{pfx}shared_head.norm.weight",
                                  f"{pfx}final_layernorm.weight",
                                  "model.norm.weight"])
            # the MTP module's own decoder layer (attention + MLP)
            try_put(layers, "input_layernorm",
                    [f"{pfx}input_layernorm.weight"], transform=ln_1)
            try_put(layers, "post_attention_layernorm",
                    [f"{pfx}post_attention_layernorm.weight"],
                    transform=ln_1)
            qn = f"{pfx}self_attn.q_proj.weight"
            if cfg is not None and qn in reader:
                fused = _fuse_qkv(
                    cfg,
                    reader.get(qn),
                    reader.get(f"{pfx}self_attn.k_proj.weight"),
                    reader.get(f"{pfx}self_attn.v_proj.weight"),
                )  # [in, out]
                want = layers["qkv_proj_w"].shape
                if fused[None].shape == want:
                    layers["qkv_proj_w"] = jnp.asarray(
                        fused[None], layers["qkv_proj_w"].dtype
                    )
                else:
                    logger.warning(
                        "MTP head: fused qkv shape %s != %s; skipped",
                        fused[None].shape, want,
                    )
            elif cfg is None and qn in reader:
                logger.warning(
                    "MTP head: q/k/v present but no cfg passed; "
                    "attention weights stay random"
                )
            try_put(layers, "o_proj_w",
                    [f"{pfx}self_attn.o_proj.weight"], transform=t_1)
            try_put(layers, "gate_proj_w",
                    [f"{pfx}mlp.gate_proj.weight"], transform=t_1)
            try_put(layers, "up_proj_w",
                    [f"{pfx}mlp.up_proj.weight"], transform=t_1)
            try_put(layers, "down_proj_w",
                    [f"{pfx}mlp.down_proj.weight"], transform=t_1)
            if "q_norm" in layers:
                try_put(layers, "q_norm",
                        [f"{pfx}self_attn.q_norm.weight"], transform=ln_1)
                try_put(layers, "k_norm",
                        [f"{pfx}self_attn.k_norm.weight"], transform=ln_1)
            break
    reader.close()
    out["layers"] = layers
    return out


def load_vision3_params(
    cfg: ModelConfig, shardings: dict | None = None, dtype=None
) -> dict:
    """qwen3-vl vision-tower weights (HF ``model.visual.*`` keys) into
    the Qwen3VisionEncoder param tree (models/vision3.py init_params
    layout, incl. the deepstack mergers)."""
    import jax.numpy as jnp

    dt = dtype or jnp.bfloat16
    reader = SafetensorsReader(cfg.model_path)
    vc = cfg.vision or {}
    depth = int(vc.get("depth", 27))
    n_ds = len(vc.get("deepstack_visual_indexes", (0, 1, 2)))
    prefix = (
        "model.visual." if "model.visual.pos_embed.weight" in reader
        else "visual."
    )

    def put(name: str, arr: np.ndarray):
        if arr.dtype != dt:
            arr = arr.astype(dt)
        sh = None
        if shardings is not None:
            sh = shardings["visual"]
            for part in name.split("."):
                if isinstance(sh, (list, tuple)):
                    sh = sh[int(part)]
                else:
                    sh = sh[part]
        return jax.device_put(arr, sh)

    def g(name):
        return reader.get(prefix + name).astype(np.float32)

    blocks: dict[str, list] = {}

    def blk(pname, hf, transpose=False):
        ts = []
        for i in range(depth):
            t = g(f"blocks.{i}.{hf}")
            ts.append(np.ascontiguousarray(t.T) if transpose else t)
        blocks[pname] = np.stack(ts, axis=0)

    blk("norm1_w", "norm1.weight")
    blk("norm1_b", "norm1.bias")
    blk("norm2_w", "norm2.weight")
    blk("norm2_b", "norm2.bias")
    blk("qkv_w", "attn.qkv.weight", transpose=True)
    blk("qkv_b", "attn.qkv.bias")
    blk("proj_w", "attn.proj.weight", transpose=True)
    blk("proj_b", "attn.proj.bias")
    blk("fc1_w", "mlp.linear_fc1.weight", transpose=True)
    blk("fc1_b", "mlp.linear_fc1.bias")
    blk("fc2_w", "mlp.linear_fc2.weight", transpose=True)
    blk("fc2_b", "mlp.linear_fc2.bias")

    def merger(hf_prefix, pname):
        return {
            "ln_w": put(f"{pname}.ln_w", g(hf_prefix + "norm.weight")),
            "ln_b": put(f"{pname}.ln_b", g(hf_prefix + "norm.bias")),
            "fc1_w": put(f"{pname}.fc1_w", np.ascontiguousarray(
                g(hf_prefix + "linear_fc1.weight").T)),
            "fc1_b": put(f"{pname}.fc1_b", g(hf_prefix + "linear_fc1.bias")),
            "fc2_w": put(f"{pname}.fc2_w", np.ascontiguousarray(
                g(hf_prefix + "linear_fc2.weight").T)),
            "fc2_b": put(f"{pname}.fc2_b", g(hf_prefix + "linear_fc2.bias")),
        }

    pe = g("patch_embed.proj.weight")  # [dim, C, Tp, ph, pw]
    params = {
        "patch_embed_w": put(
            "patch_embed_w",
            np.ascontiguousarray(pe.reshape(pe.shape[0], -1).T),
        ),
        "patch_embed_b": put("patch_embed_b", g("patch_embed.proj.bias")),
        "pos_embed": put("pos_embed", g("pos_embed.weight")),
        "blocks": {k: put(f"blocks.{k}", v) for k, v in blocks.items()},
        "merger": merger("merger.", "merger"),
        "ds_mergers": [
            merger(f"deepstack_merger_list.{k}.", f"ds_mergers.{k}")
            for k in range(n_ds)
        ],
    }
    logger.info("loaded qwen3-vl vision tower (%d blocks, %d deepstack)",
                depth, n_ds)
    reader.close()
    return params
