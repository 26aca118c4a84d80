"""MoE decoder-only transformer (qwen3-moe family).

Counterpart of the reference's qwen3-moe model + FusedMoE layer
(reference xllm/models/llm/qwen3_moe.h registered at model_registry.h:150-247,
xllm/core/layers/common/fused_moe.cpp). Same scan-over-layers structure as
the dense model; the MLP is a routed expert block (ops/moe.py).

Expert-parallel sharding (reference moe_ep groups,
collective_communicator.h:48-49): expert-stacked weights shard on the
expert dim over the ``tp`` mesh axis (EP aliases TP — activations are
already replicated across tp after the attention row-parallel sum, so
expert outputs combine with one psum inserted by GSPMD).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from xllm_tpu.config import ModelConfig
from xllm_tpu.models.decoder import TP_AXIS, DenseDecoderModel
from xllm_tpu.ops.moe import moe_mlp


class MoeDecoderModel(DenseDecoderModel):
    # extra physical expert slots holding replicas of hot experts
    # (reference redundant_experts, eplb_policy.h:30-56); set by the
    # runner from EplbConfig.redundant_experts BEFORE init_params
    num_redundant_experts = 0

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        if cfg.num_experts <= 0:
            raise ValueError("MoeDecoderModel requires num_experts > 0")
        if cfg.mlp_only_layers or cfg.decoder_sparse_step != 1:
            raise NotImplementedError(
                "dense/sparse mixed stacks land with the deepseek family"
            )
        # glm4-moe: first k layers are plain dense MLP layers (reference
        # glm4_moe first_k_dense_replace, model_registry.h:150-247)
        self.n_dense = cfg.first_k_dense_replace
        self.n_moe = cfg.num_hidden_layers - self.n_dense

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        params = super().init_params(rng)
        full = params["layers"]
        nd, nm = self.n_dense, self.n_moe
        if nd > 0:
            params["dense_layers"] = {k: v[:nd] for k, v in full.items()}
            full = {k: v[nd:] for k, v in full.items()}
        layers = params["layers"] = full
        del layers["gate_proj_w"], layers["up_proj_w"], layers["down_proj_w"]
        D, E = c.hidden_size, c.num_experts
        I = c.moe_intermediate_size

        k1, k2, k3, k4 = jax.random.split(rng, 4)

        def w(key, *shape, scale=0.02):
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
                self.dtype
            )

        layers["router_w"] = w(k1, nm, D, E)
        if self.cfg.scoring_func == "sigmoid":
            layers["router_bias"] = jnp.zeros((nm, E), jnp.float32)
        layers["experts_gate_up"] = w(k2, nm, E, D, 2 * I)
        layers["experts_down"] = w(k3, nm, E, I, D)
        if self.num_redundant_experts > 0:
            # physical slots = E + R; replica slots start as copies per
            # the initial placement (rebalanced live by EPLB)
            init = self.initial_expert_placement()
            layers["experts_gate_up"] = layers["experts_gate_up"][:, init]
            layers["experts_down"] = layers["experts_down"][:, init]
        if c.n_shared_experts > 0:
            SI = c.n_shared_experts * I
            s1, s2, s3 = jax.random.split(k4, 3)
            layers["shared_gate_proj_w"] = w(s1, nm, D, SI)
            layers["shared_up_proj_w"] = w(s2, nm, D, SI)
            layers["shared_down_proj_w"] = w(s3, nm, SI, D)
        # EPLB slot map: placement[l, slot] = logical expert in that slot
        layers["expert_placement"] = jnp.tile(
            self.initial_expert_placement(), (nm, 1)
        )
        return params

    def initial_expert_placement(self) -> jnp.ndarray:
        """[E + R] int32: identity slots, then replica slots of experts
        0..R-1 (arbitrary until the first live rebalance)."""
        e, r = self.cfg.num_experts, self.num_redundant_experts
        base = jnp.arange(e, dtype=jnp.int32)
        if r == 0:
            return base
        return jnp.concatenate(
            [base, jnp.arange(r, dtype=jnp.int32) % e]
        )

    def param_shardings(self) -> dict:
        out = super().param_shardings()
        layers = out["layers"]
        if self.n_dense > 0:
            out["dense_layers"] = dict(layers)
        del layers["gate_proj_w"], layers["up_proj_w"], layers["down_proj_w"]
        layers["router_w"] = P()
        if self.cfg.scoring_func == "sigmoid":
            layers["router_bias"] = P()
        # EP: experts sharded over the tp axis
        layers["experts_gate_up"] = P(None, TP_AXIS, None, None)
        layers["experts_down"] = P(None, TP_AXIS, None, None)
        if self.cfg.n_shared_experts > 0:
            layers["shared_gate_proj_w"] = P(None, None, TP_AXIS)
            layers["shared_up_proj_w"] = P(None, None, TP_AXIS)
            layers["shared_down_proj_w"] = P(None, TP_AXIS, None)
        layers["expert_placement"] = P()
        return out

    # ------------------------------------------------------------------
    # set by the runner when EPLB collection is on (reference per-step
    # load collection, llm_worker_impl.cpp:249-251)
    collect_expert_loads = False

    def _mlp(self, lp: dict, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        out = moe_mlp(
            x,
            lp["router_w"],
            lp["experts_gate_up"],
            lp["experts_down"],
            c.num_experts_per_tok,
            c.norm_topk_prob,
            placement=lp.get("expert_placement"),
            gate_up_scale=lp.get("experts_gate_up_scale"),
            down_scale=lp.get("experts_down_scale"),
            return_counts=self.collect_expert_loads,
            mesh=getattr(self, "mesh", None),
            scoring=c.scoring_func,
            bias=lp.get("router_bias"),
            n_group=c.n_group,
            topk_group=c.topk_group,
        )
        if self.collect_expert_loads:
            out, counts = out
            self._scan_aux = counts
        else:
            self._scan_aux = None
        if c.routed_scaling_factor != 1.0:
            out = out * c.routed_scaling_factor
        if c.n_shared_experts > 0:
            gate = self._linear(lp, "shared_gate_proj_w", x)
            up = self._linear(lp, "shared_up_proj_w", x)
            act = (jax.nn.silu(gate) * up).astype(x.dtype)
            out = out + self._linear(lp, "shared_down_proj_w", act).astype(
                x.dtype
            )
        return out.astype(x.dtype)

    # ------------------------------------------------------------------
    def _run_layers(
        self, params, k_all, v_all, x, positions, slot_mapping, attn_fn,
        post_layer_fn=None,
    ):
        if self.n_dense == 0:
            return super()._run_layers(
                params, k_all, v_all, x, positions, slot_mapping, attn_fn,
                post_layer_fn=post_layer_fn,
            )
        from xllm_tpu.ops.norms import rms_norm

        x, k_all, v_all, _ = self._run_stack(
            params["dense_layers"], 0, x, k_all, v_all, positions, attn_fn,
            lambda lp, h: DenseDecoderModel._mlp(self, lp, h),
            post_layer_fn=post_layer_fn,
        )
        x, k_all, v_all, aux = self._run_stack(
            params["layers"], self.n_dense, x, k_all, v_all, positions,
            attn_fn, self._mlp, post_layer_fn=post_layer_fn,
        )
        self._expert_counts = aux  # [n_moe, E] (None unless collecting)
        self._prenorm_hidden = x
        x = rms_norm(x, params["norm"], self.cfg.rms_norm_eps)
        return x, k_all, v_all
