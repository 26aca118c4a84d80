"""qwen3-vl vision tower (JAX) with deepstack feature taps.

Counterpart of the reference's qwen3-vl stack (reference
xllm/models/vlm/qwen3_vl.h, qwen3_vl_base.h; oxygen deepstack injection
xllm/models/llm/oxygen.h:36-95) and HF Qwen3VLVisionModel semantics:

- linear patch embed (the Conv3d stride==kernel collapses to a matmul on
  the (C, tp, ps, ps)-ordered patch rows the host processor emits);
- learned absolute position embeddings, bilinearly interpolated from the
  checkpoint's square grid to each image's (h, w) patch grid, permuted
  to the merge-block-major row order;
- 2D rope over full-resolution (row, col) lattice coordinates;
- pre-LN blocks (LayerNorm, standard attention, gelu-tanh MLP), stacked
  on a leading axis under ``lax.scan``;
- the final merger AND one post-shuffle-norm merger per deepstack tap:
  tap outputs feed the LLM's first layers (DeepStack).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Vision3Config:
    depth: int = 4
    hidden_size: int = 64          # tower width
    intermediate_size: int = 128
    num_heads: int = 4
    in_channels: int = 3
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    out_hidden_size: int = 64      # LLM hidden
    num_position_embeddings: int = 2304
    deepstack_visual_indexes: tuple = (0, 1, 2)
    eps: float = 1e-6

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def merge_dim(self) -> int:
        return self.hidden_size * self.spatial_merge_size**2


class Qwen3VisionEncoder:
    def __init__(self, cfg: Vision3Config, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype

    # -- params -----------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        d, md = c.hidden_size, c.merge_dim
        key = iter(jax.random.split(rng, 16))

        def w(*shape, scale=0.02):
            return (
                jax.random.normal(next(key), shape, jnp.float32) * scale
            ).astype(self.dtype)

        def merger():
            return {
                "ln_w": jnp.ones((md,), self.dtype),
                "ln_b": jnp.zeros((md,), self.dtype),
                "fc1_w": w(md, md), "fc1_b": jnp.zeros((md,), self.dtype),
                "fc2_w": w(md, c.out_hidden_size),
                "fc2_b": jnp.zeros((c.out_hidden_size,), self.dtype),
            }

        def blocks():
            n = c.depth

            def bw(*shape, scale=0.02):
                return (
                    jax.random.normal(next(key), (n, *shape), jnp.float32)
                    * scale
                ).astype(self.dtype)

            return {
                "norm1_w": jnp.ones((n, d), self.dtype),
                "norm1_b": jnp.zeros((n, d), self.dtype),
                "norm2_w": jnp.ones((n, d), self.dtype),
                "norm2_b": jnp.zeros((n, d), self.dtype),
                "qkv_w": bw(d, 3 * d), "qkv_b": jnp.zeros((n, 3 * d), self.dtype),
                "proj_w": bw(d, d), "proj_b": jnp.zeros((n, d), self.dtype),
                "fc1_w": bw(d, c.intermediate_size),
                "fc1_b": jnp.zeros((n, c.intermediate_size), self.dtype),
                "fc2_w": bw(c.intermediate_size, d),
                "fc2_b": jnp.zeros((n, d), self.dtype),
            }

        # the final merger's norm acts on the PRE-shuffle width (hidden),
        # deepstack mergers post-shuffle (merged width)
        final = merger()
        final["ln_w"] = jnp.ones((d,), self.dtype)
        final["ln_b"] = jnp.zeros((d,), self.dtype)
        return {
            "patch_embed_w": w(c.patch_dim, d),
            "patch_embed_b": jnp.zeros((d,), self.dtype),
            "pos_embed": w(c.num_position_embeddings, d, scale=0.02),
            "blocks": blocks(),
            "merger": final,
            "ds_mergers": [
                merger() for _ in c.deepstack_visual_indexes
            ],
        }

    def param_shardings(self) -> dict:
        from jax.sharding import PartitionSpec as P

        def rep(tree):
            return jax.tree.map(lambda _: P(), tree,
                                is_leaf=lambda x: x is None)

        # tower is tiny relative to the LM: replicate
        return rep(self.init_shapes())

    def init_shapes(self):
        # helper so shardings can be built without materializing params
        import jax

        return jax.eval_shape(
            lambda: self.init_params(jax.random.key(0))
        )

    # -- host-side position helpers (static per grid shape) ----------------
    def _pos_embed_rows(self, params, grid_t, grid_h, grid_w):
        """Bilinear interpolation of the learned pos table to the (h, w)
        grid, merge-block-major, repeated per t (HF
        fast_pos_embed_interpolate)."""
        c = self.cfg
        side = int(round(c.num_position_embeddings ** 0.5))
        h_idx = np.linspace(0, side - 1, grid_h)
        w_idx = np.linspace(0, side - 1, grid_w)
        h0 = h_idx.astype(np.int64)
        w0 = w_idx.astype(np.int64)
        h1 = np.clip(h0 + 1, None, side - 1)
        w1 = np.clip(w0 + 1, None, side - 1)
        dh = (h_idx - h0)[:, None]
        dw = (w_idx - w0)[None, :]
        tbl = params["pos_embed"].astype(jnp.float32)

        def gather(hi, wi):
            return tbl[jnp.asarray((hi[:, None] * side + wi[None, :]).reshape(-1))]

        pos = (
            gather(h0, w0) * jnp.asarray(((1 - dh) * (1 - dw)).reshape(-1, 1))
            + gather(h0, w1) * jnp.asarray(((1 - dh) * dw).reshape(-1, 1))
            + gather(h1, w0) * jnp.asarray((dh * (1 - dw)).reshape(-1, 1))
            + gather(h1, w1) * jnp.asarray((dh * dw).reshape(-1, 1))
        )  # [h*w, d] row-major
        m = c.spatial_merge_size
        pos = pos.reshape(grid_h // m, m, grid_w // m, m, -1)
        pos = pos.transpose(0, 2, 1, 3, 4).reshape(grid_h * grid_w, -1)
        if grid_t > 1:
            pos = jnp.tile(pos, (grid_t, 1))
        return pos.astype(self.dtype)

    def _rope_cos_sin(self, grid_t, grid_h, grid_w):
        """Full-dim (cos, sin) per patch row from the 2D lattice."""
        c = self.cfg
        m = c.spatial_merge_size
        half = c.head_dim // 2
        quarter = half // 2
        inv = 1.0 / (
            10000.0 ** (np.arange(0, quarter, dtype=np.float32) / quarter)
        )
        rows = np.arange(grid_h).reshape(-1, 1) * np.ones((1, grid_w))
        cols = np.ones((grid_h, 1)) * np.arange(grid_w).reshape(1, -1)

        def blockify(x):
            return (
                x.reshape(grid_h // m, m, grid_w // m, m)
                .transpose(0, 2, 1, 3)
                .reshape(-1)
            )

        r = blockify(rows)[:, None] * inv[None, :]
        cc = blockify(cols)[:, None] * inv[None, :]
        freqs = np.concatenate([r, cc], axis=-1)  # [h*w, half]
        emb = np.concatenate([freqs, freqs], axis=-1)  # full head_dim
        cos, sin = np.cos(emb), np.sin(emb)
        if grid_t > 1:
            cos = np.tile(cos, (grid_t, 1))
            sin = np.tile(sin, (grid_t, 1))
        return jnp.asarray(cos), jnp.asarray(sin)

    # -- forward ----------------------------------------------------------
    def _merge(self, mp, x, post_shuffle: bool):
        c = self.cfg

        def ln(v, w, b):
            vf = v.astype(jnp.float32)
            mu = jnp.mean(vf, axis=-1, keepdims=True)
            var = jnp.var(vf, axis=-1, keepdims=True)
            return (
                (vf - mu) * jax.lax.rsqrt(var + c.eps) * w + b
            ).astype(v.dtype)

        if post_shuffle:
            h = ln(x.reshape(-1, c.merge_dim), mp["ln_w"], mp["ln_b"])
        else:
            h = ln(x, mp["ln_w"], mp["ln_b"]).reshape(-1, c.merge_dim)
        h = jnp.dot(h, mp["fc1_w"]) + mp["fc1_b"]
        h = jax.nn.gelu(h, approximate=False)
        return jnp.dot(h, mp["fc2_w"]) + mp["fc2_b"]

    def encode(
        self,
        params: dict,
        patches: jnp.ndarray,  # [N, patch_dim]
        grid_h: int,
        grid_w: int,
        grid_t: int = 1,
    ):
        """-> (merged embeddings [N/m^2, out_hidden],
        deepstack embeddings [K, N/m^2, out_hidden])."""
        c = self.cfg
        heads, hd = c.num_heads, c.head_dim
        x = (
            jnp.dot(
                patches.astype(self.dtype), params["patch_embed_w"],
                preferred_element_type=jnp.float32,
            )
            + params["patch_embed_b"]
        ).astype(self.dtype)
        x = x + self._pos_embed_rows(params, grid_t, grid_h, grid_w)
        cos, sin = self._rope_cos_sin(grid_t, grid_h, grid_w)
        n = x.shape[0]
        seg_bias = None
        if grid_t > 1:
            seg = jnp.arange(n, dtype=jnp.int32) // (grid_h * grid_w)
            seg_bias = jnp.where(
                seg[:, None] == seg[None, :], 0.0, -jnp.inf
            )[None]

        def ln(v, w, b):
            vf = v.astype(jnp.float32)
            mu = jnp.mean(vf, axis=-1, keepdims=True)
            var = jnp.var(vf, axis=-1, keepdims=True)
            return (
                (vf - mu) * jax.lax.rsqrt(var + c.eps) * w + b
            ).astype(v.dtype)

        def rot(v):
            vf = v.astype(jnp.float32)
            v1, v2 = jnp.split(vf, 2, axis=-1)
            rh = jnp.concatenate([-v2, v1], axis=-1)
            return (vf * cos[:, None, :] + rh * sin[:, None, :]).astype(
                v.dtype
            )

        def block(x, bp):
            h = ln(x, bp["norm1_w"], bp["norm1_b"])
            qkv = (
                jnp.dot(h, bp["qkv_w"], preferred_element_type=jnp.float32)
                + bp["qkv_b"]
            ).astype(x.dtype)
            q, k, v = jnp.split(qkv.reshape(n, 3 * heads, hd), 3, axis=1)
            q, k = rot(q), rot(k)
            scores = jnp.einsum(
                "nhd,mhd->hnm", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            if seg_bias is not None:
                scores = scores + seg_bias
            probs = jax.nn.softmax(scores, axis=-1)
            att = jnp.einsum(
                "hnm,mhd->nhd", probs.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).reshape(n, heads * hd).astype(x.dtype)
            x = x + (
                jnp.dot(att, bp["proj_w"], preferred_element_type=jnp.float32)
                + bp["proj_b"]
            ).astype(x.dtype)
            h = ln(x, bp["norm2_w"], bp["norm2_b"])
            f = (
                jnp.dot(h, bp["fc1_w"], preferred_element_type=jnp.float32)
                + bp["fc1_b"]
            ).astype(jnp.float32)
            f = jax.nn.gelu(f, approximate=True)
            x = x + (
                jnp.dot(
                    f.astype(x.dtype), bp["fc2_w"],
                    preferred_element_type=jnp.float32,
                )
                + bp["fc2_b"]
            ).astype(x.dtype)
            return x

        # deepstack taps force a python loop over blocks (indexes are
        # static config); depth is small (27/32) and the tower runs once
        # per image, so tracing cost is acceptable
        ds_out = []
        blocks = params["blocks"]
        for i in range(c.depth):
            bp = jax.tree.map(lambda a: a[i], blocks)
            x = block(x, bp)
            if i in c.deepstack_visual_indexes:
                k = c.deepstack_visual_indexes.index(i)
                ds_out.append(
                    self._merge(params["ds_mergers"][k], x, post_shuffle=True)
                )
        out = self._merge(params["merger"], x, post_shuffle=False)
        ds = (
            jnp.stack(ds_out)
            if ds_out
            else jnp.zeros((0, out.shape[0], out.shape[1]), out.dtype)
        )
        return out, ds
