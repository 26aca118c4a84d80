"""Diffusion-step caches (FBCache / TaylorSeer / ResidualCache) — in-graph.

Counterpart of the reference DiT cache subsystem
(xllm/core/framework/dit_cache/: dit_cache_impl.h:28 interface,
fbcache.cpp, taylorseer.cpp, fbcache_taylorseer.cpp, residual_cache.cpp,
dit_cache_config.h policies/defaults).

TPU-native redesign: the reference drives the cache from host C++ between
torch module calls (on_before_block / on_after_block callbacks mutating a
TensorMap). Here the whole denoise loop is ONE `lax.scan`, so the cache is
a functional pytree of fixed-shape buffers carried through the scan, and
the skip decision is a traced `lax.cond` — zero host round-trips per step.

Semantics matched to the reference:
- FBCache (fbcache.cpp): compute the first transformer block every step;
  if the relative L1 distance between its hidden-state residual and the
  previous step's is below `residual_diff_threshold` (and past warmup),
  skip the remaining blocks and re-apply the cached full residual.
  is_similar = mean|a-b| / mean|b| < threshold (dit_cache_impl.cpp).
- TaylorSeer (taylorseer.cpp): every `skip_interval_steps`-th step (and
  during warmup) run the full model and update finite-difference
  derivatives dY^k; other steps predict the output with the Taylor
  expansion  Y(t) ≈ Σ_k dY^k · Δ^k / k!  where Δ = steps since the last
  full computation.
- FBCacheTaylorSeer (fbcache_taylorseer.cpp): FBCache's similarity gate
  decides; on skip the residual is *predicted* by a TaylorSeer over the
  residual instead of replayed verbatim.
- ResidualCache (residual_cache.cpp): positional policy — first/last
  `start/end` steps always compute; in between, full compute only every
  `skip_interval_steps`-th step, otherwise replay the cached residual.

All policies share one interface:

    cache = make_dit_cache(cfg, num_inference_steps)
    state = cache.init(img_shape, txt_shape, dtype)
    (img, txt), state = cache.step(state, step_idx, img0, txt0, r0, rest_fn)

where `img0/txt0` are the streams after block 0, `r0` is block 0's image
residual (probe signal), and `rest_fn(img, txt) -> (img, txt)` runs the
remaining blocks. `step` internally branches with `lax.cond`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@dataclass
class DiTCacheConfig:
    """Mirror of dit_cache_config.h (same field names / defaults)."""

    policy: str = "none"  # none|fbcache|taylorseer|fbcache_taylorseer|residual
    warmup_steps: int = 0
    residual_diff_threshold: float = 0.09
    n_derivatives: int = 3
    skip_interval_steps: int = 3
    # residual-cache positional windows (dit_cache_config.h:84-99)
    start_steps: int = 5
    end_steps: int = 5
    # set when the denoise loop runs under Ulysses SP (dit/sp.py): the
    # similarity gate must agree across ranks, so means are pmean'd.
    sp_axis: str | None = None


def _rel_l1(a: jnp.ndarray, b: jnp.ndarray,
            sp_axis: str | None = None) -> jnp.ndarray:
    """is_similar metric (dit_cache_impl.cpp): mean|a-b| / mean|b|."""
    a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
    num = jnp.mean(jnp.abs(a32 - b32))
    denom = jnp.mean(jnp.abs(b32))
    if sp_axis is not None:
        # equal-size token shards -> pmean of local means == global mean
        num = jax.lax.pmean(num, sp_axis)
        denom = jax.lax.pmean(denom, sp_axis)
    return num / jnp.maximum(denom, 1e-12)


class _NoCache:
    """PolicyType::None (dit_non_cache.cpp) — always full compute."""

    def init(self, img_shape, txt_shape, dtype):
        return {"skips": jnp.zeros((), jnp.int32)}

    def step(self, state, step_idx, img0, txt0, r0, rest_fn):
        return rest_fn(img0, txt0), state


class _FBCache:
    def __init__(self, cfg: DiTCacheConfig, num_steps: int):
        self.thresh = cfg.residual_diff_threshold
        self.warmup = cfg.warmup_steps
        self.sp_axis = cfg.sp_axis

    def init(self, img_shape, txt_shape, dtype):
        return {
            "prev_r0": jnp.zeros(img_shape, dtype),
            "img_resid": jnp.zeros(img_shape, dtype),
            "txt_resid": jnp.zeros(txt_shape, dtype),
            "valid": jnp.zeros((), jnp.bool_),
            "skips": jnp.zeros((), jnp.int32),
        }

    def _gate(self, state, step_idx, r0):
        sim = _rel_l1(r0, state["prev_r0"], self.sp_axis) < self.thresh
        return state["valid"] & sim & (step_idx >= self.warmup)

    def step(self, state, step_idx, img0, txt0, r0, rest_fn):
        use = self._gate(state, step_idx, r0)

        def reuse(_):
            return ((img0 + state["img_resid"], txt0 + state["txt_resid"]),
                    {**state, "prev_r0": r0,
                     "skips": state["skips"] + 1})

        def compute(_):
            img, txt = rest_fn(img0, txt0)
            return ((img, txt),
                    {**state,
                     "prev_r0": r0,
                     "img_resid": img - img0,
                     "txt_resid": txt - txt0,
                     "valid": jnp.ones((), jnp.bool_)})

        return jax.lax.cond(use, reuse, compute, None)


class _TaylorStack:
    """Fixed-shape finite-difference stack for in-graph TaylorSeer.

    Buffers: dY [K+1, *shape] (0th..Kth divided differences at the last
    full step), valid [K+1], last_full (step index). Matches
    taylorseer.cpp's approximate_derivative/approximate_value but with
    static shapes so it lives inside `lax.scan`.
    """

    def __init__(self, n_derivatives: int):
        self.k = n_derivatives

    def init(self, shape, dtype):
        return {
            "dY": jnp.zeros((self.k + 1,) + tuple(shape), dtype),
            "dY_valid": jnp.zeros((self.k + 1,), jnp.bool_),
            "last_full": jnp.array(-1, jnp.int32),
        }

    def update(self, st, y, step_idx):
        """Full computation observed: refresh divided differences.

        window = steps since previous full step (taylorseer.cpp uses the
        elapsed step distance as the difference denominator).
        """
        window = jnp.maximum(step_idx - st["last_full"], 1).astype(y.dtype)
        new_dY = [y]
        new_valid = [jnp.ones((), jnp.bool_)]
        for i in range(self.k):
            d = (new_dY[i] - st["dY"][i]) / window
            new_dY.append(d)
            new_valid.append(st["dY_valid"][i])
        return {
            "dY": jnp.stack(new_dY),
            "dY_valid": jnp.stack(new_valid),
            "last_full": step_idx.astype(jnp.int32)
            if hasattr(step_idx, "astype") else jnp.array(step_idx, jnp.int32),
        }

    def predict(self, st, step_idx):
        """Taylor expansion at distance Δ = step_idx - last_full."""
        dt = (step_idx - st["last_full"]).astype(st["dY"].dtype)
        out = jnp.zeros_like(st["dY"][0])
        for i in range(self.k + 1):
            term = st["dY"][i] * (dt ** i) / math.factorial(i)
            out = out + jnp.where(st["dY_valid"][i], term,
                                  jnp.zeros_like(term))
        return out


class _TaylorSeer:
    """Interval-gated Taylor prediction of the FULL module output."""

    def __init__(self, cfg: DiTCacheConfig, num_steps: int):
        self.warmup = cfg.warmup_steps
        self.interval = max(cfg.skip_interval_steps, 1)
        self.stack = _TaylorStack(cfg.n_derivatives)
        self.num_steps = num_steps

    def init(self, img_shape, txt_shape, dtype):
        return {
            "img": self.stack.init(img_shape, dtype),
            "txt": self.stack.init(txt_shape, dtype),
            "skips": jnp.zeros((), jnp.int32),
        }

    def _full_step(self, step_idx):
        # taylorseer.cpp: full compute during warmup, on every
        # skip_interval boundary, and on the final step (quality guard).
        return ((step_idx < jnp.maximum(self.warmup, 1))
                | (step_idx % self.interval == 0)
                | (step_idx == self.num_steps - 1))

    def step(self, state, step_idx, img0, txt0, r0, rest_fn):
        full = self._full_step(step_idx)
        step_idx = jnp.asarray(step_idx, jnp.int32)

        def compute(_):
            img, txt = rest_fn(img0, txt0)
            return ((img, txt),
                    {"img": self.stack.update(state["img"], img, step_idx),
                     "txt": self.stack.update(state["txt"], txt, step_idx),
                     "skips": state["skips"]})

        def approx(_):
            img = self.stack.predict(state["img"], step_idx)
            txt = self.stack.predict(state["txt"], step_idx)
            return ((img, txt), {**state, "skips": state["skips"] + 1})

        return jax.lax.cond(full, compute, approx, None)


class _FBCacheTaylorSeer(_FBCache):
    """FBCache gate + TaylorSeer-predicted residual (fbcache_taylorseer.cpp)."""

    def __init__(self, cfg: DiTCacheConfig, num_steps: int):
        super().__init__(cfg, num_steps)
        self.stack = _TaylorStack(cfg.n_derivatives)

    def init(self, img_shape, txt_shape, dtype):
        return {
            "prev_r0": jnp.zeros(img_shape, dtype),
            "img_taylor": self.stack.init(img_shape, dtype),
            "txt_taylor": self.stack.init(txt_shape, dtype),
            "valid": jnp.zeros((), jnp.bool_),
            "skips": jnp.zeros((), jnp.int32),
        }

    def step(self, state, step_idx, img0, txt0, r0, rest_fn):
        use = self._gate(state, step_idx, r0)
        step_idx = jnp.asarray(step_idx, jnp.int32)

        def reuse(_):
            ir = self.stack.predict(state["img_taylor"], step_idx)
            tr = self.stack.predict(state["txt_taylor"], step_idx)
            return ((img0 + ir, txt0 + tr),
                    {**state, "prev_r0": r0, "skips": state["skips"] + 1})

        def compute(_):
            img, txt = rest_fn(img0, txt0)
            return ((img, txt),
                    {**state,
                     "prev_r0": r0,
                     "img_taylor": self.stack.update(
                         state["img_taylor"], img - img0, step_idx),
                     "txt_taylor": self.stack.update(
                         state["txt_taylor"], txt - txt0, step_idx),
                     "valid": jnp.ones((), jnp.bool_)})

        return jax.lax.cond(use, reuse, compute, None)


class _ResidualCache:
    """Positional skip policy (residual_cache.cpp): compute the first
    `start_steps` and last `end_steps` fully; in the middle compute only
    every `skip_interval_steps`-th step, else replay the cached residual."""

    def __init__(self, cfg: DiTCacheConfig, num_steps: int):
        self.start = cfg.start_steps
        self.end = cfg.end_steps
        self.interval = max(cfg.skip_interval_steps, 1)
        self.num_steps = num_steps

    def init(self, img_shape, txt_shape, dtype):
        return {
            "img_resid": jnp.zeros(img_shape, dtype),
            "txt_resid": jnp.zeros(txt_shape, dtype),
            "valid": jnp.zeros((), jnp.bool_),
            "skips": jnp.zeros((), jnp.int32),
        }

    def step(self, state, step_idx, img0, txt0, r0, rest_fn):
        in_window = ((step_idx >= self.start)
                     & (step_idx < self.num_steps - self.end))
        skip = in_window & (step_idx % self.interval != 0) & state["valid"]

        def reuse(_):
            return ((img0 + state["img_resid"], txt0 + state["txt_resid"]),
                    {**state, "skips": state["skips"] + 1})

        def compute(_):
            img, txt = rest_fn(img0, txt0)
            return ((img, txt),
                    {**state,
                     "img_resid": img - img0,
                     "txt_resid": txt - txt0,
                     "valid": jnp.ones((), jnp.bool_)})

        return jax.lax.cond(skip, reuse, compute, None)


_POLICIES = {
    "none": _NoCache,
    "fbcache": _FBCache,
    "taylorseer": _TaylorSeer,
    "fbcache_taylorseer": _FBCacheTaylorSeer,
    "residual": _ResidualCache,
}


def make_dit_cache(cfg: DiTCacheConfig, num_inference_steps: int):
    """create_dit_cache (dit_cache_impl.cpp) analog."""
    try:
        cls = _POLICIES[cfg.policy]
    except KeyError:
        raise ValueError(
            f"unknown dit cache policy {cfg.policy!r}; "
            f"one of {sorted(_POLICIES)}") from None
    if cls is _NoCache:
        return cls()
    return cls(cfg, num_inference_steps)
