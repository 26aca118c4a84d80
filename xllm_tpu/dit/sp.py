"""Ulysses-style sequence parallelism for DiT joint attention.

Counterpart of the reference's DiT parallel linear layers
(xllm/models/dit/utils/dit_parallel_linear.h:35-50,333-350,445-460 —
all2all scatter-heads / gather-seq around attention) and the DiT
parallel-group config (parallel_args.h:91-106).

TPU-native: one `lax.all_to_all` over the `sp` mesh axis rides the ICI.
Layout contract (established by the pipeline's shard_map):

- image tokens are sharded contiguously on the sequence dim — rank r
  holds tokens [r*Nl, (r+1)*Nl);
- text tokens are replicated on every rank;
- RoPE is applied BEFORE the all2all (rope is per-token, so each rank
  rotates its own tokens with its own position slice — the head shuffle
  afterwards does not disturb it).

ulysses_attend:
  in  : q/k/v [B, T+Nl, H, hd] (T text tokens replicated, Nl local image)
  1.  all2all image q/k/v: split heads H → s groups, gather sequence
      → [B, N, H/s, hd] (full sequence, head shard)
  2.  slice this rank's head group from the replicated text q/k/v
  3.  full softmax attention over the joint [T+N] sequence
  4.  reverse: text output all-gathers heads; image output all2all's back
  out : [B, T+Nl, H, hd]
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def ulysses_attend(q, k, v, txt_len: int, axis: str):
    s = jax.lax.axis_size(axis)
    b, seq, h, hd = q.shape
    assert h % s == 0, f"num_heads {h} not divisible by sp={s}"
    hl = h // s
    rank = jax.lax.axis_index(axis)

    def split(x):
        return x[:, :txt_len], x[:, txt_len:]

    qt, qi = split(q)
    kt, ki = split(k)
    vt, vi = split(v)

    # scatter heads / gather sequence for the image stream
    def a2a_fwd(x):  # [B, Nl, H, hd] -> [B, N, H/s, hd]
        return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                                  tiled=True)

    qi, ki, vi = a2a_fwd(qi), a2a_fwd(ki), a2a_fwd(vi)

    # local head group of the replicated text stream
    def head_slice(x):
        return jax.lax.dynamic_slice_in_dim(x, rank * hl, hl, axis=2)

    qt, kt, vt = head_slice(qt), head_slice(kt), head_slice(vt)

    qj = jnp.concatenate([qt, qi], 1)
    kj = jnp.concatenate([kt, ki], 1)
    vj = jnp.concatenate([vt, vi], 1)

    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum("bshd,bthd->bhst", qj, kj) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(qj.dtype)
    oj = jnp.einsum("bhst,bthd->bshd", probs, vj)

    ot, oi = oj[:, :txt_len], oj[:, txt_len:]
    # image: gather heads / scatter sequence (inverse all2all)
    oi = jax.lax.all_to_all(oi, axis, split_axis=1, concat_axis=2, tiled=True)
    # text: reassemble all heads on every rank
    ot = jax.lax.all_gather(ot, axis, axis=2, tiled=True)
    return jnp.concatenate([ot, oi], 1)
