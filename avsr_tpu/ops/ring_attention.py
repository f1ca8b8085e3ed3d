"""Ring attention: exact attention over a sequence-sharded axis (SP).

The reference's only answer to long sequences is truncation / pooling
(src/clip_whisper/models/clip_whisper_model.py:320-374, 621-707 — SURVEY.md
§5.7); here ``max_seq_len`` becomes a sharding decision instead. Q, K and V
live sharded over the ``sp`` mesh axis ([B, H, T/sp, D] per device); each of
the ``sp`` ring steps computes one blockwise attention against the resident
KV shard and then rotates K/V to the next neighbor with ``ppermute`` over
ICI, combining partial results with the flash-attention online-softmax
recurrence (running max ``m``, normalizer ``l``). Communication overlaps the
next block's compute under XLA's latency-hiding scheduler; memory per device
stays O(T/sp) — no [T, T] materialization, no all-gather of the sequence.

Differentiation: the whole function is plain JAX under shard_map, so
reverse-mode AD derives the backward ring automatically (the ppermute
transposes to the reverse rotation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _ring_block(q, k, v, q_pos0, k_pos0, kv_lens, causal, sm_scale):
    """One blockwise attention: local q [B,H,Tl,D] vs one kv block.

    Returns (out_unnormalized [B,H,Tl,D] f32, m [B,H,Tl,1], l [B,H,Tl,1]).
    Positions are global so causal/padding masks stay exact under sharding.
    GQA via grouped einsum — K/V are never replicated to the query heads
    (a jnp.repeat here would multiply attention HBM traffic every ring
    step; same reasoning as models.llama._gqa_decode_attention).
    """
    B, H, Tq, D = q.shape
    Hkv, Tk = k.shape[1], k.shape[2]
    g = H // Hkv
    qg = q.reshape(B, Hkv, g, Tq, D).astype(jnp.float32) * sm_scale
    s = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k.astype(jnp.float32))
    q_ids = q_pos0 + jnp.arange(Tq)
    k_ids = k_pos0 + jnp.arange(Tk)
    mask = (k_ids[None, :] < kv_lens[:, None])[:, None, None, None, :]
    if causal:
        mask = mask & (q_ids[:, None] >= k_ids[None, :])[None, None, None]
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)                  # [B,Hkv,g,Tq,1]
    p = jnp.exp(s - m)
    p = jnp.where(mask, p, 0.0)                             # kill exp(0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", p, v.astype(jnp.float32))
    return (out.reshape(B, H, Tq, D), m.reshape(B, H, Tq, 1),
            l.reshape(B, H, Tq, 1))


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "sp",
    causal: bool = False,
    kv_lens: jax.Array | None = None,
    sm_scale: float | None = None,
    batch_axes: tuple[str, ...] = ("dcn", "dp", "fsdp", "ep"),
) -> jax.Array:
    """Exact attention with the sequence axis sharded over ``axis``.

    q, k, v: [B, H, T, D] global, H GQA-compatible (H % Hkv == 0); T must be
    divisible by the size of ``axis``. kv_lens: [B] global valid key counts
    (right padding). Returns [B, H, T, D] with the same sequence sharding.
    """
    B, H, T, D = q.shape
    sp = mesh.shape[axis]
    if T % sp != 0:
        raise ValueError(f"seq len {T} not divisible by sp={sp}")
    scale = sm_scale if sm_scale is not None else D ** -0.5
    if kv_lens is None:
        kv_lens = jnp.full((B,), T, jnp.int32)

    qkv_spec = P(batch_axes[0] if len(batch_axes) == 1 else batch_axes,
                 None, axis, None)
    lens_spec = P(batch_axes[0] if len(batch_axes) == 1 else batch_axes)

    def local(q, k, v, lens):
        # local shapes: q [b, H, T/sp, D]; lens [b]
        idx = jax.lax.axis_index(axis)
        Tl = q.shape[2]
        perm = [(i, (i + 1) % sp) for i in range(sp)]  # send kv to next rank

        acc = jnp.zeros(q.shape[:3] + (v.shape[-1],), jnp.float32)
        m = jnp.full(q.shape[:3] + (1,), NEG_INF, jnp.float32)
        l = jnp.zeros(q.shape[:3] + (1,), jnp.float32)
        kblk, vblk, src = k, v, idx
        # sp is small and static: an unrolled ring keeps the loop
        # reverse-differentiable and lets XLA overlap the next ppermute
        # with the current block's compute.
        for i in range(sp):
            bo, bm, bl = _ring_block(
                q, kblk, vblk, idx * Tl, src * Tl, lens, causal, scale)
            m_new = jnp.maximum(m, bm)
            alpha = jnp.exp(m - m_new)
            beta = jnp.exp(bm - m_new)
            acc = acc * alpha + bo * beta
            l = l * alpha + bl * beta
            m = m_new
            if i + 1 < sp:
                kblk, vblk, src = jax.lax.ppermute(
                    (kblk, vblk, src), axis, perm)
        out = acc / jnp.maximum(l, 1e-30)
        # fully-masked rows (padding queries): deterministic zeros
        out = jnp.where(l > 0.0, out, 0.0)
        return out.astype(q.dtype)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, lens_spec),
        out_specs=qkv_spec,
        check_vma=False,
    )(q, k, v, kv_lens)
