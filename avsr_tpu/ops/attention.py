"""Attention ops: XLA reference + Pallas TPU flash attention.

The reference delegates attention to torch SDPA inside HF modules
(src/utils/setup.py:148-150); here attention is a first-class op with

  * `mha_reference` — masked multi-head attention in pure XLA. Used on CPU,
    as the numerics oracle for the kernel tests, and as the fallback when
    shapes don't tile.
  * `flash_attention` — a Pallas TPU kernel: grid over (batch, q-heads,
    q-blocks), K/V resident in VMEM per (batch, kv-head), online-softmax
    streaming over K/V blocks in fp32 with the MXU doing both matmuls.
    Supports causal masking, per-sequence valid lengths (padding), and GQA
    (q-head -> kv-head via BlockSpec index mapping, no KV materialization).

All shapes are [batch, heads, seq, head_dim].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# XLA reference
# ---------------------------------------------------------------------------

def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    q_lens: jax.Array | None = None,
    kv_lens: jax.Array | None = None,
    kv_valid: jax.Array | None = None,
    sm_scale: float | None = None,
) -> jax.Array:
    """Masked MHA in XLA. q: [B,H,Tq,D]; k,v: [B,Hkv,Tk,D] with H % Hkv == 0.

    ``kv_valid`` [B, Tk] bool masks arbitrary key positions (e.g. padding in
    the middle of a concatenated audio+video stream); ``kv_lens`` is the
    right-padding special case.
    """
    B, H, Tq, D = q.shape
    Hkv = k.shape[1]
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    scale = sm_scale if sm_scale is not None else D ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    Tk = k.shape[2]
    mask = jnp.ones((B, 1, Tq, Tk), dtype=bool)
    if causal:
        cm = jnp.tril(jnp.ones((Tq, Tk), dtype=bool), k=Tk - Tq)
        mask &= cm[None, None]
    if kv_lens is not None:
        mask &= (jnp.arange(Tk)[None, :] < kv_lens[:, None])[:, None, None, :]
    if kv_valid is not None:
        mask &= kv_valid[:, None, None, :]
    if q_lens is not None:
        mask &= (jnp.arange(Tq)[None, :] < q_lens[:, None])[:, None, :, None]
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    # Rows with no valid key (fully padded queries) become uniform after
    # softmax-over--inf; zero them for determinism.
    any_valid = jnp.any(mask, axis=-1, keepdims=True)
    p = jnp.where(any_valid, p, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _flash_kernel(
    lens_ref,   # SMEM [B, 2] int32 (unblocked): (q_len, kv_len) per batch row
    q_ref,      # VMEM [1, 1, block_q, D]
    k_ref,      # VMEM [1, 1, Tk, D]
    v_ref,      # VMEM [1, 1, Tk, D]
    o_ref,      # VMEM [1, 1, block_q, D]
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    kv_seq: int,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    q_start = qi * block_q
    kv_len = lens_ref[b, 1]

    q = q_ref[0, 0].astype(jnp.float32) * sm_scale      # [bq, D]
    q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    num_kv_blocks = pl.cdiv(kv_seq, block_k)
    if causal:
        # Only blocks intersecting the causal triangle for this q block.
        last_needed = q_start + block_q  # exclusive kv bound
        num_kv_blocks = jnp.minimum(num_kv_blocks,
                                    pl.cdiv(last_needed, block_k))

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bq, bk]
        kv_ids = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = kv_ids < kv_len
        if causal:
            mask &= q_ids >= kv_ids
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    init = (
        jnp.zeros((block_q, q.shape[-1]), jnp.float32),
        jnp.full((block_q, 1), NEG_INF, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
    )
    acc, _, l = jax.lax.fori_loop(0, num_kv_blocks, body, init)
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    q_lens: jax.Array | None = None,
    kv_lens: jax.Array | None = None,
    sm_scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Pallas flash attention. q: [B,H,Tq,D]; k,v: [B,Hkv,Tk,D]."""
    B, H, Tq, D = q.shape
    Hkv, Tk = k.shape[1], k.shape[2]
    assert H % Hkv == 0, (H, Hkv)
    group = H // Hkv
    scale = sm_scale if sm_scale is not None else D ** -0.5

    block_q = min(block_q, Tq)
    block_k = min(block_k, Tk)
    if Tq % block_q or Tk % block_k:
        # Non-tiling shapes: fall back (call sites pad to bucket sizes).
        return mha_reference(q, k, v, causal=causal, q_lens=q_lens,
                             kv_lens=kv_lens, sm_scale=sm_scale)

    if q_lens is None:
        q_lens = jnp.full((B,), Tq, jnp.int32)
    if kv_lens is None:
        kv_lens = jnp.full((B,), Tk, jnp.int32)
    lens = jnp.stack([q_lens.astype(jnp.int32), kv_lens.astype(jnp.int32)],
                     axis=-1)  # [B, 2]

    grid = (B, H, Tq // block_q)
    kernel = functools.partial(
        _flash_kernel, sm_scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, kv_seq=Tk)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lens: whole [B,2] array
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk, D), lambda b, h, i: (b, h // group, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk, D), lambda b, h, i: (b, h // group, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tq * Tk * D,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=B * H * Tq * Tk,
        ),
    )(lens, q, k, v)
    return out


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    q_lens: jax.Array | None = None,
    kv_lens: jax.Array | None = None,
    kv_valid: jax.Array | None = None,
    sm_scale: float | None = None,
    use_pallas: str = "auto",
) -> jax.Array:
    """Pick the Pallas kernel on TPU, XLA reference elsewhere."""
    if use_pallas == "never":
        on_tpu = False
    elif use_pallas == "always":
        on_tpu = True
    else:
        on_tpu = jax.default_backend() not in ("cpu", "METAL")
    # The kernel wants head_dim padded to lanes, seqs tiling into blocks, and
    # right-padding-only masks; mha_reference handles everything else.
    D = q.shape[-1]
    if (on_tpu and kv_valid is None and D % 128 == 0
            and q.shape[2] >= 128 and k.shape[2] >= 128):
        return flash_attention(q, k, v, causal=causal, q_lens=q_lens,
                               kv_lens=kv_lens, sm_scale=sm_scale)
    return mha_reference(q, k, v, causal=causal, q_lens=q_lens,
                         kv_lens=kv_lens, kv_valid=kv_valid, sm_scale=sm_scale)
