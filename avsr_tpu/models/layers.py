"""Shared transformer building blocks for all avsr_tpu models.

Models are *functional*: parameters live in plain nested dicts of jax arrays
(a pytree), built by ``init_*`` functions and consumed by pure ``apply``
functions. This keeps sharding fully explicit — every leaf can be given a
NamedSharding by path rule (avsr_tpu.mesh.sharding) — and avoids framework
magic between the math and pjit.

Dtype policy (RuntimeConfig): params are stored in ``param_dtype`` (f32
master), and apply functions cast to ``compute_dtype`` (bf16 on TPU) at the
matmul boundary; layer norms and softmax statistics stay in f32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def xavier_uniform(key: jax.Array, shape: tuple[int, ...],
                   dtype: jnp.dtype = jnp.float32) -> jax.Array:
    fan_in, fan_out = shape[0], shape[-1]
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def normal_init(key: jax.Array, shape: tuple[int, ...], std: float = 0.02,
                dtype: jnp.dtype = jnp.float32) -> jax.Array:
    return jax.random.normal(key, shape, dtype) * std


def dense_init(key: jax.Array, d_in: int, d_out: int, *, bias: bool = True,
               std: float | None = None,
               dtype: jnp.dtype = jnp.float32) -> Params:
    """Linear layer params: w [d_in, d_out] (+ optional b [d_out])."""
    if std is None:
        w = xavier_uniform(key, (d_in, d_out), dtype)
    else:
        w = normal_init(key, (d_in, d_out), std, dtype)
    p: Params = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def norm_init(dim: int, *, bias: bool = True,
              dtype: jnp.dtype = jnp.float32) -> Params:
    p: Params = {"scale": jnp.ones((dim,), dtype)}
    if bias:
        p["b"] = jnp.zeros((dim,), dtype)
    return p


# ---------------------------------------------------------------------------
# Primitive apply fns
# ---------------------------------------------------------------------------

def dense(p: Params, x: jax.Array, *, dtype: jnp.dtype | None = None) -> jax.Array:
    """x @ w + b, computing in ``dtype`` (default: x.dtype)."""
    dt = dtype or x.dtype
    y = jnp.matmul(x.astype(dt), p["w"].astype(dt))
    if "b" in p:
        y = y + p["b"].astype(dt)
    return y


def layer_norm(p: Params, x: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    """LayerNorm with f32 statistics, output in x.dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(p: Params, x: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    """RMSNorm (llama-style) with f32 statistics."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) gelu — matches torch.nn.GELU default used by Whisper/CLIP-HF."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — CLIP's activation (HF activations.py QuickGELU)."""
    return x * jax.nn.sigmoid(1.702 * x)


def split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    """[B, T, H*D] -> [B, H, T, D]."""
    B, T, _ = x.shape
    return x.reshape(B, T, n_heads, -1).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, T, D] -> [B, T, H*D]."""
    B, H, T, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * D)


# ---------------------------------------------------------------------------
# Multi-head attention block (encoder-style, bidirectional, padding-masked)
# ---------------------------------------------------------------------------

def mha_init(key: jax.Array, d_model: int, *, n_heads: int,
             k_bias: bool = True, dtype: jnp.dtype = jnp.float32) -> Params:
    del n_heads
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": dense_init(kq, d_model, d_model, dtype=dtype),
        "k": dense_init(kk, d_model, d_model, bias=k_bias, dtype=dtype),
        "v": dense_init(kv, d_model, d_model, dtype=dtype),
        "o": dense_init(ko, d_model, d_model, dtype=dtype),
    }


def mha_apply(
    p: Params,
    x: jax.Array,
    *,
    n_heads: int,
    kv: jax.Array | None = None,
    lengths: jax.Array | None = None,
    kv_lengths: jax.Array | None = None,
    kv_valid: jax.Array | None = None,
    causal: bool = False,
    use_pallas: str = "auto",
    mesh=None,
) -> jax.Array:
    """Self- (kv=None) or cross-attention over [B, T, D] activations."""
    from avsr_tpu.ops.attention import attention

    src = x if kv is None else kv
    q = split_heads(dense(p["q"], x), n_heads)
    k = split_heads(dense(p["k"], src), n_heads)
    v = split_heads(dense(p["v"], src), n_heads)
    out = attention(q, k, v, causal=causal, q_lens=lengths,
                    kv_lens=kv_lengths if kv is not None else lengths,
                    kv_valid=kv_valid, use_pallas=use_pallas, mesh=mesh)
    return dense(p["o"], merge_heads(out))


# ---------------------------------------------------------------------------
# Pre-LN encoder block (Whisper/CLIP/ViT-style)
# ---------------------------------------------------------------------------

def encoder_block_init(key: jax.Array, d_model: int, ffn_dim: int, *,
                       n_heads: int, k_bias: bool = True,
                       dtype: jnp.dtype = jnp.float32) -> Params:
    ka, k1, k2 = jax.random.split(key, 3)
    return {
        "attn": mha_init(ka, d_model, n_heads=n_heads, k_bias=k_bias, dtype=dtype),
        "ln1": norm_init(d_model, dtype=dtype),
        "fc1": dense_init(k1, d_model, ffn_dim, dtype=dtype),
        "fc2": dense_init(k2, ffn_dim, d_model, dtype=dtype),
        "ln2": norm_init(d_model, dtype=dtype),
    }


def encoder_block_apply(
    p: Params,
    x: jax.Array,
    *,
    n_heads: int,
    lengths: jax.Array | None = None,
    act=gelu,
    use_pallas: str = "auto",
    mesh=None,
) -> jax.Array:
    h = layer_norm(p["ln1"], x)
    x = x + mha_apply(p["attn"], h, n_heads=n_heads, lengths=lengths,
                      use_pallas=use_pallas, mesh=mesh)
    h = layer_norm(p["ln2"], x)
    x = x + dense(p["fc2"], act(dense(p["fc1"], h)))
    return x


# ---------------------------------------------------------------------------
# Positional encodings
# ---------------------------------------------------------------------------

def sinusoid_position_embedding(length: int, dim: int) -> jax.Array:
    """Whisper-style sinusoidal PE [length, dim] (openai/whisper model.py)."""
    log_timescale = jnp.log(10000.0) / (dim // 2 - 1)
    inv = jnp.exp(-log_timescale * jnp.arange(dim // 2, dtype=jnp.float32))
    t = jnp.arange(length, dtype=jnp.float32)[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(t), jnp.cos(t)], axis=-1)


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def cast_tree(params: Params, dtype: jnp.dtype) -> Params:
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params)
