"""Whisper audio encoder, TPU-native.

Replaces the reference's frozen HF ``WhisperModel.encoder``
(src/clip_whisper/models/clip_whisper_model.py:864-882, encode_audio
:1067-1106) with a functional JAX implementation:

    log-mel [B, n_mels, T] --conv1(gelu)--> [B, d, T] --conv2(s2, gelu)-->
    [B, d, T/2] --(+ sinusoidal PE)--> N x pre-LN transformer blocks --> LN

Matches HF ``transformers.WhisperModel`` encoder numerics (k_proj has no
bias, exact-erf gelu, learned-but-sinusoid-initialized positions); verified
by tests/test_models_whisper.py against a randomly-initialized torch model.

Variable-length audio is first-class: callers pass mel-frame lengths and get
back feature lengths (ceil(T/2) after the stride-2 conv); attention masks
padding via the shared ops.attention path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.core.config import WhisperConfig
from avsr_tpu.models.layers import (
    Params,
    dense_init,
    encoder_block_apply,
    encoder_block_init,
    gelu,
    layer_norm,
    norm_init,
    sinusoid_position_embedding,
)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_whisper_encoder(key: jax.Array, cfg: WhisperConfig,
                         dtype: jnp.dtype = jnp.float32) -> Params:
    d = cfg.d_model
    keys = jax.random.split(key, cfg.n_layers + 3)
    fan1 = cfg.n_mels * 3
    fan2 = d * 3
    params: Params = {
        "conv1": {
            "w": jax.random.normal(keys[0], (d, cfg.n_mels, 3), dtype) * fan1 ** -0.5,
            "b": jnp.zeros((d,), dtype),
        },
        "conv2": {
            "w": jax.random.normal(keys[1], (d, d, 3), dtype) * fan2 ** -0.5,
            "b": jnp.zeros((d,), dtype),
        },
        "pos": sinusoid_position_embedding(cfg.max_source_positions, d).astype(dtype),
        "blocks": [
            encoder_block_init(keys[2 + i], d, d * cfg.ffn_mult,
                               n_heads=cfg.n_heads, k_bias=False, dtype=dtype)
            for i in range(cfg.n_layers)
        ],
        "ln_post": norm_init(d, dtype=dtype),
    }
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _conv1d(p: Params, x: jax.Array, *, stride: int = 1) -> jax.Array:
    """[B, C_in, T] -> [B, C_out, T'] with kernel [C_out, C_in, K], pad=1."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + p["b"].astype(x.dtype)[None, :, None]


def whisper_encoder_apply(
    params: Params,
    mel: jax.Array,
    cfg: WhisperConfig,
    *,
    mel_lengths: jax.Array | None = None,
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: str = "auto",
    remat: bool = False,
    mesh=None,
) -> tuple[jax.Array, jax.Array]:
    """mel [B, n_mels, T] -> (features [B, ceil(T/2), d], feat_lengths [B])."""
    B, _, T = mel.shape
    x = mel.astype(compute_dtype)
    x = gelu(_conv1d(params["conv1"], x))
    x = gelu(_conv1d(params["conv2"], x, stride=2))     # [B, d, T//2]
    x = jnp.swapaxes(x, 1, 2)                           # [B, Tf, d]
    Tf = x.shape[1]
    x = x + params["pos"][:Tf].astype(compute_dtype)[None]

    if mel_lengths is None:
        feat_lengths = jnp.full((B,), Tf, jnp.int32)
    else:
        feat_lengths = ((mel_lengths.astype(jnp.int32) + 1) // 2).clip(0, Tf)

    # Align the width to the flash kernel's sublane tile (16) ONCE — e.g.
    # 10 s audio gives Tf=500, which every block would otherwise pad to 512
    # and slice back (2 copies/layer, 24 layers). Rows past feat_lengths
    # are masked in attention; LN/MLP on zero rows is finite and sliced off
    # after the stack.
    pad_t = -Tf % 16
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))

    block = functools.partial(encoder_block_apply, n_heads=cfg.n_heads,
                              lengths=feat_lengths, act=gelu,
                              use_pallas=use_pallas, mesh=mesh)
    if remat:
        block = jax.checkpoint(block, static_argnums=())
    for bp in params["blocks"]:
        x = block(bp, x)
    if pad_t:
        x = x[:, :Tf]
    x = layer_norm(params["ln_post"], x)
    return x, feat_lengths


# ---------------------------------------------------------------------------
# HF weight conversion (torch state_dict -> our pytree)
# ---------------------------------------------------------------------------

def convert_hf_whisper_encoder(state_dict: dict[str, Any],
                               cfg: WhisperConfig) -> Params:
    """Convert an HF ``WhisperModel`` (or encoder-only) torch state dict.

    Accepts keys with or without the ``model.encoder.`` / ``encoder.`` prefix.
    Linear weights [out, in] are transposed to our [in, out] layout; conv
    kernels keep torch's [out, in, k].
    """
    def arr(name: str) -> jnp.ndarray:
        for prefix in ("model.encoder.", "encoder.", ""):
            k = prefix + name
            if k in state_dict:
                t = state_dict[k]
                if hasattr(t, "detach"):   # torch tensor
                    t = np.asarray(t.detach().cpu())
                return jnp.asarray(t)   # tracer-safe (eval_shape dry-run)
        raise KeyError(f"missing weight {name!r}")

    def lin(name: str, bias: bool = True) -> Params:
        p: Params = {"w": arr(name + ".weight").T}
        if bias:
            p["b"] = arr(name + ".bias")
        return p

    def ln(name: str) -> Params:
        return {"scale": arr(name + ".weight"), "b": arr(name + ".bias")}

    blocks = []
    for i in range(cfg.n_layers):
        pre = f"layers.{i}."
        blocks.append({
            "attn": {
                "q": lin(pre + "self_attn.q_proj"),
                "k": lin(pre + "self_attn.k_proj", bias=False),
                "v": lin(pre + "self_attn.v_proj"),
                "o": lin(pre + "self_attn.out_proj"),
            },
            "ln1": ln(pre + "self_attn_layer_norm"),
            "fc1": lin(pre + "fc1"),
            "fc2": lin(pre + "fc2"),
            "ln2": ln(pre + "final_layer_norm"),
        })
    return {
        "conv1": {"w": arr("conv1.weight"), "b": arr("conv1.bias")},
        "conv2": {"w": arr("conv2.weight"), "b": arr("conv2.bias")},
        "pos": arr("embed_positions.weight"),
        "blocks": blocks,
        "ln_post": ln("layer_norm"),
    }
