"""CLIP ViT vision encoder, TPU-native.

Replaces the reference's frozen HF ``CLIPVisionModel``
(src/clip_whisper/models/clip_whisper_model.py:884-902). The reference
flattens video to [B*T, 3, H, W], runs CLIP per frame, and keeps the CLS
token of ``last_hidden_state`` (no post-layernorm) as the per-frame feature
(clip_whisper_model.py:1108-1146). Here the whole clip is one batched call:

    frames [B, T, 3, S, S] -> patchify (one matmul on the MXU, not a conv)
    -> +CLS +learned positions -> pre-LN -> N x pre-LN blocks (quick-gelu)
    -> CLS per frame [B, T, d]  (optionally post-LN'd "pooled" variant)

Numerics match HF ``CLIPVisionModel`` (verified in
tests/test_models_clip.py against a randomly-initialized torch model).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.core.config import ClipConfig
from avsr_tpu.models.layers import (
    Params,
    encoder_block_apply,
    encoder_block_init,
    layer_norm,
    norm_init,
    normal_init,
    quick_gelu,
)


def num_patches(cfg: ClipConfig) -> int:
    return (cfg.image_size // cfg.patch_size) ** 2


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_clip_vit(key: jax.Array, cfg: ClipConfig,
                  dtype: jnp.dtype = jnp.float32) -> Params:
    d = cfg.d_model
    np_ = num_patches(cfg)
    keys = jax.random.split(key, cfg.n_layers + 3)
    return {
        # Patch embedding stored as a matmul kernel [patch*patch*3, d]
        # (torch conv kernel [d, 3, p, p] is converted on load).
        "patch": {"w": normal_init(keys[0], (cfg.patch_size * cfg.patch_size * 3, d),
                                   std=d ** -0.5, dtype=dtype)},
        "cls": normal_init(keys[1], (d,), std=d ** -0.5, dtype=dtype),
        "pos": normal_init(keys[2], (np_ + 1, d), std=0.02, dtype=dtype),
        "ln_pre": norm_init(d, dtype=dtype),
        "blocks": [
            encoder_block_init(keys[3 + i], d, d * cfg.ffn_mult,
                               n_heads=cfg.n_heads, dtype=dtype)
            for i in range(cfg.n_layers)
        ],
        "ln_post": norm_init(d, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def patchify(images: jax.Array, patch: int) -> jax.Array:
    """[N, 3, S, S] -> [N, (S/p)^2, p*p*3] so patch embed is a single matmul.

    Channel-fastest ordering matches the torch conv kernel reshape
    [d, 3, p, p] -> [3*p*p, d] with (c, ph, pw) flattened in that order.
    """
    N, C, S, _ = images.shape
    g = S // patch
    x = images.reshape(N, C, g, patch, g, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)           # [N, g, g, C, p, p]
    return x.reshape(N, g * g, C * patch * patch)


def clip_vit_apply(
    params: Params,
    frames: jax.Array,
    cfg: ClipConfig,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: str = "auto",
    remat: bool = False,
    pool: str = "cls",            # "cls" (ref behavior) | "pooled" | "tokens"
) -> jax.Array:
    """frames [B, T, 3, S, S] (or [N, 3, S, S]) -> per-frame features.

    pool="cls":    [B, T, d]   CLS of last_hidden_state (reference behavior)
    pool="pooled": [B, T, d]   post-layernormed CLS (HF pooler_output)
    pool="tokens": [B, T, P+1, d] all token states
    """
    squeeze_time = frames.ndim == 4
    if squeeze_time:
        frames = frames[:, None]
    B, T = frames.shape[:2]
    flat = frames.reshape(B * T, *frames.shape[2:]).astype(compute_dtype)

    x = patchify(flat, cfg.patch_size)                      # [N, P, ppc]
    x = jnp.matmul(x, params["patch"]["w"].astype(compute_dtype))
    cls = jnp.broadcast_to(params["cls"].astype(compute_dtype),
                           (x.shape[0], 1, cfg.d_model))
    x = jnp.concatenate([cls, x], axis=1)                   # [N, P+1, d]
    x = x + params["pos"].astype(compute_dtype)[None]
    x = layer_norm(params["ln_pre"], x)

    block = functools.partial(encoder_block_apply, n_heads=cfg.n_heads,
                              act=quick_gelu, use_pallas=use_pallas)
    if remat:
        block = jax.checkpoint(block)
    for bp in params["blocks"]:
        x = block(bp, x)

    if pool == "tokens":
        out = x.reshape(B, T, *x.shape[1:])
    elif pool == "pooled":
        out = layer_norm(params["ln_post"], x[:, 0]).reshape(B, T, -1)
    else:
        out = x[:, 0].reshape(B, T, -1)
    return out[:, 0] if squeeze_time else out


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def convert_hf_clip_vision(state_dict: dict[str, Any], cfg: ClipConfig) -> Params:
    """Convert an HF ``CLIPVisionModel`` torch state dict to our pytree."""
    def arr(name: str) -> jnp.ndarray:
        for prefix in ("vision_model.", "clip.vision_model.", ""):
            k = prefix + name
            if k in state_dict:
                t = state_dict[k]
                if hasattr(t, "detach"):   # torch tensor
                    t = np.asarray(t.detach().cpu())
                return jnp.asarray(t)   # tracer-safe (eval_shape dry-run)
        raise KeyError(f"missing weight {name!r}")

    def lin(name: str) -> Params:
        return {"w": arr(name + ".weight").T, "b": arr(name + ".bias")}

    def ln(name: str) -> Params:
        return {"scale": arr(name + ".weight"), "b": arr(name + ".bias")}

    conv = arr("embeddings.patch_embedding.weight")     # [d, 3, p, p]
    d = conv.shape[0]
    patch_w = conv.reshape(d, -1).T                     # [3*p*p, d], (c,ph,pw) order

    blocks = []
    for i in range(cfg.n_layers):
        pre = f"encoder.layers.{i}."
        blocks.append({
            "attn": {
                "q": lin(pre + "self_attn.q_proj"),
                "k": lin(pre + "self_attn.k_proj"),
                "v": lin(pre + "self_attn.v_proj"),
                "o": lin(pre + "self_attn.out_proj"),
            },
            "ln1": ln(pre + "layer_norm1"),
            "fc1": lin(pre + "mlp.fc1"),
            "fc2": lin(pre + "mlp.fc2"),
            "ln2": ln(pre + "layer_norm2"),
        })
    return {
        "patch": {"w": patch_w},
        "cls": arr("embeddings.class_embedding"),
        "pos": arr("embeddings.position_embedding.weight"),
        "ln_pre": ln("pre_layrnorm"),
        "blocks": blocks,
        "ln_post": ln("post_layernorm"),
    }
