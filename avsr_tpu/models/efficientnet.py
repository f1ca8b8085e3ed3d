"""EfficientNet video encoder, TPU-native.

The reference declares ``video_encoder: efficientnet``
(src/utils/config.py:53-56) but only ever builds CLIP — SURVEY.md §2.5
stretch scope. First-class here via ``model.video_encoder``: each frame runs
the MBConv trunk and the pooled top embedding is that frame's feature, the
same [B, T, d] contract as CLIP/ResNet.

Matches HF ``transformers.EfficientNetModel`` numerics (google/efficientnet-b*),
including its TF-style asymmetric padding: the stem zero-pads (0,1,0,1) and
stride-2 depthwise convs pad (k//2-1, k//2) per side before a VALID conv.
Like the ResNet trunk, BatchNorm runs in inference mode from running stats
(the reference always freezes its vision encoder; frozen-BN is standard when
fine-tuning anyway). Stochastic depth (drop_connect) is an inference no-op.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.core.config import EfficientNetConfig
from avsr_tpu.models.layers import Params

# ---------------------------------------------------------------------------
# Static block plan (mirrors HF EfficientNetEncoder.__init__)
# ---------------------------------------------------------------------------


def round_filters(cfg: EfficientNetConfig, num_channels: int) -> int:
    """Width-multiplier channel rounding (HF modeling_efficientnet)."""
    divisor = cfg.depth_divisor
    num_channels *= cfg.width_coefficient
    new_dim = max(divisor, int(num_channels + divisor / 2) // divisor * divisor)
    if new_dim < 0.9 * num_channels:
        new_dim += divisor
    return int(new_dim)


class BlockPlan(NamedTuple):
    in_dim: int
    out_dim: int
    stride: int
    kernel: int
    expand_ratio: int
    id_skip: bool          # True on the first block of a stage: no residual
    adjust_padding: bool   # asymmetric (k//2-1, k//2) pad for stride 2


def block_plan(cfg: EfficientNetConfig) -> list[BlockPlan]:
    def round_repeats(r: int) -> int:
        return int(math.ceil(cfg.depth_coefficient * r))

    plans: list[BlockPlan] = []
    num = 0
    for i in range(len(cfg.in_channels)):
        in_dim = round_filters(cfg, cfg.in_channels[i])
        out_dim = round_filters(cfg, cfg.out_channels[i])
        for j in range(round_repeats(cfg.num_block_repeats[i])):
            plans.append(BlockPlan(
                in_dim=out_dim if j > 0 else in_dim,
                out_dim=out_dim,
                stride=1 if j > 0 else cfg.strides[i],
                kernel=cfg.kernel_sizes[i],
                expand_ratio=cfg.expand_ratios[i],
                id_skip=j == 0,
                adjust_padding=num not in cfg.depthwise_padding,
            ))
            num += 1
    return plans


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _conv_init(key: jax.Array, shape: tuple[int, ...],
               dtype: jnp.dtype) -> jnp.ndarray:
    fan_in = int(np.prod(shape[1:]))
    return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / max(fan_in, 1))


def _bn_init(c: int, dtype: jnp.dtype) -> Params:
    return {"scale": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def init_efficientnet(key: jax.Array, cfg: EfficientNetConfig,
                      dtype: jnp.dtype = jnp.float32) -> Params:
    plans = block_plan(cfg)
    keys = jax.random.split(key, 2 + 4 * len(plans))
    stem_dim = round_filters(cfg, 32)
    params: Params = {
        "stem": {"conv": {"w": _conv_init(keys[0], (stem_dim, 3, 3, 3), dtype)},
                 "bn": _bn_init(stem_dim, dtype)},
        "blocks": [],
    }
    ki = 1
    for p in plans:
        exp = p.in_dim * p.expand_ratio
        dim_se = max(1, int(p.in_dim * cfg.squeeze_expansion_ratio))
        b: Params = {}
        if p.expand_ratio != 1:
            b["expand"] = {
                "conv": {"w": _conv_init(keys[ki], (exp, p.in_dim, 1, 1), dtype)},
                "bn": _bn_init(exp, dtype)}
        b["dw"] = {
            "conv": {"w": _conv_init(keys[ki + 1],
                                     (exp, 1, p.kernel, p.kernel), dtype)},
            "bn": _bn_init(exp, dtype)}
        b["se"] = {
            "reduce": {"w": _conv_init(keys[ki + 2], (dim_se, exp, 1, 1), dtype),
                       "b": jnp.zeros((dim_se,), dtype)},
            "expand": {"w": _conv_init(keys[ki + 3], (exp, dim_se, 1, 1), dtype),
                       "b": jnp.zeros((exp,), dtype)}}
        b["project"] = {
            "conv": {"w": _conv_init(jax.random.fold_in(keys[ki], 7),
                                     (p.out_dim, exp, 1, 1), dtype)},
            "bn": _bn_init(p.out_dim, dtype)}
        params["blocks"].append(b)
        ki += 4
    top = round_filters(cfg, 1280)
    # HF hardcodes top_conv to round_filters(1280) while top_bn uses
    # hidden_dim — every real b* checkpoint keeps them equal, and the model
    # is inconsistent otherwise, so enforce it here.
    assert top == cfg.hidden_dim, (
        f"efficientnet.hidden_dim must equal round_filters(1280)={top}, "
        f"got {cfg.hidden_dim}")
    params["top"] = {
        "conv": {"w": _conv_init(keys[ki], (top, plans[-1].out_dim, 1, 1),
                                 dtype)},
        "bn": _bn_init(cfg.hidden_dim, dtype)}
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _bn(p: Params, x: jax.Array, eps: float = 1e-3) -> jax.Array:
    """Inference-mode BatchNorm (HF batch_norm_eps defaults to 1e-3)."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    shift = (p["b"].astype(jnp.float32)
             - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32)
             * inv).astype(x.dtype)
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def _conv(w: jax.Array, x: jax.Array, *, stride: int = 1,
          padding="SAME", groups: int = 1) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=padding, feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _block(b: Params, x: jax.Array, p: BlockPlan) -> jax.Array:
    inputs = x
    if p.expand_ratio != 1:
        x = jax.nn.silu(_bn(b["expand"]["bn"], _conv(b["expand"]["conv"]["w"], x)))
    exp = x.shape[1]
    # Depthwise: TF-style pad for stride 2, SAME for stride 1.
    if p.stride == 2:
        k = p.kernel
        lo, hi = (k // 2 - 1, k // 2) if p.adjust_padding else (k // 2, k // 2)
        pad = ((lo, hi), (lo, hi))
    else:
        pad = "SAME"
    x = _conv(b["dw"]["conv"]["w"], x, stride=p.stride, padding=pad, groups=exp)
    x = jax.nn.silu(_bn(b["dw"]["bn"], x))
    # Squeeze-excite over the expanded features.
    s = jnp.mean(x, axis=(2, 3), keepdims=True)
    s = jax.nn.silu(_conv(b["se"]["reduce"]["w"], s)
                    + b["se"]["reduce"]["b"].astype(x.dtype)[None, :, None, None])
    s = jax.nn.sigmoid(_conv(b["se"]["expand"]["w"], s)
                       + b["se"]["expand"]["b"].astype(x.dtype)[None, :, None, None])
    x = x * s
    x = _bn(b["project"]["bn"], _conv(b["project"]["conv"]["w"], x))
    if p.stride == 1 and not p.id_skip:
        x = x + inputs          # drop_connect is identity at inference
    return x


def _trunk(params: Params, x: jax.Array, cfg: EfficientNetConfig) -> jax.Array:
    """[N, 3, S, S] -> pooled [N, hidden_dim]."""
    x = _conv(params["stem"]["conv"]["w"], x, stride=2,
              padding=((0, 1), (0, 1)))          # ZeroPad2d(0,1,0,1) + VALID
    x = jax.nn.silu(_bn(params["stem"]["bn"], x))
    for b, p in zip(params["blocks"], block_plan(cfg)):
        x = _block(b, x, p)
    x = jax.nn.silu(_bn(params["top"]["bn"], _conv(params["top"]["conv"]["w"], x)))
    return jnp.mean(x, axis=(2, 3))


def efficientnet_apply(
    params: Params,
    frames: jax.Array,
    cfg: EfficientNetConfig,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: str = "auto",
    remat: bool = False,
) -> jax.Array:
    """frames [B, T, 3, S, S] (or [N, 3, S, S]) -> per-frame features [B, T, d]."""
    del use_pallas  # conv trunk: XLA path only
    squeeze_time = frames.ndim == 4
    if squeeze_time:
        frames = frames[:, None]
    B, T = frames.shape[:2]
    flat = frames.reshape(B * T, *frames.shape[2:]).astype(compute_dtype)
    trunk = jax.checkpoint(_trunk, static_argnums=(2,)) if remat else _trunk
    pooled = trunk(params, flat, cfg)
    out = pooled.reshape(B, T, -1)
    return out[:, 0] if squeeze_time else out


# ---------------------------------------------------------------------------
# HF weight conversion (torch state_dict -> our pytree)
# ---------------------------------------------------------------------------


def convert_hf_efficientnet(state_dict: dict[str, Any],
                            cfg: EfficientNetConfig) -> Params:
    """Convert an HF ``EfficientNetModel`` (google/efficientnet-b*) state dict."""
    def arr(name: str) -> jnp.ndarray:
        for prefix in ("efficientnet.", ""):
            k = prefix + name
            if k in state_dict:
                t = state_dict[k]
                if hasattr(t, "detach"):   # torch tensor
                    t = np.asarray(t.detach().cpu())
                return jnp.asarray(t)   # tracer-safe (eval_shape dry-run)
        raise KeyError(f"missing weight {name!r}")

    def bn(name: str) -> Params:
        return {"scale": arr(name + ".weight"), "b": arr(name + ".bias"),
                "mean": arr(name + ".running_mean"),
                "var": arr(name + ".running_var")}

    blocks = []
    for i, p in enumerate(block_plan(cfg)):
        pre = f"encoder.blocks.{i}."
        b: Params = {}
        if p.expand_ratio != 1:
            b["expand"] = {"conv": {"w": arr(pre + "expansion.expand_conv.weight")},
                           "bn": bn(pre + "expansion.expand_bn")}
        b["dw"] = {"conv": {"w": arr(pre + "depthwise_conv.depthwise_conv.weight")},
                   "bn": bn(pre + "depthwise_conv.depthwise_norm")}
        b["se"] = {"reduce": {"w": arr(pre + "squeeze_excite.reduce.weight"),
                              "b": arr(pre + "squeeze_excite.reduce.bias")},
                   "expand": {"w": arr(pre + "squeeze_excite.expand.weight"),
                              "b": arr(pre + "squeeze_excite.expand.bias")}}
        b["project"] = {"conv": {"w": arr(pre + "projection.project_conv.weight")},
                        "bn": bn(pre + "projection.project_bn")}
        blocks.append(b)

    return {
        "stem": {"conv": {"w": arr("embeddings.convolution.weight")},
                 "bn": bn("embeddings.batchnorm")},
        "blocks": blocks,
        "top": {"conv": {"w": arr("encoder.top_conv.weight")},
                "bn": bn("encoder.top_bn")},
    }
