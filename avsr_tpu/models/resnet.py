"""ResNet video encoder, TPU-native.

The reference declares ``video_encoder: resnet`` in its typed config
(src/utils/config.py:53-56) and README (README.md:196-211) but only ever
builds CLIP — SURVEY.md §2.5 stretch scope. Here ResNet is a first-class
``model.video_encoder`` choice: each video frame goes through the trunk and
the pooled embedding becomes that frame's feature, so the AVSR composition
sees the same [B, T, d] contract as CLIP (models/clip_vit.py).

Matches HF ``transformers.ResNetModel`` numerics (both ``bottleneck``
resnet-50-style and ``basic`` resnet-18/34-style layers). BatchNorm runs in
inference mode from the stored running statistics: the reference always
freezes its vision encoder (clip_whisper_model.py:244-318), and frozen-BN
is the standard fine-tuning treatment when the trunk is unfrozen.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.core.config import ResNetConfig
from avsr_tpu.models.layers import Params

# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _conv_init(key: jax.Array, c_out: int, c_in: int, k: int,
               dtype: jnp.dtype) -> Params:
    fan_in = c_in * k * k
    return {"w": jax.random.normal(key, (c_out, c_in, k, k), dtype)
            * np.sqrt(2.0 / fan_in)}


def _bn_init(c: int, dtype: jnp.dtype) -> Params:
    return {"scale": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def _layer_init(key: jax.Array, c_in: int, c_out: int, stride: int,
                cfg: ResNetConfig, dtype: jnp.dtype) -> Params:
    ks = jax.random.split(key, 4)
    p: Params = {}
    if c_in != c_out or stride != 1:
        p["shortcut"] = {"conv": _conv_init(ks[3], c_out, c_in, 1, dtype),
                         "bn": _bn_init(c_out, dtype)}
    if cfg.layer_type == "bottleneck":
        mid = c_out // cfg.reduction
        p["convs"] = [
            {"conv": _conv_init(ks[0], mid, c_in, 1, dtype),
             "bn": _bn_init(mid, dtype)},
            {"conv": _conv_init(ks[1], mid, mid, 3, dtype),
             "bn": _bn_init(mid, dtype)},
            {"conv": _conv_init(ks[2], c_out, mid, 1, dtype),
             "bn": _bn_init(c_out, dtype)},
        ]
    else:   # basic (resnet-18/34)
        p["convs"] = [
            {"conv": _conv_init(ks[0], c_out, c_in, 3, dtype),
             "bn": _bn_init(c_out, dtype)},
            {"conv": _conv_init(ks[1], c_out, c_out, 3, dtype),
             "bn": _bn_init(c_out, dtype)},
        ]
    return p


def init_resnet(key: jax.Array, cfg: ResNetConfig,
                dtype: jnp.dtype = jnp.float32) -> Params:
    keys = jax.random.split(key, 1 + sum(cfg.depths))
    params: Params = {
        "stem": {"conv": _conv_init(keys[0], cfg.embedding_size, 3, 7, dtype),
                 "bn": _bn_init(cfg.embedding_size, dtype)},
        "stages": [],
    }
    ki = 1
    c_in = cfg.embedding_size
    for si, (c_out, depth) in enumerate(zip(cfg.hidden_sizes, cfg.depths)):
        stride = (2 if cfg.downsample_in_first_stage else 1) if si == 0 else 2
        layers = []
        for li in range(depth):
            layers.append(_layer_init(keys[ki], c_in if li == 0 else c_out,
                                      c_out, stride if li == 0 else 1,
                                      cfg, dtype))
            ki += 1
        params["stages"].append(layers)
        c_in = c_out
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _bn(p: Params, x: jax.Array) -> jax.Array:
    """Inference-mode BatchNorm from running stats, folded to scale+shift."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + 1e-5)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    shift = (p["b"].astype(jnp.float32)
             - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32)
             * inv).astype(x.dtype)
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def _conv(p: Params, x: jax.Array, *, stride: int = 1,
          pad: int | None = None) -> jax.Array:
    k = p["w"].shape[-1]
    pad = k // 2 if pad is None else pad
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _act(p: Params, x: jax.Array, i: int) -> jax.Array:
    """ReLU, or per-channel PReLU when the block carries ``prelus`` weights
    (fairseq AV-HuBERT trunks use relu_type='prelu'; av_hubert/resnet.py)."""
    if "prelus" in p:
        a = p["prelus"][i].astype(x.dtype)[None, :, None, None]
        return jnp.where(x >= 0, x, a * x)
    return jax.nn.relu(x)


def _conv_bn(p: Params, x: jax.Array, *, stride: int = 1,
             act: bool = True) -> jax.Array:
    y = _bn(p["bn"], _conv(p["conv"], x, stride=stride))
    return jax.nn.relu(y) if act else y


def _layer_apply(p: Params, x: jax.Array, stride: int,
                 cfg: ResNetConfig) -> jax.Array:
    res = (_conv_bn(p["shortcut"], x, stride=stride, act=False)
           if "shortcut" in p else x)
    if cfg.layer_type == "bottleneck":
        y = _act(p, _conv_bn(p["convs"][0], x, act=False), 0)
        y = _act(p, _conv_bn(p["convs"][1], y, stride=stride, act=False), 1)
        y = _conv_bn(p["convs"][2], y, act=False)
        return _act(p, y + res, 2)
    y = _act(p, _conv_bn(p["convs"][0], x, stride=stride, act=False), 0)
    y = _conv_bn(p["convs"][1], y, act=False)
    return _act(p, y + res, 1)


def resnet_stages(stages: list, x: jax.Array, cfg: ResNetConfig) -> jax.Array:
    """Run the residual stages only (no stem/pool) — reused by AV-HuBERT's
    video front end, which has its own 3D stem (models/avhubert.py)."""
    for si, layers in enumerate(stages):
        stride = (2 if cfg.downsample_in_first_stage else 1) if si == 0 else 2
        for li, lp in enumerate(layers):
            x = _layer_apply(lp, x, stride if li == 0 else 1, cfg)
    return x


def init_resnet_stages(key: jax.Array, cfg: ResNetConfig,
                       dtype: jnp.dtype = jnp.float32) -> list:
    return init_resnet(key, cfg, dtype)["stages"]


def _trunk(params: Params, x: jax.Array, cfg: ResNetConfig) -> jax.Array:
    """[N, 3, S, S] -> pooled [N, hidden_sizes[-1]]."""
    x = _conv_bn(params["stem"], x, stride=2)
    # MaxPool2d(kernel=3, stride=2, padding=1) with -inf padding (torch).
    x = jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        ((0, 0), (0, 0), (1, 1), (1, 1)))
    x = resnet_stages(params["stages"], x, cfg)
    return jnp.mean(x, axis=(2, 3))     # AdaptiveAvgPool2d((1,1))


def resnet_apply(
    params: Params,
    frames: jax.Array,
    cfg: ResNetConfig,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: str = "auto",
    remat: bool = False,
) -> jax.Array:
    """frames [B, T, 3, S, S] (or [N, 3, S, S]) -> per-frame features [B, T, d].

    Same contract as clip_vit_apply pool="pooled": one embedding per frame.
    """
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


def convert_hf_resnet(state_dict: dict[str, Any],
                      cfg: ResNetConfig) -> Params:
    """Convert an HF ``ResNetModel`` (microsoft/resnet-*) torch state dict."""
    def arr(name: str) -> jnp.ndarray:
        for prefix in ("resnet.", ""):
            k = prefix + name
            if k in state_dict:
                t = state_dict[k]
                if hasattr(t, "detach"):   # torch tensor
                    t = np.asarray(t.detach().cpu())
                return jnp.asarray(t)   # tracer-safe (eval_shape dry-run)
        raise KeyError(f"missing weight {name!r}")

    def has(name: str) -> bool:
        return any(p + name in state_dict for p in ("resnet.", ""))

    def conv_bn(name: str) -> Params:
        return {
            "conv": {"w": arr(name + ".convolution.weight")},
            "bn": {"scale": arr(name + ".normalization.weight"),
                   "b": arr(name + ".normalization.bias"),
                   "mean": arr(name + ".normalization.running_mean"),
                   "var": arr(name + ".normalization.running_var")},
        }

    stages = []
    n_convs = 3 if cfg.layer_type == "bottleneck" else 2
    for si, depth in enumerate(cfg.depths):
        layers = []
        for li in range(depth):
            pre = f"encoder.stages.{si}.layers.{li}."
            p: Params = {"convs": [conv_bn(pre + f"layer.{ci}")
                                   for ci in range(n_convs)]}
            if has(pre + "shortcut.convolution.weight"):
                p["shortcut"] = conv_bn(pre + "shortcut")
            layers.append(p)
        stages.append(layers)

    return {"stem": conv_bn("embedder.embedder"), "stages": stages}
