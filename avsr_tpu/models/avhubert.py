"""AV-HuBERT video encoder, TPU-native.

The reference declares ``video_encoder: avhubert`` plus ``avhubert_layer`` /
``finetune_avhubert_layers`` fields (src/utils/config.py:55, 72-74) without
implementing any of it — SURVEY.md §2.5 stretch scope. Here the AV-HuBERT
*video branch* (Shi et al., "Learning Audio-Visual Speech Representation by
Masked Multimodal Cluster Prediction") is a first-class
``model.video_encoder`` choice:

    lip frames [B, T, 3, S, S] --grayscale--> [B, 1, T, S, S]
    --Conv3D(5x7x7, stride 1x2x2) + BN + PReLU + MaxPool3D(1x3x3, s 1x2x2)-->
    --per-frame ResNet-18 basic trunk (models/resnet.resnet_stages)-->
    [B, T, 512] --LN + proj--> [B, T, d]
    --shared SSL transformer (models/hubert.ssl_encoder_*)--> [B, T, d]

``avhubert_layer`` selects which transformer layer's output to return
(-1 = last, honoring the reference's field). There is no HF implementation
of AV-HuBERT, so unlike the other encoder families this one has no
pretrained-conversion parity test; the original weights live in fairseq
checkpoints, and fairseq is not part of this environment. The architecture
is tested for shape/grad/freeze contracts instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from avsr_tpu.core.config import AVHubertConfig, ResNetConfig
from avsr_tpu.models.hubert import ssl_encoder_apply, ssl_encoder_init
from avsr_tpu.models.layers import Params, dense, dense_init, layer_norm, norm_init
from avsr_tpu.models.resnet import init_resnet_stages, resnet_stages

def _trunk_cfg(cfg: AVHubertConfig) -> ResNetConfig:
    """AV-HuBERT's per-frame trunk is ResNet-18-shaped (basic blocks)."""
    return ResNetConfig(
        embedding_size=cfg.frontend_channels,
        hidden_sizes=cfg.trunk_widths, depths=cfg.trunk_depths,
        layer_type="basic", downsample_in_first_stage=False)


def init_avhubert(key: jax.Array, cfg: AVHubertConfig,
                  dtype: jnp.dtype = jnp.float32) -> Params:
    k_stem, k_trunk, k_proj, k_enc = jax.random.split(key, 4)
    c = cfg.frontend_channels
    params: Params = {
        "stem": {
            "conv": {"w": jax.random.normal(
                k_stem, (c, 1, 5, 7, 7), dtype) * (5 * 7 * 7) ** -0.5},
            "bn": {"scale": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype),
                   "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)},
            "prelu": jnp.full((c,), 0.25, dtype),
        },
        "trunk": init_resnet_stages(k_trunk, _trunk_cfg(cfg), dtype),
        "proj_ln": norm_init(cfg.trunk_widths[-1], dtype=dtype),
        "proj": dense_init(k_proj, cfg.trunk_widths[-1], cfg.d_model,
                           dtype=dtype),
    }
    params.update(ssl_encoder_init(
        k_enc, cfg.d_model, n_layers=cfg.n_layers, n_heads=cfg.n_heads,
        ffn_mult=cfg.ffn_mult, pos_conv_kernel=cfg.pos_conv_kernel,
        pos_conv_groups=cfg.pos_conv_groups, dtype=dtype))
    return params


def _stem(p: Params, x: jax.Array) -> jax.Array:
    """[B, 1, T, S, S] -> [B, C, T, S/4, S/4] (conv3d + BN + PReLU + pool)."""
    y = jax.lax.conv_general_dilated(
        x, p["conv"]["w"].astype(x.dtype),
        window_strides=(1, 2, 2),
        padding=((2, 2), (3, 3), (3, 3)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    inv = jax.lax.rsqrt(p["bn"]["var"].astype(jnp.float32) + 1e-5)
    scale = (p["bn"]["scale"].astype(jnp.float32) * inv).astype(y.dtype)
    shift = (p["bn"]["b"].astype(jnp.float32)
             - p["bn"]["mean"].astype(jnp.float32)
             * p["bn"]["scale"].astype(jnp.float32) * inv).astype(y.dtype)
    y = y * scale[None, :, None, None, None] + shift[None, :, None, None, None]
    a = p["prelu"].astype(y.dtype)[None, :, None, None, None]
    y = jnp.where(y >= 0, y, a * y)                       # PReLU
    # MaxPool3d(kernel (1,3,3), stride (1,2,2), padding (0,1,1))
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 1, 1, 3, 3), (1, 1, 1, 2, 2),
        ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))


def avhubert_apply(
    params: Params,
    frames: jax.Array,
    cfg: AVHubertConfig,
    *,
    frame_lengths: jax.Array | None = None,
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: str = "auto",
    remat: bool = False,
    mesh=None,
) -> jax.Array:
    """frames [B, T, 3, S, S] -> per-frame features [B, T, d]."""
    B, T = frames.shape[:2]
    x = frames.astype(compute_dtype)
    # AV-HuBERT consumes grayscale lip ROIs; collapse RGB by mean so the
    # pipeline's standard RGB frames work unchanged.
    x = jnp.mean(x, axis=2, keepdims=True)                # [B, T, 1, S, S]
    x = jnp.swapaxes(x, 1, 2)                             # [B, 1, T, S, S]
    x = _stem(params["stem"], x)                          # [B, C, T, s, s]
    C, s1, s2 = x.shape[1], x.shape[3], x.shape[4]
    x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(B * T, C, s1, s2)
    x = resnet_stages(params["trunk"], x, _trunk_cfg(cfg))
    x = jnp.mean(x, axis=(2, 3)).reshape(B, T, -1)        # [B, T, 512]
    x = dense(params["proj"], layer_norm(params["proj_ln"], x))

    lengths = (frame_lengths.astype(jnp.int32) if frame_lengths is not None
               else jnp.full((B,), T, jnp.int32))
    if cfg.avhubert_layer == 0:
        return x
    sub = dict(params)
    if cfg.avhubert_layer > 0:         # ref avhubert_layer: 1-based layer tap
        sub["blocks"] = params["blocks"][:cfg.avhubert_layer]
    return ssl_encoder_apply(
        sub, x, lengths, n_heads=cfg.n_heads,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        pos_conv_kernel=cfg.pos_conv_kernel,
        pos_conv_groups=cfg.pos_conv_groups,
        mask_before_pos_conv=frame_lengths is not None,
        use_pallas=use_pallas, remat=remat, mesh=mesh)
