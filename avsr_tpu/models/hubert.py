"""HuBERT / Wav2Vec2 self-supervised speech encoders, TPU-native.

The reference declares ``audio_encoder: hubert | wav2vec2 | whisper`` in its
typed config (src/utils/config.py:53-56) and README (README.md:196-211) but
never implements the non-Whisper choices — SURVEY.md §2.5 stretch scope.
Here they are first-class: one functional JAX module covers both families
(they share the wav2vec2 geometry; HuBERT differs only in pretraining, not
in the encoder forward), selected via ``model.audio_encoder``.

Pipeline (HF ``transformers.Wav2Vec2Model`` / ``HubertModel`` numerics):

    waveform [B, T] --7x conv1d (gelu, group/layer norm)--> [B, T/320, 512]
    --LN + linear--> [B, T', d] --(+ grouped conv positional embedding)-->
    N x transformer blocks (post-LN for base, pre-LN for *-large
    "stable layer norm" checkpoints) --> [B, T', d]

Unlike Whisper this consumes the raw waveform, not log-mel: the data
pipeline keeps padded waveforms on host either way, so selecting this
encoder only changes the on-device front end (data/loader.featurize).
Variable length is first-class: conv output lengths follow HF's
``_get_feat_extract_output_lengths`` floor arithmetic and attention masks
padding via the shared ops.attention path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.core.config import SpeechSSLConfig
from avsr_tpu.models.layers import (
    Params,
    dense,
    dense_init,
    gelu,
    layer_norm,
    mha_apply,
    mha_init,
    norm_init,
)

# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_speech_ssl(key: jax.Array, cfg: SpeechSSLConfig,
                    dtype: jnp.dtype = jnp.float32) -> Params:
    d = cfg.d_model
    n_conv = len(cfg.conv_dims)
    keys = jax.random.split(key, n_conv + cfg.n_layers + 3)

    convs = []
    c_in = 1
    for i, (c_out, k) in enumerate(zip(cfg.conv_dims, cfg.conv_kernels)):
        p: Params = {"w": jax.random.normal(keys[i], (c_out, c_in, k), dtype)
                     * (c_in * k) ** -0.5}
        if cfg.conv_bias:
            p["b"] = jnp.zeros((c_out,), dtype)
        if (cfg.feat_extract_norm == "group" and i == 0) or \
                cfg.feat_extract_norm == "layer":
            p["norm"] = norm_init(c_out, dtype=dtype)
        convs.append(p)
        c_in = c_out

    kp = keys[n_conv]
    params: Params = {
        "fe": convs,
        "proj_ln": norm_init(cfg.conv_dims[-1], dtype=dtype),
        "proj": dense_init(kp, cfg.conv_dims[-1], d, dtype=dtype),
    }
    params.update(ssl_encoder_init(
        keys[n_conv + 1], d, n_layers=cfg.n_layers, n_heads=cfg.n_heads,
        ffn_mult=cfg.ffn_mult, pos_conv_kernel=cfg.pos_conv_kernel,
        pos_conv_groups=cfg.pos_conv_groups, dtype=dtype))
    return params


def ssl_encoder_init(key: jax.Array, d: int, *, n_layers: int, n_heads: int,
                     ffn_mult: int, pos_conv_kernel: int,
                     pos_conv_groups: int,
                     dtype: jnp.dtype = jnp.float32) -> Params:
    """pos-conv + transformer stack shared by HuBERT/Wav2Vec2 and AV-HuBERT."""
    keys = jax.random.split(key, n_layers + 1)
    return {
        "pos_conv": {
            "w": jax.random.normal(
                keys[0], (d, d // pos_conv_groups, pos_conv_kernel),
                dtype) * (d // pos_conv_groups * pos_conv_kernel) ** -0.5,
            "b": jnp.zeros((d,), dtype),
        },
        "ln": norm_init(d, dtype=dtype),
        "blocks": [
            {
                "attn": mha_init(keys[1 + i], d, n_heads=n_heads, dtype=dtype),
                "ln1": norm_init(d, dtype=dtype),
                "fc1": dense_init(jax.random.fold_in(keys[1 + i], 1),
                                  d, d * ffn_mult, dtype=dtype),
                "fc2": dense_init(jax.random.fold_in(keys[1 + i], 2),
                                  d * ffn_mult, d, dtype=dtype),
                "ln2": norm_init(d, dtype=dtype),
            }
            for i in range(n_layers)
        ],
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def feat_extract_output_lengths(cfg: SpeechSSLConfig,
                                lengths: jax.Array) -> jax.Array:
    """HF Wav2Vec2Model._get_feat_extract_output_lengths floor arithmetic."""
    out = lengths.astype(jnp.int32)
    for k, s in zip(cfg.conv_kernels, cfg.conv_strides):
        out = (out - k) // s + 1
    return jnp.maximum(out, 0)


def _channel_norm(p: Params, x: jax.Array) -> jax.Array:
    """GroupNorm(groups == channels) over [B, C, T]: per-channel instance norm."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * p["scale"].astype(jnp.float32)[None, :, None] \
        + p["b"].astype(jnp.float32)[None, :, None]
    return y.astype(x.dtype)


def _feature_extractor(params: Params, wave: jax.Array,
                       cfg: SpeechSSLConfig) -> jax.Array:
    """[B, T] waveform -> [B, C, T/prod(strides)] conv features."""
    x = wave[:, None, :]                                    # [B, 1, T]
    for i, p in enumerate(params["fe"]):
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype),
            window_strides=(cfg.conv_strides[i],),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        if "b" in p:
            x = x + p["b"].astype(x.dtype)[None, :, None]
        if "norm" in p:
            if cfg.feat_extract_norm == "group" and i == 0:
                x = _channel_norm(p["norm"], x)
            else:   # layer-norm mode: LN over the channel axis
                x = jnp.swapaxes(
                    layer_norm(p["norm"], jnp.swapaxes(x, 1, 2)), 1, 2)
        x = gelu(x)
    return x


def _pos_conv(params: Params, x: jax.Array, kernel: int,
              groups: int) -> jax.Array:
    """Grouped conv positional embedding (HF Wav2Vec2PositionalConvEmbedding)."""
    pad = kernel // 2
    y = jax.lax.conv_general_dilated(
        jnp.swapaxes(x, 1, 2), params["pos_conv"]["w"].astype(x.dtype),
        window_strides=(1,),
        padding=((pad, pad),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    y = y + params["pos_conv"]["b"].astype(x.dtype)[None, :, None]
    if kernel % 2 == 0:                 # HF trims one step for even kernels
        y = y[:, :, :-1]
    return gelu(jnp.swapaxes(y, 1, 2))


def speech_ssl_apply(
    params: Params,
    wave: jax.Array,
    cfg: SpeechSSLConfig,
    *,
    wave_lengths: jax.Array | None = None,
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: str = "auto",
    remat: bool = False,
    mesh=None,
) -> tuple[jax.Array, jax.Array]:
    """wave [B, T] -> (features [B, T', d], feat_lengths [B])."""
    B, T = wave.shape
    x = wave.astype(compute_dtype)
    if cfg.normalize_input:
        # Per-utterance zero-mean/unit-var over the valid region (HF
        # Wav2Vec2FeatureExtractor do_normalize=True).
        if wave_lengths is None:
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
        else:
            valid = (jnp.arange(T)[None, :]
                     < wave_lengths[:, None]).astype(x.dtype)
            n = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1.0)
            mean = jnp.sum(x * valid, axis=-1, keepdims=True) / n
            var = jnp.sum(jnp.square(x - mean) * valid, axis=-1,
                          keepdims=True) / n
            x = x * valid
        x = (x - mean) * jax.lax.rsqrt(var + 1e-7)
        if wave_lengths is not None:
            x = x * valid

    x = _feature_extractor(params, x, cfg)                  # [B, C, T']
    x = jnp.swapaxes(x, 1, 2)                               # [B, T', C]
    Tf = x.shape[1]
    if wave_lengths is None:
        feat_lengths = jnp.full((B,), Tf, jnp.int32)
    else:
        feat_lengths = feat_extract_output_lengths(
            cfg, wave_lengths).clip(0, Tf)

    x = layer_norm(params["proj_ln"], x)
    x = dense(params["proj"], x)                            # [B, T', d]

    x = ssl_encoder_apply(
        params, x, feat_lengths, n_heads=cfg.n_heads,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        pos_conv_kernel=cfg.pos_conv_kernel,
        pos_conv_groups=cfg.pos_conv_groups,
        mask_before_pos_conv=wave_lengths is not None,
        use_pallas=use_pallas, remat=remat, mesh=mesh)
    return x, feat_lengths


def ssl_encoder_apply(
    params: Params,
    x: jax.Array,
    lengths: jax.Array,
    *,
    n_heads: int,
    do_stable_layer_norm: bool,
    pos_conv_kernel: int,
    pos_conv_groups: int,
    mask_before_pos_conv: bool = True,
    use_pallas: str = "auto",
    remat: bool = False,
    mesh=None,
) -> jax.Array:
    """Shared pos-conv + transformer stack: [B, T, d] -> [B, T, d]."""
    Tf = x.shape[1]
    # HF zeroes padded positions before the positional conv so padding
    # cannot leak into valid frames through the 128-wide kernel.
    if mask_before_pos_conv:
        valid_f = (jnp.arange(Tf)[None, :]
                   < lengths[:, None]).astype(x.dtype)[..., None]
        x = x * valid_f
    x = x + _pos_conv(params, x, pos_conv_kernel, pos_conv_groups)

    # Align the width to the flash kernel's sublane tile (16) ONCE — the
    # conv front end yields odd widths (10 s -> 499) every block would
    # otherwise pad + slice per layer. Padded rows are masked in attention
    # (lengths) and sliced off below.
    pad_t = -Tf % 16
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))

    if not do_stable_layer_norm:                # base: LN before the stack
        x = layer_norm(params["ln"], x)

    attn = functools.partial(mha_apply, n_heads=n_heads,
                             lengths=lengths, use_pallas=use_pallas,
                             mesh=mesh)

    def block(bp: Params, x: jax.Array) -> jax.Array:
        if do_stable_layer_norm:                # pre-LN (*-large)
            x = x + attn(bp["attn"], layer_norm(bp["ln1"], x))
            h = layer_norm(bp["ln2"], x)
            return x + dense(bp["fc2"], gelu(dense(bp["fc1"], h)))
        # post-LN (base)
        x = layer_norm(bp["ln1"], x + attn(bp["attn"], x))
        return layer_norm(bp["ln2"],
                          x + dense(bp["fc2"], gelu(dense(bp["fc1"], x))))

    if remat:
        block = jax.checkpoint(block, static_argnums=())
    for bp in params["blocks"]:
        x = block(bp, x)
    if pad_t:
        x = x[:, :Tf]

    if do_stable_layer_norm:                    # *-large: LN after the stack
        x = layer_norm(params["ln"], x)
    return x


# ---------------------------------------------------------------------------
# HF weight conversion (torch state_dict -> our pytree)
# ---------------------------------------------------------------------------


def convert_hf_speech_ssl(state_dict: dict[str, Any],
                          cfg: SpeechSSLConfig) -> Params:
    """Convert an HF ``Wav2Vec2Model`` / ``HubertModel`` torch state dict.

    Both families share key names (feature_extractor.conv_layers.*,
    feature_projection.*, encoder.pos_conv_embed.*, encoder.layers.*).
    Handles the positional-conv weight norm in both the legacy
    (``weight_g``/``weight_v``) and parametrized
    (``parametrizations.weight.original0/1``) torch layouts.
    """
    def arr(name: str) -> jnp.ndarray:
        for prefix in ("wav2vec2.", "hubert.", ""):
            k = prefix + name
            if k in state_dict:
                t = state_dict[k]
                if hasattr(t, "detach"):   # torch tensor
                    t = np.asarray(t.detach().cpu())
                return jnp.asarray(t)   # tracer-safe (eval_shape dry-run)
        raise KeyError(f"missing weight {name!r}")

    def has(name: str) -> bool:
        return any(p + name in state_dict for p in ("wav2vec2.", "hubert.", ""))

    def lin(name: str) -> Params:
        return {"w": arr(name + ".weight").T, "b": arr(name + ".bias")}

    def ln(name: str) -> Params:
        return {"scale": arr(name + ".weight"), "b": arr(name + ".bias")}

    convs = []
    for i in range(len(cfg.conv_dims)):
        pre = f"feature_extractor.conv_layers.{i}."
        p: Params = {"w": arr(pre + "conv.weight")}
        if has(pre + "conv.bias"):
            p["b"] = arr(pre + "conv.bias")
        if has(pre + "layer_norm.weight"):
            p["norm"] = ln(pre + "layer_norm")
        convs.append(p)

    # Positional conv: resolve weight norm g * v / ||v|| (dim=2: per-tap norm).
    pc = "encoder.pos_conv_embed.conv."
    if has(pc + "weight_g"):
        g, v = arr(pc + "weight_g"), arr(pc + "weight_v")
    else:
        g = arr(pc + "parametrizations.weight.original0")
        v = arr(pc + "parametrizations.weight.original1")
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
    pos_w = g * v / jnp.maximum(norm, 1e-12)

    blocks = []
    for i in range(cfg.n_layers):
        pre = f"encoder.layers.{i}."
        blocks.append({
            "attn": {
                "q": lin(pre + "attention.q_proj"),
                "k": lin(pre + "attention.k_proj"),
                "v": lin(pre + "attention.v_proj"),
                "o": lin(pre + "attention.out_proj"),
            },
            "ln1": ln(pre + "layer_norm"),
            "fc1": lin(pre + "feed_forward.intermediate_dense"),
            "fc2": lin(pre + "feed_forward.output_dense"),
            "ln2": ln(pre + "final_layer_norm"),
        })

    return {
        "fe": convs,
        "proj_ln": ln("feature_projection.layer_norm"),
        "proj": lin("feature_projection.projection"),
        "pos_conv": {"w": pos_w, "b": arr(pc + "bias")},
        "ln": ln("encoder.layer_norm"),
        "blocks": blocks,
    }
