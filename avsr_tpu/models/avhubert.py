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
    if "fuse_ln" in params:
        # Pretrained fairseq head (convert_fairseq_avhubert): proj ->
        # modality-fuse layer norm (+ post_extract_proj for concat fuse).
        x = _fairseq_fuse_head(params, dense(params["proj"], x))
    else:
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


def _fairseq_fuse_head(params: Params, v: jax.Array) -> jax.Array:
    """Video-only modality fusion exactly as fairseq AVHubertModel does it.

    At video-only inference av_hubert feeds a ZERO audio feature
    (av_hubert/avhubert/hubert.py, extract_finetune: ``features_audio =
    features_video.new_zeros(...)``), fuses, layer-norms the fused vector,
    then (concat fuse only) projects ``post_extract_proj``. Add fuse
    (``fuse_ln`` width d, no ``post_proj``) reduces to a plain LN of the
    video features. Concat fuse layer-norms ``[audio=0 ; video]`` of width
    2d — the zero half still shifts the LN mean/variance and feeds the
    projection through its bias column block, so it cannot be folded away;
    this computes it exactly without materializing the zero half:

        mu  = sum(v)/(2d)
        var = (sum((v-mu)^2) + d*mu^2)/(2d)
        y   = LN_a(0) @ Wa + LN_v(v) @ Wv + b     (W = [Wa ; Wv] row blocks)
    """
    if "post_proj" not in params:              # add fuse: v + 0 == v
        return layer_norm(params["fuse_ln"], v)
    d = v.shape[-1]
    g, b = params["fuse_ln"]["scale"], params["fuse_ln"]["b"]
    vf = v.astype(jnp.float32)
    mu = jnp.sum(vf, axis=-1, keepdims=True) / (2 * d)
    var = (jnp.sum(jnp.square(vf - mu), axis=-1, keepdims=True)
           + d * jnp.square(mu)) / (2 * d)
    inv = jax.lax.rsqrt(var + 1e-5)
    # fairseq concat order is [audio, video] (hubert.py modality_fuse):
    # audio occupies rows [:d] of W and slots [:d] of gamma/beta.
    ln_v = ((vf - mu) * inv * g[d:].astype(jnp.float32)
            + b[d:].astype(jnp.float32))
    ln_a = ((-mu) * inv * g[:d].astype(jnp.float32)[None, None, :]
            + b[:d].astype(jnp.float32))
    w = params["post_proj"]["w"].astype(jnp.float32)       # [2d, d_out]
    y = ln_a @ w[:d] + ln_v @ w[d:] + params["post_proj"]["b"].astype(
        jnp.float32)
    return y.astype(v.dtype)


# ---------------------------------------------------------------------------
# Fairseq weight conversion (torch .pt state_dict -> our pytree)
# ---------------------------------------------------------------------------


def load_fairseq_checkpoint(path: str) -> dict:
    """Read a fairseq checkpoint's model state dict WITHOUT fairseq.

    Fairseq ``.pt`` files pickle an OmegaConf config object alongside the
    tensors; unpickling that normally requires ``omegaconf``/``fairseq``
    imports. This loader stubs any unimportable class so the tensor payload
    (which only needs torch) loads cleanly, then returns ``ckpt['model']``.
    Matches the ref's declared-but-unimplemented avhubert support
    (/root/reference/src/utils/config.py:55,72-74)."""
    import importlib
    import pickle

    class _Stub:
        def __init__(self, *a, **k):    # noqa: D401 - placeholder instance
            pass

        def __setstate__(self, state):
            self.__dict__["_state"] = state

    class _PermissiveUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return getattr(importlib.import_module(module), name)
            except Exception:
                return type(f"{module}.{name}", (_Stub,), {})

    class _pickle_module:
        Unpickler = _PermissiveUnpickler
        load = staticmethod(pickle.load)
        loads = staticmethod(pickle.loads)
        dumps = staticmethod(pickle.dumps)
        __name__ = "avsr_tpu_permissive_pickle"

    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=_pickle_module)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    if not isinstance(ckpt, dict):
        raise ValueError(f"{path}: not a fairseq checkpoint "
                         "(no 'model' state dict)")
    return ckpt


def convert_fairseq_avhubert(state_dict: dict, cfg: AVHubertConfig) -> Params:
    """Convert a fairseq ``AVHubertModel`` state dict (video branch +
    shared transformer) to our pytree.

    Key layout per av_hubert (facebookresearch/av_hubert):
      feature_extractor_video.resnet.frontend3D.{0,1,2}.*   3D stem
      feature_extractor_video.resnet.trunk.layer{1..4}.*    ResNet-18, PReLU
      feature_extractor_video.proj.*                        512 -> d
      layer_norm.*                 post-fuse LN (width 2d concat / d add)
      post_extract_proj.*          2d -> d (concat fuse only)
      encoder.pos_conv.0.*         weight-norm grouped conv (dim=2)
      encoder.layers.N.*           self_attn/{q,k,v,out}_proj, fc1/fc2, LNs
      encoder.layer_norm.*         final (pre-LN) / initial (post-LN) LN
    Audio-branch and pretraining-head keys (feature_extractor_audio.*,
    final_proj, mask_emb, label_embs_concat) are intentionally ignored.
    """
    import numpy as np

    def arr(name: str) -> jnp.ndarray:
        if name not in state_dict:
            raise KeyError(f"missing fairseq weight {name!r}")
        t = state_dict[name]
        if hasattr(t, "detach"):   # torch tensor
            t = np.asarray(t.detach().cpu().float())
        return jnp.asarray(t)   # tracer-safe (eval_shape dry-run)

    def lin(name: str) -> Params:
        return {"w": arr(name + ".weight").T, "b": arr(name + ".bias")}

    def ln(name: str) -> Params:
        return {"scale": arr(name + ".weight"), "b": arr(name + ".bias")}

    def bn(name: str) -> Params:
        return {"scale": arr(name + ".weight"), "b": arr(name + ".bias"),
                "mean": arr(name + ".running_mean"),
                "var": arr(name + ".running_var")}

    res = "feature_extractor_video.resnet."
    stem = {
        "conv": {"w": arr(res + "frontend3D.0.weight")},
        "bn": bn(res + "frontend3D.1"),
        "prelu": arr(res + "frontend3D.2.weight"),
    }

    trunk = []
    for si, depth in enumerate(cfg.trunk_depths):
        layers = []
        for li in range(depth):
            pre = f"{res}trunk.layer{si + 1}.{li}."
            p: Params = {
                "convs": [
                    {"conv": {"w": arr(pre + "conv1.weight")},
                     "bn": bn(pre + "bn1")},
                    {"conv": {"w": arr(pre + "conv2.weight")},
                     "bn": bn(pre + "bn2")},
                ],
                "prelus": [arr(pre + "relu1.weight"),
                           arr(pre + "relu2.weight")],
            }
            if pre + "downsample.0.weight" in state_dict:
                p["shortcut"] = {
                    "conv": {"w": arr(pre + "downsample.0.weight")},
                    "bn": bn(pre + "downsample.1"),
                }
            layers.append(p)
        trunk.append(layers)

    # Fuse mode from the post-fuse LN width: 2d => concat, d => add.
    fuse_width = state_dict["layer_norm.weight"].shape[0]
    d = cfg.d_model
    params: Params = {
        "stem": stem,
        "trunk": trunk,
        "proj": lin("feature_extractor_video.proj"),
        "fuse_ln": ln("layer_norm"),
    }
    if fuse_width == 2 * d:
        params["post_proj"] = lin("post_extract_proj")
    elif fuse_width != d:
        raise ValueError(
            f"layer_norm width {fuse_width} matches neither concat (2d="
            f"{2 * d}) nor add (d={d}) fuse for d_model={d}")

    # Positional conv weight norm: g * v / ||v|| over dims (0,1) (dim=2).
    g = arr("encoder.pos_conv.0.weight_g")
    v = arr("encoder.pos_conv.0.weight_v")
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
    params["pos_conv"] = {"w": g * v / jnp.maximum(norm, 1e-12),
                          "b": arr("encoder.pos_conv.0.bias")}
    params["ln"] = ln("encoder.layer_norm")
    params["blocks"] = [
        {
            "attn": {
                "q": lin(f"encoder.layers.{i}.self_attn.q_proj"),
                "k": lin(f"encoder.layers.{i}.self_attn.k_proj"),
                "v": lin(f"encoder.layers.{i}.self_attn.v_proj"),
                "o": lin(f"encoder.layers.{i}.self_attn.out_proj"),
            },
            "ln1": ln(f"encoder.layers.{i}.self_attn_layer_norm"),
            "fc1": lin(f"encoder.layers.{i}.fc1"),
            "fc2": lin(f"encoder.layers.{i}.fc2"),
            "ln2": ln(f"encoder.layers.{i}.final_layer_norm"),
        }
        for i in range(cfg.n_layers)
    ]
    return params
