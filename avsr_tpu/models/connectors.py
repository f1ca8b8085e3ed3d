"""Modality connectors: project encoder features into the LLM embedding space.

The reference defines 8 connector types but only wires 5 — its factory
silently substitutes "deep" for the dual-input fusion connectors
(modality_connector.py:386-396; SURVEY.md §2.1 wiring gap). Here all 8 are
first-class and registered by name:

single-input (audio-dim-or-video-dim -> llm-dim), ref modality_connector.py:
  simple     1 linear, xavier init                     (:25-44)
  deep       in-proj + residual MLP blocks + LN        (:46-109)
  conv       2x depthwise-separable-ish conv1d + LN + out-proj   (:111-172)
  attention  in-proj + MHA + FFN                       (:174-238)
  adaptive   in-proj + sinusoid PE + strided 4x downsample for long
             sequences + MHA mixing                    (:240-380)

dual-input (audio, video -> fused), ref advanced_connectors.py:
  cross_modal bidirectional cross-attention + concat-project      (:7-212)
  qformer     N learnable queries; self-attn -> cross(audio) ->
              cross(video) -> MLP; fixed-length output            (:215-413)
  perceiver   M latents cross-attending to the concatenated AV
              stream with interleaved self-attention               (:416-621)

All connectors are functional: ``CONNECTORS.get(name)`` returns a
``ConnectorDef(init, apply, dual, fixed_len)``. Apply signatures:
  single: apply(params, x, lengths, *, train_cfg) -> (y, lengths)
  dual:   apply(params, audio, video, a_lens, v_lens, ...) -> (y, lengths)
Sequence lengths are carried explicitly so downstream attention masks
padding; all shapes are static under jit.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from avsr_tpu.core.config import ModelConfig
from avsr_tpu.core.registry import CONNECTORS
from avsr_tpu.models.layers import (
    Params,
    dense,
    dense_init,
    encoder_block_apply,
    encoder_block_init,
    gelu,
    layer_norm,
    mha_apply,
    mha_init,
    norm_init,
    normal_init,
    sinusoid_position_embedding,
)


class ConnectorDef(NamedTuple):
    init: Callable[..., Params]
    apply: Callable[..., tuple[jax.Array, jax.Array]]
    dual: bool = False
    fixed_len: int | None = None  # set for qformer/perceiver-style bottlenecks


def _ident_lens(x: jax.Array, lengths: jax.Array | None) -> jax.Array:
    if lengths is not None:
        return lengths
    return jnp.full((x.shape[0],), x.shape[1], jnp.int32)


# ---------------------------------------------------------------------------
# simple
# ---------------------------------------------------------------------------

def simple_init(key: jax.Array, d_in: int, d_out: int, cfg: ModelConfig,
                dtype=jnp.float32) -> Params:
    del cfg
    return {"out": dense_init(key, d_in, d_out, dtype=dtype)}


def simple_apply(p: Params, x: jax.Array, lengths=None, **_):
    return dense(p["out"], x), _ident_lens(x, lengths)


# ---------------------------------------------------------------------------
# deep
# ---------------------------------------------------------------------------

def deep_init(key, d_in, d_out, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    hid = d_out * cfg.connector_hidden_mult
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "inp": dense_init(k1, d_in, hid, dtype=dtype),
        "ln1": norm_init(hid, dtype=dtype),
        "mid": dense_init(k2, hid, hid, dtype=dtype),
        "ln2": norm_init(hid, dtype=dtype),
        "out": dense_init(k3, hid, d_out, dtype=dtype),
        "ln_out": norm_init(d_out, dtype=dtype),
        "res": dense_init(k4, d_in, d_out, bias=False, dtype=dtype),
    }


def deep_apply(p: Params, x: jax.Array, lengths=None, **_):
    h = gelu(layer_norm(p["ln1"], dense(p["inp"], x)))
    h = h + gelu(layer_norm(p["ln2"], dense(p["mid"], h)))
    y = layer_norm(p["ln_out"], dense(p["out"], h) + dense(p["res"], x))
    return y, _ident_lens(x, lengths)


# ---------------------------------------------------------------------------
# conv (temporal mixing; channels-last conv1d as matmul-friendly XLA conv)
# ---------------------------------------------------------------------------

def conv_init(key, d_in, d_out, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    hid = d_out * cfg.connector_hidden_mult
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": {"w": normal_init(k1, (3, d_in, hid), std=(3 * d_in) ** -0.5,
                                   dtype=dtype), "b": jnp.zeros((hid,), dtype)},
        "ln1": norm_init(hid, dtype=dtype),
        "conv2": {"w": normal_init(k2, (3, hid, hid), std=(3 * hid) ** -0.5,
                                   dtype=dtype), "b": jnp.zeros((hid,), dtype)},
        "ln2": norm_init(hid, dtype=dtype),
        "out": dense_init(k3, hid, d_out, dtype=dtype),
    }


def _conv1d_cl(p: Params, x: jax.Array) -> jax.Array:
    """Channels-last conv1d: x [B, T, C] * w [K, C_in, C_out], SAME padding."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1,), padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + p["b"].astype(x.dtype)


def conv_apply(p: Params, x: jax.Array, lengths=None, **_):
    h = gelu(layer_norm(p["ln1"], _conv1d_cl(p["conv1"], x)))
    h = gelu(layer_norm(p["ln2"], _conv1d_cl(p["conv2"], h)))
    return dense(p["out"], h), _ident_lens(x, lengths)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

_CONN_HEADS = 8


def attention_init(key, d_in, d_out, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "inp": dense_init(k1, d_in, d_out, dtype=dtype),
        "block": encoder_block_init(k2, d_out, d_out * cfg.connector_hidden_mult,
                                    n_heads=_CONN_HEADS, dtype=dtype),
    }


def attention_apply(p: Params, x: jax.Array, lengths=None, *,
                    use_pallas: str = "auto", **_):
    lens = _ident_lens(x, lengths)
    h = dense(p["inp"], x)
    h = encoder_block_apply(p["block"], h, n_heads=_CONN_HEADS, lengths=lens,
                            use_pallas=use_pallas)
    return h, lens


# ---------------------------------------------------------------------------
# adaptive (PE + 4x strided downsample for long sequences + attention mixing)
# ---------------------------------------------------------------------------

_ADAPTIVE_THRESHOLD = 512
_ADAPTIVE_STRIDE = 4


def adaptive_init(key, d_in, d_out, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "inp": dense_init(k1, d_in, d_out, dtype=dtype),
        "pool": {"w": normal_init(k2, (_ADAPTIVE_STRIDE, d_out, d_out),
                                  std=(_ADAPTIVE_STRIDE * d_out) ** -0.5,
                                  dtype=dtype),
                 "b": jnp.zeros((d_out,), dtype)},
        "mix": mha_init(k3, d_out, n_heads=_CONN_HEADS, dtype=dtype),
        "ln": norm_init(d_out, dtype=dtype),
    }


def adaptive_apply(p: Params, x: jax.Array, lengths=None, *,
                   use_pallas: str = "auto", **_):
    lens = _ident_lens(x, lengths)
    h = dense(p["inp"], x)
    T = h.shape[1]
    h = h + sinusoid_position_embedding(T, h.shape[-1]).astype(h.dtype)[None]
    if T > _ADAPTIVE_THRESHOLD:  # static shape decision, jit-safe
        h = jax.lax.conv_general_dilated(
            h, p["pool"]["w"].astype(h.dtype),
            window_strides=(_ADAPTIVE_STRIDE,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC")) + p["pool"]["b"].astype(h.dtype)
        lens = jnp.maximum(
            (lens - _ADAPTIVE_STRIDE) // _ADAPTIVE_STRIDE + 1, 1).astype(jnp.int32)
    h = h + mha_apply(p["mix"], layer_norm(p["ln"], h), n_heads=_CONN_HEADS,
                      lengths=lens, use_pallas=use_pallas)
    return h, lens


# ---------------------------------------------------------------------------
# cross_modal (dual): bidirectional cross-attention then concat+project
# ---------------------------------------------------------------------------

_FUSION_LAYERS = 2


def cross_modal_init(key, d_audio, d_video, d_out, cfg: ModelConfig,
                     dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 2 * _FUSION_LAYERS + 3)
    layers = []
    for i in range(_FUSION_LAYERS):
        ka, kv = keys[2 * i], keys[2 * i + 1]
        layers.append({
            "a2v": mha_init(ka, d_out, n_heads=_CONN_HEADS, dtype=dtype),
            "v2a": mha_init(kv, d_out, n_heads=_CONN_HEADS, dtype=dtype),
            "ln_a": norm_init(d_out, dtype=dtype),
            "ln_v": norm_init(d_out, dtype=dtype),
        })
    return {
        "proj_a": dense_init(keys[-3], d_audio, d_out, dtype=dtype),
        "proj_v": dense_init(keys[-2], d_video, d_out, dtype=dtype),
        "layers": layers,
        "out": dense_init(keys[-1], 2 * d_out, d_out, dtype=dtype),
    }


def cross_modal_apply(p: Params, audio: jax.Array, video: jax.Array,
                      a_lens=None, v_lens=None, *, use_pallas: str = "auto", **_):
    a_lens = _ident_lens(audio, a_lens)
    v_lens = _ident_lens(video, v_lens)
    a = dense(p["proj_a"], audio)
    v = dense(p["proj_v"], video)
    for lp in p["layers"]:
        a = a + mha_apply(lp["a2v"], layer_norm(lp["ln_a"], a), kv=v,
                          n_heads=_CONN_HEADS, lengths=a_lens,
                          kv_lengths=v_lens, use_pallas=use_pallas)
        v = v + mha_apply(lp["v2a"], layer_norm(lp["ln_v"], v), kv=a,
                          n_heads=_CONN_HEADS, lengths=v_lens,
                          kv_lengths=a_lens, use_pallas=use_pallas)
    # Align video to the audio time axis (nearest upsample via gather) and
    # concat per-step — replaces the reference's pad-to-max + concat
    # (advanced_connectors.py:150-186) with a length-aware alignment.
    Ta = a.shape[1]
    ratio = jnp.maximum(v_lens, 1).astype(jnp.float32) / jnp.maximum(a_lens, 1).astype(jnp.float32)
    idx = jnp.clip((jnp.arange(Ta)[None, :] * ratio[:, None]).astype(jnp.int32),
                   0, v.shape[1] - 1)
    v_up = jnp.take_along_axis(v, idx[..., None], axis=1)
    fused = jnp.concatenate([a, v_up], axis=-1)
    return dense(p["out"], fused), a_lens


# ---------------------------------------------------------------------------
# qformer (dual): learnable queries; self -> cross(audio) -> cross(video) -> MLP
# ---------------------------------------------------------------------------

_QFORMER_LAYERS = 2


def qformer_init(key, d_audio, d_video, d_out, cfg: ModelConfig,
                 dtype=jnp.float32) -> Params:
    nq = cfg.qformer_queries
    keys = jax.random.split(key, 4 * _QFORMER_LAYERS + 4)
    layers = []
    for i in range(_QFORMER_LAYERS):
        ks = keys[4 * i: 4 * i + 4]
        layers.append({
            "self": mha_init(ks[0], d_out, n_heads=_CONN_HEADS, dtype=dtype),
            "ln_s": norm_init(d_out, dtype=dtype),
            "xa": mha_init(ks[1], d_out, n_heads=_CONN_HEADS, dtype=dtype),
            "ln_a": norm_init(d_out, dtype=dtype),
            "xv": mha_init(ks[2], d_out, n_heads=_CONN_HEADS, dtype=dtype),
            "ln_v": norm_init(d_out, dtype=dtype),
            "fc1": dense_init(ks[3], d_out, d_out * cfg.connector_hidden_mult, dtype=dtype),
            "fc2": dense_init(jax.random.fold_in(ks[3], 1),
                              d_out * cfg.connector_hidden_mult, d_out, dtype=dtype),
            "ln_m": norm_init(d_out, dtype=dtype),
        })
    return {
        "queries": normal_init(keys[-4], (nq, d_out), std=0.02, dtype=dtype),
        "proj_a": dense_init(keys[-3], d_audio, d_out, dtype=dtype),
        "proj_v": dense_init(keys[-2], d_video, d_out, dtype=dtype),
        "layers": layers,
        "ln_out": norm_init(d_out, dtype=dtype),
    }


def qformer_apply(p: Params, audio: jax.Array, video: jax.Array,
                  a_lens=None, v_lens=None, *, use_pallas: str = "auto", **_):
    B = audio.shape[0]
    a_lens = _ident_lens(audio, a_lens)
    v_lens = _ident_lens(video, v_lens)
    a = dense(p["proj_a"], audio)
    v = dense(p["proj_v"], video)
    q = jnp.broadcast_to(p["queries"].astype(a.dtype),
                         (B, *p["queries"].shape))
    for lp in p["layers"]:
        q = q + mha_apply(lp["self"], layer_norm(lp["ln_s"], q),
                          n_heads=_CONN_HEADS, use_pallas=use_pallas)
        q = q + mha_apply(lp["xa"], layer_norm(lp["ln_a"], q), kv=a,
                          n_heads=_CONN_HEADS, kv_lengths=a_lens,
                          use_pallas=use_pallas)
        q = q + mha_apply(lp["xv"], layer_norm(lp["ln_v"], q), kv=v,
                          n_heads=_CONN_HEADS, kv_lengths=v_lens,
                          use_pallas=use_pallas)
        q = q + dense(lp["fc2"], gelu(dense(lp["fc1"], layer_norm(lp["ln_m"], q))))
    q = layer_norm(p["ln_out"], q)
    nq = q.shape[1]
    return q, jnp.full((B,), nq, jnp.int32)


# ---------------------------------------------------------------------------
# perceiver (dual): latents cross-attend to the concatenated AV stream
# ---------------------------------------------------------------------------

_PERCEIVER_LAYERS = 2


def perceiver_init(key, d_audio, d_video, d_out, cfg: ModelConfig,
                   dtype=jnp.float32) -> Params:
    nl = cfg.perceiver_latents
    keys = jax.random.split(key, 2 * _PERCEIVER_LAYERS + 4)
    layers = []
    for i in range(_PERCEIVER_LAYERS):
        kx, ks = keys[2 * i], keys[2 * i + 1]
        layers.append({
            "cross": mha_init(kx, d_out, n_heads=_CONN_HEADS, dtype=dtype),
            "ln_x": norm_init(d_out, dtype=dtype),
            "self": encoder_block_init(ks, d_out, d_out * cfg.connector_hidden_mult,
                                       n_heads=_CONN_HEADS, dtype=dtype),
        })
    return {
        "latents": normal_init(keys[-4], (nl, d_out), std=0.02, dtype=dtype),
        "proj_a": dense_init(keys[-3], d_audio, d_out, dtype=dtype),
        "proj_v": dense_init(keys[-2], d_video, d_out, dtype=dtype),
        "layers": layers,
        "ln_out": norm_init(d_out, dtype=dtype),
    }


def perceiver_apply(p: Params, audio: jax.Array, video: jax.Array,
                    a_lens=None, v_lens=None, *, use_pallas: str = "auto", **_):
    B, Ta = audio.shape[:2]
    Tv = video.shape[1]
    a_lens = _ident_lens(audio, a_lens)
    v_lens = _ident_lens(video, v_lens)
    a = dense(p["proj_a"], audio)
    v = dense(p["proj_v"], video)
    stream = jnp.concatenate([a, v], axis=1)                # [B, Ta+Tv, d]
    # Validity mask for the concatenated stream: audio padding sits
    # mid-stream, so a right-pad kv_lens won't do — pass an explicit mask.
    valid = jnp.concatenate([
        jnp.arange(Ta)[None, :] < a_lens[:, None],
        jnp.arange(Tv)[None, :] < v_lens[:, None]], axis=1)  # [B, Ta+Tv]
    lat = jnp.broadcast_to(p["latents"].astype(a.dtype), (B, *p["latents"].shape))
    for lp in p["layers"]:
        lat = lat + mha_apply(lp["cross"], layer_norm(lp["ln_x"], lat),
                              kv=stream, n_heads=_CONN_HEADS, kv_valid=valid,
                              use_pallas=use_pallas)
        lat = encoder_block_apply(lp["self"], lat, n_heads=_CONN_HEADS,
                                  use_pallas=use_pallas)
    lat = layer_norm(p["ln_out"], lat)
    nl = lat.shape[1]
    return lat, jnp.full((B,), nl, jnp.int32)


# ---------------------------------------------------------------------------
# adapter (dual): the reference's "multimodal_adapter" fusion type
# (src/utils/config.py:56, adapter_dim :68, num_adapter_layers :70 — declared,
# never implemented). Project both modalities to the LLM dim, align video to
# the audio grid, sum, then N bottleneck adapter layers
# (LN -> down(adapter_dim) -> gelu -> up, residual).
# ---------------------------------------------------------------------------


def adapter_init(key, d_audio, d_video, d_out, cfg: ModelConfig,
                 dtype=jnp.float32) -> Params:
    n = max(cfg.num_adapter_layers, 1)
    keys = jax.random.split(key, 2 * n + 2)
    layers = []
    for i in range(n):
        layers.append({
            "ln": norm_init(d_out, dtype=dtype),
            "down": dense_init(keys[2 * i], d_out, cfg.adapter_dim,
                               dtype=dtype),
            "up": dense_init(keys[2 * i + 1], cfg.adapter_dim, d_out,
                             dtype=dtype),
        })
    return {
        "proj_a": dense_init(keys[-2], d_audio, d_out, dtype=dtype),
        "proj_v": dense_init(keys[-1], d_video, d_out, dtype=dtype),
        "layers": layers,
    }


def adapter_apply(p: Params, audio: jax.Array, video: jax.Array,
                  a_lens=None, v_lens=None, **_):
    a_lens = _ident_lens(audio, a_lens)
    v_lens = _ident_lens(video, v_lens)
    a = dense(p["proj_a"], audio)
    v = dense(p["proj_v"], video)
    Ta = a.shape[1]
    ratio = (jnp.maximum(v_lens, 1).astype(jnp.float32)
             / jnp.maximum(a_lens, 1).astype(jnp.float32))
    idx = jnp.clip((jnp.arange(Ta)[None, :] * ratio[:, None]).astype(jnp.int32),
                   0, v.shape[1] - 1)
    h = a + jnp.take_along_axis(v, idx[..., None], axis=1)
    for lp in p["layers"]:
        h = h + dense(lp["up"], gelu(dense(lp["down"],
                                           layer_norm(lp["ln"], h))))
    return h, a_lens


# ---------------------------------------------------------------------------
# moe (single-input): sparse mixture-of-experts projector — TPU-native
# extension beyond the reference's 8 connector types. GShard-style top-k
# routing with a *static* per-expert capacity so every step of the dispatch
# is a dense one-hot einsum the MXU can tile: no scatter, no dynamic shapes,
# no host round-trips. Expert weights are stacked [E, ...] and shard over
# the mesh "ep" axis (mesh/sharding.py rules); with the batch also sharded
# over ep, XLA's SPMD partitioner lowers the dispatch/combine einsums to the
# classic all-to-all exchange.
# ---------------------------------------------------------------------------

_MOE_LAYERS = 2


def moe_init(key, d_in, d_out, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    E = cfg.moe_experts
    hid = d_out * cfg.connector_hidden_mult
    keys = jax.random.split(key, _MOE_LAYERS + 1)
    blocks = []
    for i in range(_MOE_LAYERS):
        kr, k1, k2 = jax.random.split(keys[i], 3)
        blocks.append({
            "ln": norm_init(d_out, dtype=dtype),
            "router": {"w": normal_init(kr, (d_out, E), std=d_out ** -0.5,
                                        dtype=dtype)},
            "experts": {
                "w1": normal_init(k1, (E, d_out, hid), std=d_out ** -0.5,
                                  dtype=dtype),
                "b1": jnp.zeros((E, hid), dtype),
                "w2": normal_init(k2, (E, hid, d_out), std=hid ** -0.5,
                                  dtype=dtype),
                "b2": jnp.zeros((E, d_out), dtype),
            },
        })
    return {"inp": dense_init(keys[-1], d_in, d_out, dtype=dtype),
            "blocks": blocks}


def _moe_block(blk: Params, x: jax.Array, valid: jax.Array, topk: int,
               cap_factor: float, mesh, rowwise: bool = False
               ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One residual MoE-FFN over [B, T, d]. Returns (y, lb_loss, z_loss).

    Routing (slot-major capacity dispatch, aux losses) lives in
    ops.moe.route — shared with the LLM's MoE FFN layers; this block
    supplies the gelu two-matrix expert. ``rowwise`` (inference: engine
    staging, generate, speculative, streaming) routes each sequence
    within its own capacity slots so a request's features are identical
    at any batch composition — the encode-side half of the
    engine==generate token-exactness contract (models.llama._moe_mlp
    documents the cost trade)."""
    from avsr_tpu.ops import moe

    B, T, d = x.shape
    E = blk["experts"]["w1"].shape[0]

    w1, b1 = blk["experts"]["w1"], blk["experts"]["b1"]
    w2, b2 = blk["experts"]["w2"], blk["experts"]["b2"]
    cdt = x.dtype

    def experts(xs):                                            # [E, C', d]
        h = gelu(jnp.einsum("ecd,edf->ecf", xs, w1.astype(cdt))
                 + b1[:, None, :].astype(cdt))
        return (jnp.einsum("ecf,efd->ecd", h, w2.astype(cdt))
                + b2[:, None, :].astype(cdt))

    # Router in fp32: tiny matmul, and exp/softmax stability matters more
    # than MXU width here.
    if rowwise:
        C = moe.capacity(T, E, topk, cap_factor)
        logits = jnp.einsum("btd,de->bte", x.astype(jnp.float32),
                            blk["router"]["w"].astype(jnp.float32))

        # Cutoff from the row's valid length (capacity_dyn), not the
        # padded width T — see models.llama._moe_mlp: keeps routing
        # identical between engine staging buckets and standalone.
        def _row(lg, vl):
            cap = moe.capacity_dyn(vl.sum(), E, topk, cap_factor)
            return moe.route(lg, vl, topk, C, cap=cap)

        dispatch, combine, lb, z = jax.vmap(_row)(
            logits, valid.astype(jnp.float32))
        y = moe.dispatch_apply_rowwise(dispatch, combine, x, experts, mesh)
        return y, jnp.mean(lb), jnp.mean(z)

    N = B * T
    C = moe.capacity(N, E, topk, cap_factor)
    xf = x.reshape(N, d)
    vf = valid.reshape(N).astype(jnp.float32)                    # [N]
    logits = xf.astype(jnp.float32) @ blk["router"]["w"].astype(jnp.float32)
    dispatch, combine, lb, z = moe.route(logits, vf, topk, C)
    y = moe.dispatch_apply(dispatch, combine, xf, experts, mesh)
    return y.reshape(B, T, d), lb, z


def moe_apply(p: Params, x: jax.Array, lengths=None, *,
              model_cfg: ModelConfig | None = None, mesh=None,
              moe_rowwise: bool = False, **_):
    if model_cfg is None:
        raise ValueError("moe connector needs model_cfg threaded into apply")
    lens = _ident_lens(x, lengths)
    h = dense(p["inp"], x)
    valid = jnp.arange(h.shape[1])[None, :] < lens[:, None]
    lb = jnp.zeros((), jnp.float32)
    z = jnp.zeros((), jnp.float32)
    for blk in p["blocks"]:
        y, blb, bz = _moe_block(blk, layer_norm(blk["ln"], h), valid,
                                model_cfg.moe_topk,
                                model_cfg.moe_capacity_factor, mesh,
                                rowwise=moe_rowwise)
        h = h + y
        lb = lb + blb
        z = z + bz
    n = float(len(p["blocks"]))
    return h, lens, {"moe_lb": lb / n, "moe_z": z / n}


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def _register():
    CONNECTORS._items.clear()
    CONNECTORS.register("simple")(ConnectorDef(simple_init, simple_apply))
    CONNECTORS.register("deep")(ConnectorDef(deep_init, deep_apply))
    CONNECTORS.register("conv")(ConnectorDef(conv_init, conv_apply))
    CONNECTORS.register("attention")(ConnectorDef(attention_init, attention_apply))
    CONNECTORS.register("adaptive")(ConnectorDef(adaptive_init, adaptive_apply))
    CONNECTORS.register("cross_modal")(
        ConnectorDef(cross_modal_init, cross_modal_apply, dual=True))
    CONNECTORS.register("qformer")(
        ConnectorDef(qformer_init, qformer_apply, dual=True))
    CONNECTORS.register("perceiver")(
        ConnectorDef(perceiver_init, perceiver_apply, dual=True))
    CONNECTORS.register("adapter")(
        ConnectorDef(adapter_init, adapter_apply, dual=True))
    CONNECTORS.register("moe")(ConnectorDef(moe_init, moe_apply))


_register()


def get_connector(name: str) -> ConnectorDef:
    return CONNECTORS.get(name)
