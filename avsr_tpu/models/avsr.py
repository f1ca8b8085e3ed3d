"""AVSR model composition: Whisper + CLIP + connectors + Llama(+LoRA).

The TPU-native counterpart of the reference's ``ClipWhisperModel``
(src/clip_whisper/models/clip_whisper_model.py:24-1452): three modality modes
(audio / video / both), fusion via weighted sum (ref encode() :424-435),
sequence concat, or a dual-input fusion connector (the capability the
reference declared but never wired — SURVEY.md §2.1), causal-LM loss over
transcripts, and an embeddings-prefix for generation.

Design departure (deliberate, see SURVEY.md §7 "hard parts"): the reference
warps encoder output to the label length with pooling/interpolation at train
time (clip_whisper_model.py:573-598, 621-707) — lossy. Here the training
sequence is the *packed* concatenation

    [prompt tokens][AV features][label tokens]

built by a static-shape gather (`pack_segments`) that squeezes out
mid-sequence padding, so the whole thing is right-padded and runs through the
causal flash-attention path with plain per-sample lengths. Loss is masked CE
on the label positions only.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from avsr_tpu.core.config import ModelConfig
from avsr_tpu.models import llama as llama_mod
from avsr_tpu.models.clip_vit import clip_vit_apply, init_clip_vit
from avsr_tpu.models.connectors import get_connector
from avsr_tpu.models.avhubert import avhubert_apply, init_avhubert
from avsr_tpu.models.efficientnet import efficientnet_apply, init_efficientnet
from avsr_tpu.models.hubert import init_speech_ssl, speech_ssl_apply
from avsr_tpu.models.layers import Params, param_count
from avsr_tpu.models.resnet import init_resnet, resnet_apply
from avsr_tpu.models.whisper_encoder import init_whisper_encoder, whisper_encoder_apply

# Params-tree keys of the (freezable) encoder subtrees, by config name.
ENCODER_KEYS = ("whisper", "hubert", "wav2vec2", "clip", "resnet",
                "efficientnet", "avhubert")


class Batch(NamedTuple):
    """One training/eval batch. Unused modality fields may be None."""

    mel: jax.Array | None = None          # [B, n_mels, Tmel]
    mel_lens: jax.Array | None = None     # [B] (mel frames)
    frames: jax.Array | None = None       # [B, Tv, 3, S, S]
    frame_lens: jax.Array | None = None   # [B]
    prompt_tokens: jax.Array | None = None  # [Tp] or [B, Tp] (incl. BOS)
    labels: jax.Array | None = None       # [B, Tl] token ids, right-padded
    label_lens: jax.Array | None = None   # [B] (incl. EOS)
    # Raw-waveform front end (audio_encoder hubert/wav2vec2; mel unused then)
    wave: jax.Array | None = None         # [B, T_samples] float32
    wave_lens: jax.Array | None = None    # [B] (samples)


class EncodeOut(NamedTuple):
    features: jax.Array                   # [B, Tf, d_llm]
    lengths: jax.Array                    # [B]
    # Auxiliary scalar losses surfaced by the connector (the MoE connector's
    # load-balance / z losses); None for every dense connector. (None, not
    # a `{}` default: a class-level mutable default would alias one dict
    # across every default-constructed instance.)
    aux: dict | None = None


# ---------------------------------------------------------------------------
# Static-shape segment packing
# ---------------------------------------------------------------------------

def pack_segments(
    segments: list[tuple[jax.Array, jax.Array]],
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Concatenate right-padded segments, squeezing out mid-sequence padding.

    segments: list of (emb [B, T_s, d], lens [B]). Returns
      packed   [B, sum(T_s), d]  — valid items contiguous from position 0
      total    [B]               — per-sample packed length
      seg_start [B, n_segments]  — packed start offset of each segment
    Pure gather; all shapes static, jit/pjit-safe, differentiable w.r.t. embs.
    """
    B = segments[0][0].shape[0]
    caps = [int(e.shape[1]) for e, _ in segments]
    Ttot = sum(caps)
    src = jnp.concatenate([e for e, _ in segments], axis=1)     # [B, Ttot, d]
    lens = jnp.stack([l.astype(jnp.int32) for _, l in segments], axis=1)  # [B,S]
    seg_start = jnp.cumsum(lens, axis=1) - lens                 # packed starts
    total = jnp.sum(lens, axis=1)
    src_start = jnp.asarray(
        [sum(caps[:i]) for i in range(len(caps))], jnp.int32)   # [S]

    j = jnp.arange(Ttot)[None, :]                               # [1, Ttot]
    # segment id of packed position j: number of segments fully before j
    seg_end = seg_start + lens                                  # [B, S]
    seg_id = jnp.sum(j[:, :, None] >= seg_end[:, None, :], axis=-1)  # [B,Ttot]
    seg_id = jnp.clip(seg_id, 0, len(caps) - 1)
    src_idx = (jnp.take(src_start, seg_id)
               + j - jnp.take_along_axis(seg_start, seg_id, axis=1))
    src_idx = jnp.clip(src_idx, 0, Ttot - 1)
    packed = jnp.take_along_axis(src, src_idx[..., None], axis=1)
    return packed, total, seg_start


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_avsr_model(key: jax.Array, cfg: ModelConfig,
                    dtype: jnp.dtype = jnp.float32) -> Params:
    kw, kc, kl, ka, kv, kf, klora = jax.random.split(key, 7)
    params: Params = {}
    d_llm = cfg.llm.d_model
    conn = get_connector(cfg.connector_type)

    if cfg.modality in ("audio", "both"):
        if cfg.audio_encoder == "whisper":
            params["whisper"] = init_whisper_encoder(kw, cfg.whisper, dtype)
        else:   # hubert / wav2vec2 share the SSL module (models.hubert)
            params[cfg.audio_encoder] = init_speech_ssl(kw, cfg.ssl, dtype)
    if cfg.modality in ("video", "both"):
        if cfg.video_encoder == "clip":
            params["clip"] = init_clip_vit(kc, cfg.clip, dtype)
        elif cfg.video_encoder == "resnet":
            params["resnet"] = init_resnet(kc, cfg.resnet, dtype)
        elif cfg.video_encoder == "efficientnet":
            params["efficientnet"] = init_efficientnet(
                kc, cfg.efficientnet, dtype)
        else:
            params["avhubert"] = init_avhubert(kc, cfg.avhubert, dtype)

    if conn.dual:
        params["connector"] = conn.init(
            kf, cfg.audio_dim, cfg.video_dim, d_llm, cfg, dtype)
    else:
        if cfg.modality in ("audio", "both"):
            params["audio_connector"] = conn.init(
                ka, cfg.audio_dim, d_llm, cfg, dtype)
        if cfg.modality in ("video", "both"):
            params["video_connector"] = conn.init(
                kv, cfg.video_dim, d_llm, cfg, dtype)

    llm = llama_mod.init_llama(kl, cfg.llm, dtype)
    if cfg.lora.use_lora:
        llm = llama_mod.add_lora(klora, llm, cfg.llm, cfg.lora, dtype)
    params["llm"] = llm
    return params


# ---------------------------------------------------------------------------
# Encode (audio / video / fusion) -> LLM-space features
# ---------------------------------------------------------------------------

def _upsample_to(x: jax.Array, x_lens: jax.Array, target_T: int,
                 target_lens: jax.Array) -> jax.Array:
    """Nearest-index resample of [B, T, d] onto the target time grid."""
    ratio = (jnp.maximum(x_lens, 1).astype(jnp.float32)
             / jnp.maximum(target_lens, 1).astype(jnp.float32))
    idx = jnp.clip((jnp.arange(target_T)[None, :] * ratio[:, None]).astype(jnp.int32),
                   0, x.shape[1] - 1)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def encode(
    params: Params,
    cfg: ModelConfig,
    batch: Batch,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: str = "auto",
    remat: bool = False,
    mesh=None,
    moe_rowwise: bool = False,
) -> EncodeOut:
    """Run the modality encoders + connectors. Mirrors ref encode() :407-462.

    ``mesh`` with an sp axis > 1 activates sequence-parallel ring attention
    inside the encoders and the LLM (ops.ring_attention) — long sequences
    become a sharding decision instead of the reference's truncation
    (clip_whisper_model.py:320-374).

    ``moe_rowwise`` (inference callers) routes the MoE connector
    per-sequence so a request's features are independent of the batch it
    shares — see models.llama.llama_apply's same-named flag."""
    conn = get_connector(cfg.connector_type)
    audio_feat = audio_lens = video_feat = video_lens = None

    def conn_out(ret):
        """Connector applies return (y, lens) or (y, lens, aux_losses)."""
        if len(ret) == 3:
            return ret
        y, lens = ret
        return y, lens, {}

    if cfg.modality in ("audio", "both"):
        if cfg.audio_encoder == "whisper":
            feats, alens = whisper_encoder_apply(
                params["whisper"], batch.mel, cfg.whisper,
                mel_lengths=batch.mel_lens, compute_dtype=compute_dtype,
                use_pallas=use_pallas, remat=remat, mesh=mesh)
        else:
            feats, alens = speech_ssl_apply(
                params[cfg.audio_encoder], batch.wave, cfg.ssl,
                wave_lengths=batch.wave_lens, compute_dtype=compute_dtype,
                use_pallas=use_pallas, remat=remat, mesh=mesh)
        # stop_gradient is both semantics and a perf lever (no encoder
        # backward pass) — but unfreeze_layer_norms needs gradients to
        # reach the encoder LNs, so it disables the short-circuit.
        if cfg.freeze_encoders and not cfg.unfreeze_layer_norms:
            feats = jax.lax.stop_gradient(feats)
        audio_feat, audio_lens = feats, alens

    if cfg.modality in ("video", "both"):
        if cfg.video_encoder == "clip":
            vfeats = clip_vit_apply(
                params["clip"], batch.frames, cfg.clip,
                compute_dtype=compute_dtype, use_pallas=use_pallas,
                remat=remat)
        elif cfg.video_encoder == "resnet":
            vfeats = resnet_apply(
                params["resnet"], batch.frames, cfg.resnet,
                compute_dtype=compute_dtype, use_pallas=use_pallas,
                remat=remat)
        elif cfg.video_encoder == "efficientnet":
            vfeats = efficientnet_apply(
                params["efficientnet"], batch.frames, cfg.efficientnet,
                compute_dtype=compute_dtype, use_pallas=use_pallas,
                remat=remat)
        else:
            vfeats = avhubert_apply(
                params["avhubert"], batch.frames, cfg.avhubert,
                frame_lengths=batch.frame_lens,
                compute_dtype=compute_dtype, use_pallas=use_pallas,
                remat=remat, mesh=mesh)
        # finetune_avhubert_layers marks selected AV-HuBERT blocks trainable
        # (train/state.py trainable_mask) — the stop_gradient short-circuit
        # would starve them of gradient, so it must stay off for that combo
        # (round-1 advisor finding: the "trainable" layers got exactly zero
        # grad and could even decay away under AdamW).
        _avhubert_finetune = (cfg.video_encoder == "avhubert"
                              and bool(cfg.finetune_avhubert_layers))
        if (cfg.freeze_encoders and not cfg.unfreeze_layer_norms
                and not _avhubert_finetune):
            vfeats = jax.lax.stop_gradient(vfeats)
        video_feat = vfeats
        video_lens = (batch.frame_lens.astype(jnp.int32)
                      if batch.frame_lens is not None
                      else jnp.full((vfeats.shape[0],), vfeats.shape[1], jnp.int32))

    ckw = dict(use_pallas=use_pallas, model_cfg=cfg, mesh=mesh,
               moe_rowwise=moe_rowwise)
    if conn.dual:
        out, lens, aux = conn_out(conn.apply(
            params["connector"], audio_feat, video_feat,
            audio_lens, video_lens, **ckw))
        return _cap_seq(EncodeOut(out, lens, aux), cfg.max_seq_len)

    if cfg.modality == "audio":
        out, lens, aux = conn_out(conn.apply(
            params["audio_connector"], audio_feat, audio_lens, **ckw))
        return _cap_seq(EncodeOut(out, lens, aux), cfg.max_seq_len)
    if cfg.modality == "video":
        out, lens, aux = conn_out(conn.apply(
            params["video_connector"], video_feat, video_lens, **ckw))
        return _cap_seq(EncodeOut(out, lens, aux), cfg.max_seq_len)

    # modality == "both", single-input connectors
    a_out, a_lens2, a_aux = conn_out(conn.apply(
        params["audio_connector"], audio_feat, audio_lens, **ckw))
    v_out, v_lens2, v_aux = conn_out(conn.apply(
        params["video_connector"], video_feat, video_lens, **ckw))
    # two single-input connectors -> average their aux losses
    aux = {k: 0.5 * (a_aux[k] + v_aux[k]) for k in a_aux}
    if cfg.fusion_mode == "concat_seq":
        packed, total, _ = pack_segments([(a_out, a_lens2), (v_out, v_lens2)])
        return _cap_seq(EncodeOut(packed, total, aux), cfg.max_seq_len)
    # weighted_sum (ref :424-435): align video onto the audio time grid, then
    # fusion_scale * audio + (1 - fusion_scale) * video.
    v_up = _upsample_to(v_out, v_lens2, a_out.shape[1], a_lens2)
    fused = cfg.fusion_scale * a_out + (1.0 - cfg.fusion_scale) * v_up
    return _cap_seq(EncodeOut(fused, a_lens2, aux), cfg.max_seq_len)


def _cap_seq(enc: EncodeOut, max_seq_len: int) -> EncodeOut:
    """Honor ModelConfig.max_seq_len as a hard cap on the fused feature
    sequence (ref applies it at clip_whisper_model.py:427). With SP sharding
    long sequences scale instead (ops.ring_attention) — the cap only bites
    when configured below the bucket capacity."""
    if enc.features.shape[1] <= max_seq_len:
        return enc
    return EncodeOut(enc.features[:, :max_seq_len],
                     jnp.minimum(enc.lengths, max_seq_len), enc.aux)


# ---------------------------------------------------------------------------
# Forward: packed causal-LM loss
# ---------------------------------------------------------------------------

def build_prefix(
    params: Params,
    cfg: ModelConfig,
    batch: Batch,
    enc: EncodeOut,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """[prompt embeds][features] packed -> (embeds [B, Tp+Tf, d], lens [B])."""
    B = enc.features.shape[0]
    prompt = batch.prompt_tokens
    if prompt.ndim == 1:
        prompt = jnp.broadcast_to(prompt[None], (B, prompt.shape[0]))
    p_emb = llama_mod.embed_tokens(params["llm"], prompt, compute_dtype)
    p_lens = jnp.full((B,), prompt.shape[1], jnp.int32)
    packed, total, _ = pack_segments(
        [(p_emb, p_lens), (enc.features.astype(compute_dtype), enc.lengths)])
    return packed, total


def forward(
    params: Params,
    cfg: ModelConfig,
    batch: Batch,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: str = "auto",
    remat: bool = False,
    dropout_rng: jax.Array | None = None,
    mesh=None,
    return_logits: bool = False,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Training/eval forward: returns (mean CE loss, metrics dict).

    ``return_logits`` additionally puts the label-position vocab logits
    ([B, Tl, V]) and their validity mask ([B, Tl]) into the metrics as
    ``label_logits`` / ``label_mask`` — the distillation trainer
    (cli.distill) matches a student against these teacher distributions.
    Off by default: the tensor is V-wide per label token, which the CE
    path deliberately never materializes beyond this gather."""
    enc = encode(params, cfg, batch, compute_dtype=compute_dtype,
                 use_pallas=use_pallas, remat=remat, mesh=mesh)

    B = enc.features.shape[0]
    prompt = batch.prompt_tokens
    if prompt.ndim == 1:
        prompt = jnp.broadcast_to(prompt[None], (B, prompt.shape[0]))
    Tp = prompt.shape[1]
    p_emb = llama_mod.embed_tokens(params["llm"], prompt, compute_dtype)
    p_lens = jnp.full((B,), Tp, jnp.int32)
    lab_emb = llama_mod.embed_tokens(params["llm"], batch.labels, compute_dtype)
    lab_lens = batch.label_lens.astype(jnp.int32)

    packed, total, seg_start = pack_segments([
        (p_emb, p_lens),
        (enc.features.astype(compute_dtype), enc.lengths),
        (lab_emb, lab_lens),
    ])
    # Align the packed width to the flash kernel's sublane tile (16) ONCE:
    # every LLM layer's attention otherwise pads q/k/v up and slices the
    # output back — 2 copies/layer/direction, ~3.5 ms/step at the flagship
    # shape (profile: jvp(flash_attention)/_pad). Zero rows past `total`
    # are masked everywhere (causal+lens) and the label gather below is
    # positional, so the extra columns are inert.
    pad_t = -packed.shape[1] % 16
    if pad_t:
        packed = jnp.pad(packed, ((0, 0), (0, pad_t), (0, 0)))
    Ttot = packed.shape[1]
    label_start = seg_start[:, 2]                       # [B]

    llm_aux = None
    llm_kw = dict(
        inputs_embeds=packed, lengths=total,
        lora=cfg.lora if cfg.lora.use_lora else None,
        compute_dtype=compute_dtype, use_pallas=use_pallas, remat=remat,
        dropout_rng=dropout_rng, output="hidden", mesh=mesh)
    if cfg.llm.moe_experts > 0:
        hidden, _, llm_aux = llama_mod.llama_apply(
            params["llm"], cfg.llm, return_aux=True, **llm_kw)
    else:
        hidden, _ = llama_mod.llama_apply(params["llm"], cfg.llm, **llm_kw)

    # CE only where it matters: label token i (packed position
    # label_start+i) is predicted from hidden at label_start+i-1. Gather
    # those Tl hidden rows FIRST, then project to vocab — [B, Tl, V]
    # instead of [B, Ttot, V] (the full-logits tensor would be GBs at a
    # 128k vocab; see llama_apply output="hidden").
    Tl = batch.labels.shape[1]
    i = jnp.arange(Tl)[None, :]                                        # [1,Tl]
    pred_pos = jnp.clip(label_start[:, None] + i - 1, 0, Ttot - 1)     # [B,Tl]
    h_pred = jnp.take_along_axis(hidden, pred_pos[..., None], axis=1)  # [B,Tl,d]
    logits = llama_mod.compute_logits(params["llm"], cfg.llm, h_pred)  # [B,Tl,V]

    mask = (i < lab_lens[:, None]).astype(jnp.float32)                 # [B,Tl]
    targets = batch.labels
    logp = jax.nn.log_softmax(logits, axis=-1)
    pred_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    n_tokens = jnp.maximum(jnp.sum(mask), 1.0)
    loss = -jnp.sum(pred_lp * mask) / n_tokens

    correct = (jnp.argmax(logits, axis=-1) == targets)
    acc = jnp.sum(correct * mask) / n_tokens
    metrics = {"loss": loss, "accuracy": acc, "label_tokens": n_tokens,
               "feat_len_mean": jnp.mean(enc.lengths.astype(jnp.float32))}
    if return_logits:
        metrics["label_logits"] = logits
        metrics["label_mask"] = mask
    # MoE router auxiliaries (connector and/or LLM MoE layers): weighted
    # into the optimized loss so the routers learn balanced dispatch
    # (metrics keep the raw summed values).
    enc_aux = enc.aux or {}
    moe_lb = enc_aux.get("moe_lb")
    moe_z = enc_aux.get("moe_z")
    if llm_aux is not None:
        moe_lb = llm_aux["moe_lb"] + (0.0 if moe_lb is None else moe_lb)
        moe_z = llm_aux["moe_z"] + (0.0 if moe_z is None else moe_z)
    if moe_lb is not None:
        aux_loss = cfg.moe_aux_weight * moe_lb + cfg.moe_z_weight * moe_z
        loss = loss + aux_loss.astype(loss.dtype)
        metrics["moe_lb"] = moe_lb
        metrics["moe_z"] = moe_z
        metrics["loss"] = loss
    return loss, metrics


# ---------------------------------------------------------------------------
# Introspection (ref param/arch logging :1021-1065, :1192-1238)
# ---------------------------------------------------------------------------

def summarize(params: Params, cfg: ModelConfig) -> dict[str, Any]:
    from avsr_tpu.train.state import trainable_mask  # local import, no cycle

    counts = {k: param_count(v) for k, v in params.items()}
    mask = trainable_mask(params, cfg)
    trainable = sum(
        int(p.size) for p, m in zip(jax.tree_util.tree_leaves(params),
                                    jax.tree_util.tree_leaves(mask)) if m)
    return {
        "total_params": sum(counts.values()),
        "per_component": counts,
        "trainable_params": trainable,
        "modality": cfg.modality,
        "connector": cfg.connector_type,
    }
