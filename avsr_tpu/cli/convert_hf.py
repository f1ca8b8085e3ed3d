"""Convert local HF checkpoints (Whisper / CLIP / Llama) into avsr_tpu params.

The reference loads HF models live at startup (clip_whisper_model.py:864-1019)
and its README promises a download_models script that doesn't exist
(README.md:52). Here conversion is an explicit offline step: torch state
dicts from *local* HF directories are mapped into the avsr_tpu pytree
(models.*.convert_hf_*) around freshly-initialized connectors + LoRA, and
exported as an Orbax params checkpoint that ``--checkpoint`` accepts in
train/decode/validate.

    python -m avsr_tpu.cli.convert_hf --out exported/ \
        model.whisper_path=/ckpts/whisper-medium \
        model.clip_path=/ckpts/clip-vit-base-patch32 \
        model.llm_path=/ckpts/Llama-3.2-1B
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax

from avsr_tpu.cli.common import base_parser, load_cli_config

log = logging.getLogger("avsr.cli.convert_hf")


def _torch_state_dict(path: str, loader: str):
    """Load a local HF checkpoint's state dict without instantiating it on
    an accelerator. ``loader``: transformers class name."""
    import transformers

    cls = getattr(transformers, loader)
    model = cls.from_pretrained(path, local_files_only=True)
    return model.state_dict(), model.config


def build_converted_params(cfg) -> tuple[dict, list[str]]:
    """Fresh-init params with every component whose HF path is configured
    replaced by converted pretrained weights. Returns (params, notes) where
    notes names the converted components — shared by this CLI and the
    pretrained parity harness (cli.parity)."""
    m = cfg.model
    notes: list[str] = []

    from avsr_tpu.models.avsr import init_avsr_model
    from avsr_tpu.models.clip_vit import convert_hf_clip_vision
    from avsr_tpu.models.efficientnet import convert_hf_efficientnet
    from avsr_tpu.models.hubert import convert_hf_speech_ssl
    from avsr_tpu.models.llama import add_lora, convert_hf_llama
    from avsr_tpu.models.resnet import convert_hf_resnet
    from avsr_tpu.models.whisper_encoder import convert_hf_whisper_encoder

    params = init_avsr_model(jax.random.key(cfg.training.seed), m)

    if m.whisper_path and m.modality in ("audio", "both"):
        sd, hf_cfg = _torch_state_dict(m.whisper_path, "WhisperModel")
        if hf_cfg.d_model != m.whisper.d_model:
            raise ValueError(
                f"whisper d_model mismatch: HF {hf_cfg.d_model} vs config "
                f"{m.whisper.d_model}")
        params["whisper"] = convert_hf_whisper_encoder(sd, m.whisper)
        notes.append("whisper")
        log.info("converted whisper from %s", m.whisper_path)

    if (m.audio_encoder_path and m.modality in ("audio", "both")
            and m.audio_encoder in ("hubert", "wav2vec2")):
        loader = "HubertModel" if m.audio_encoder == "hubert" else "Wav2Vec2Model"
        sd, hf_cfg = _torch_state_dict(m.audio_encoder_path, loader)
        if hf_cfg.hidden_size != m.ssl.d_model:
            raise ValueError(
                f"{m.audio_encoder} d_model mismatch: HF {hf_cfg.hidden_size} "
                f"vs config {m.ssl.d_model}")
        params[m.audio_encoder] = convert_hf_speech_ssl(sd, m.ssl)
        notes.append(m.audio_encoder)
        log.info("converted %s from %s", m.audio_encoder, m.audio_encoder_path)

    if (m.video_encoder_path and m.modality in ("video", "both")
            and m.video_encoder == "resnet"):
        sd, hf_cfg = _torch_state_dict(m.video_encoder_path, "ResNetModel")
        if tuple(hf_cfg.hidden_sizes) != m.resnet.hidden_sizes:
            raise ValueError(
                f"resnet hidden_sizes mismatch: HF {hf_cfg.hidden_sizes} "
                f"vs config {m.resnet.hidden_sizes}")
        params["resnet"] = convert_hf_resnet(sd, m.resnet)
        notes.append("resnet")
        log.info("converted resnet from %s", m.video_encoder_path)

    if (m.video_encoder_path and m.modality in ("video", "both")
            and m.video_encoder == "efficientnet"):
        sd, hf_cfg = _torch_state_dict(m.video_encoder_path,
                                       "EfficientNetModel")
        if hf_cfg.hidden_dim != m.efficientnet.hidden_dim:
            raise ValueError(
                f"efficientnet hidden_dim mismatch: HF {hf_cfg.hidden_dim} "
                f"vs config {m.efficientnet.hidden_dim}")
        params["efficientnet"] = convert_hf_efficientnet(sd, m.efficientnet)
        notes.append("efficientnet")
        log.info("converted efficientnet from %s", m.video_encoder_path)

    if (m.video_encoder_path and m.modality in ("video", "both")
            and m.video_encoder == "avhubert"):
        # AV-HuBERT ships as fairseq .pt checkpoints, not HF dirs
        # (ref README.md:196-211 declares the family; config.py:55).
        from avsr_tpu.models.avhubert import (convert_fairseq_avhubert,
                                              load_fairseq_checkpoint)
        sd = load_fairseq_checkpoint(m.video_encoder_path)
        params["avhubert"] = convert_fairseq_avhubert(sd, m.avhubert)
        notes.append("avhubert")
        log.info("converted avhubert from fairseq ckpt %s",
                 m.video_encoder_path)

    if m.clip_path and m.modality in ("video", "both") and m.video_encoder == "clip":
        sd, hf_cfg = _torch_state_dict(m.clip_path, "CLIPVisionModel")
        if hf_cfg.hidden_size != m.clip.d_model:
            raise ValueError(
                f"clip d_model mismatch: HF {hf_cfg.hidden_size} vs config "
                f"{m.clip.d_model}")
        params["clip"] = convert_hf_clip_vision(sd, m.clip)
        notes.append("clip")
        log.info("converted clip from %s", m.clip_path)

    if m.llm_path:
        sd, hf_cfg = _torch_state_dict(m.llm_path, "AutoModelForCausalLM")
        if hf_cfg.hidden_size != m.llm.d_model:
            raise ValueError(
                f"llm d_model mismatch: HF {hf_cfg.hidden_size} vs config "
                f"{m.llm.d_model}")
        llm = convert_hf_llama(sd, m.llm)
        if m.lora.use_lora:
            llm = add_lora(jax.random.key(cfg.training.seed + 1), llm,
                           m.llm, m.lora)
        params["llm"] = llm
        notes.append("llm")
        log.info("converted llm from %s", m.llm_path)

    return params, notes


def main(argv: list[str] | None = None) -> int:
    p = base_parser("Convert local HF checkpoints to an avsr_tpu params export")
    p.add_argument("--out", required=True, help="output params directory")
    args = p.parse_args(argv)
    cfg = load_cli_config(args)

    from avsr_tpu.train.checkpoint import export_params

    params, notes = build_converted_params(cfg)
    out = Path(args.out).absolute()
    export_params(params, out)
    log.info("params export -> %s (converted: %s; load with --checkpoint %s)",
             out, ", ".join(notes) or "none", out)
    print(f"exported params to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
