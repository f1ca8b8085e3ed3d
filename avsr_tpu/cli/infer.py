"""Single-utterance inference: media file(s) in, transcript out.

The reference README documents a ``scripts/inference.py`` that does not
exist in its tree (README.md:145, SURVEY.md §0); this is the real one.

    python -m avsr_tpu.cli.infer --checkpoint ckpt/ --audio utt.wav \
        [--video utt.mp4] --config cfg.yaml [overrides]

Prints the transcript on stdout; everything heavy (featurization,
generation) runs on-device through the same jitted paths as cli.decode.
"""

from __future__ import annotations

import logging

import jax
import numpy as np

from avsr_tpu.cli.common import (base_parser, load_cli_config,
                                  load_decode_params)

log = logging.getLogger("avsr.cli.infer")


def main(argv: list[str] | None = None) -> int:
    p = base_parser("Transcribe one utterance")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--audio", default=None, help="WAV path")
    p.add_argument("--video", default=None, help="video path (mp4/npy)")
    args = p.parse_args(argv)
    cfg = load_cli_config(args)
    if not args.audio and not args.video:
        p.error("at least one of --audio / --video is required")

    from avsr_tpu.data.audio_io import load_audio
    from avsr_tpu.data.dataset import Sample, resize_crop_frames
    from avsr_tpu.data.loader import (audio_frontend_for, collate, featurize,
                                      image_stats_for)
    from avsr_tpu.data.tokenizer import load_tokenizer
    from avsr_tpu.data.video_io import load_frames
    from avsr_tpu.infer.generate import generate

    # The checkpoint's param tree is built from model.modality, so the
    # provided media must match it (override model.modality=... on the
    # command line to run a different mode — that path re-validates).
    need_audio = cfg.model.modality in ("audio", "both")
    need_video = cfg.model.modality in ("video", "both")
    if (need_audio and not args.audio) or (need_video and not args.video):
        p.error(f"model.modality={cfg.model.modality!r} needs "
                f"{'--audio ' if need_audio else ''}"
                f"{'--video' if need_video else ''} "
                "(or override model.modality=audio/video/both)")
    if not args.checkpoint:
        log.warning("no --checkpoint: transcribing with RANDOM weights "
                    "(smoke-test mode — output is meaningless)")

    tok = load_tokenizer(cfg.model.llm_path or None)
    audio = (load_audio(args.audio, max_samples=cfg.data.max_audio_length)
             if args.audio else None)
    frames = None
    if args.video:
        raw = load_frames(args.video, cfg.data.max_video_length)
        frames = resize_crop_frames(raw, cfg.model.image_size)
    sample = Sample("cli", audio, frames, "", [tok.eos_id])
    prompt_ids = tok.encode(cfg.model.prompt, add_bos=True)
    hb = collate([sample], cfg.data, prompt_ids, tok.pad_id)
    batch = featurize(hb, cfg.runtime.compute_dtype,
                      audio_frontend_for(cfg.model),
                      image_stats_for(cfg.model))

    params = load_decode_params(cfg, args.checkpoint)
    out = generate(params, cfg.model, batch, cfg.decode, eos_id=tok.eos_id,
                   rng=jax.random.key(cfg.training.seed),
                   compute_dtype=cfg.runtime.compute_dtype,
                   use_pallas=cfg.runtime.use_pallas)
    text = tok.decode(np.asarray(out.tokens)[0, : int(out.lengths[0])])
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
