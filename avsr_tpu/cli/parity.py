"""Pretrained-weights parity harness: convert real HF checkpoints, assert
per-module numeric parity against torch, decode a real WAV end to end, and
write a ``parity_report.json`` golden.

The reference exists to wrap *pretrained* Whisper/CLIP/Llama
(/root/reference/src/clip_whisper/models/clip_whisper_model.py:864-1019;
scripts/clip_whisper/decode.py:126-197 rebuilds the stack from them). The
repo's converters are parity-tested against random-init HF modules at tiny
sizes (tests/test_models_*.py); THIS harness is the missing last mile — run
it the moment real checkpoint directories exist locally:

    python -m avsr_tpu.cli.parity --report parity_report.json \
        [--wav utt.wav [--ref-text "ground truth"]] \
        model.whisper_path=/ckpts/whisper-medium \
        model.clip_path=/ckpts/clip-vit-base-patch32 \
        model.llm_path=/ckpts/Llama-3.2-1B

Per configured component it loads the torch module (local_files_only),
converts the state dict with the same ``models.*.convert_hf_*`` mapping the
export CLI uses, runs a deterministic input through both stacks at HIGHEST
matmul precision, and records max/mean absolute error against a documented
tolerance. With ``--wav`` it additionally assembles the full converted model
and greedy-decodes one real utterance (the reference decode.py protocol:
greedy, max_new_tokens from config), recording the transcript (and WER when
``--ref-text`` is given).

Exit status: 0 = every checked module within tolerance; 1 = at least one
out of tolerance; 3 = no assets found (nothing checked) — the gated test
(tests/test_parity_pretrained.py) treats 3 as SKIP, so the harness is
always armed without blocking offline CI.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import jax
import numpy as np

from avsr_tpu.cli.common import base_parser, load_cli_config

log = logging.getLogger("avsr.cli.parity")

# Documented per-module max-abs-error tolerances, f32 forward at HIGHEST
# matmul precision. Encoders compare hidden states (O(1) magnitudes);
# the LLM compares vocab logits (O(10) magnitudes at 1B scale, deeper
# accumulation) so it gets a proportionally looser bound.
TOLERANCES = {
    "whisper": 2e-3,
    "hubert": 2e-3,
    "wav2vec2": 2e-3,
    "clip": 2e-3,
    "resnet": 2e-3,
    "efficientnet": 2e-3,
    "llm": 5e-2,
}


def _err(ours: np.ndarray, ref: np.ndarray) -> dict:
    d = np.abs(np.asarray(ours, np.float64) - np.asarray(ref, np.float64))
    return {
        "max_abs_err": float(d.max()),
        "mean_abs_err": float(d.mean()),
        "ref_abs_mean": float(np.abs(ref).mean()),
    }


def _module_entry(name: str, path: str, ours, ref) -> dict:
    e = _err(ours, ref)
    tol = TOLERANCES[name]
    entry = {"path": path, "tol_max_abs": tol, **e,
             "pass": bool(e["max_abs_err"] <= tol)}
    log.info("%s: max|err| %.2e (tol %.0e) mean|err| %.2e -> %s",
             name, e["max_abs_err"], tol, e["mean_abs_err"],
             "PASS" if entry["pass"] else "FAIL")
    return entry


def _check_whisper(m, rng) -> dict:
    import torch
    from transformers import WhisperModel

    from avsr_tpu.models.whisper_encoder import (convert_hf_whisper_encoder,
                                                 whisper_encoder_apply)

    model = WhisperModel.from_pretrained(m.whisper_path,
                                         local_files_only=True).eval()
    params = convert_hf_whisper_encoder(model.state_dict(), m.whisper)
    mel = rng.standard_normal(
        (1, m.whisper.n_mels, m.whisper.max_frames)).astype(np.float32)
    with torch.no_grad():
        ref = model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    del model
    out, _ = whisper_encoder_apply(params, mel, m.whisper, use_pallas="never")
    return _module_entry("whisper", m.whisper_path, out, ref)


def _check_ssl(m, rng) -> dict:
    import torch

    from avsr_tpu.models.hubert import convert_hf_speech_ssl, speech_ssl_apply

    if m.audio_encoder == "hubert":
        from transformers import HubertModel as Cls
    else:
        from transformers import Wav2Vec2Model as Cls
    model = Cls.from_pretrained(m.audio_encoder_path,
                                local_files_only=True).eval()
    params = convert_hf_speech_ssl(model.state_dict(), m.ssl)
    wave = (0.1 * rng.standard_normal((1, 16000))).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(wave)).last_hidden_state.numpy()
    del model
    out, _ = speech_ssl_apply(params, wave, m.ssl, use_pallas="never")
    return _module_entry(m.audio_encoder, m.audio_encoder_path, out, ref)


def _check_clip(m, rng) -> dict:
    import torch
    from transformers import CLIPVisionModel

    from avsr_tpu.models.clip_vit import clip_vit_apply, convert_hf_clip_vision

    model = CLIPVisionModel.from_pretrained(m.clip_path,
                                            local_files_only=True).eval()
    params = convert_hf_clip_vision(model.state_dict(), m.clip)
    imgs = rng.standard_normal(
        (2, 3, m.clip.image_size, m.clip.image_size)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(imgs)).pooler_output.numpy()
    del model
    out = clip_vit_apply(params, imgs[None], m.clip, use_pallas="never",
                         pool="pooled")
    return _module_entry("clip", m.clip_path, np.asarray(out)[0], ref)


def _check_resnet(m, rng) -> dict:
    import torch
    from transformers import ResNetModel

    from avsr_tpu.models.resnet import convert_hf_resnet, resnet_apply

    model = ResNetModel.from_pretrained(m.video_encoder_path,
                                        local_files_only=True).eval()
    params = convert_hf_resnet(model.state_dict(), m.resnet)
    imgs = rng.standard_normal(
        (2, 3, m.resnet.image_size, m.resnet.image_size)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(imgs)).pooler_output.numpy().reshape(2, -1)
    del model
    out = resnet_apply(params, imgs, m.resnet)     # [N,3,S,S] -> [N, d]
    return _module_entry("resnet", m.video_encoder_path, np.asarray(out), ref)


def _check_efficientnet(m, rng) -> dict:
    import torch
    from transformers import EfficientNetModel

    from avsr_tpu.models.efficientnet import (convert_hf_efficientnet,
                                              efficientnet_apply)

    model = EfficientNetModel.from_pretrained(m.video_encoder_path,
                                              local_files_only=True).eval()
    params = convert_hf_efficientnet(model.state_dict(), m.efficientnet)
    imgs = rng.standard_normal(
        (2, 3, m.efficientnet.image_size,
         m.efficientnet.image_size)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(imgs)).pooler_output.numpy()
    del model
    out = efficientnet_apply(params, imgs, m.efficientnet)   # [N,3,S,S]->[N,d]
    return _module_entry("efficientnet", m.video_encoder_path,
                         np.asarray(out), ref)


def _check_llm(m, rng) -> dict:
    import torch
    from transformers import AutoModelForCausalLM

    from avsr_tpu.models import llama as L

    model = AutoModelForCausalLM.from_pretrained(
        m.llm_path, local_files_only=True, torch_dtype=torch.float32).eval()
    params = L.convert_hf_llama(model.state_dict(), m.llm)
    tokens = rng.integers(0, m.llm.vocab_size, (1, 16))
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    del model
    embeds = L.embed_tokens(params, np.asarray(tokens))
    logits, _ = L.llama_apply(params, m.llm, inputs_embeds=embeds,
                              use_pallas="never")
    return _module_entry("llm", m.llm_path, np.asarray(logits), ref)


def _decode_wav(cfg, wav: str, ref_text: str | None) -> dict:
    """Assemble the fully converted model and greedy-decode one real WAV
    (the reference decode.py protocol)."""
    from avsr_tpu.cli.convert_hf import build_converted_params
    from avsr_tpu.data.audio_io import load_audio
    from avsr_tpu.data.dataset import Sample
    from avsr_tpu.data.loader import (audio_frontend_for, collate, featurize,
                                      image_stats_for)
    from avsr_tpu.data.tokenizer import load_tokenizer
    from avsr_tpu.infer.generate import generate

    params, notes = build_converted_params(cfg)
    llm_dir = Path(cfg.model.llm_path) if cfg.model.llm_path else None
    if llm_dir and (llm_dir / "tokenizer.json").exists():
        tok = load_tokenizer(llm_dir)
    else:
        log.warning("no tokenizer.json under %s — decoding with the byte "
                    "tokenizer (transcript will be bytes, not LLM text)",
                    llm_dir)
        tok = load_tokenizer(None)
    audio = load_audio(wav, max_samples=cfg.data.max_audio_length)
    sample = Sample("parity", audio, None, "", [tok.eos_id])
    prompt_ids = tok.encode(cfg.model.prompt, add_bos=True)
    hb = collate([sample], cfg.data, prompt_ids, tok.pad_id)
    batch = featurize(hb, cfg.runtime.compute_dtype,
                      audio_frontend_for(cfg.model),
                      image_stats_for(cfg.model))
    out = generate(params, cfg.model, batch, cfg.decode, eos_id=tok.eos_id,
                   rng=jax.random.key(0),
                   compute_dtype=cfg.runtime.compute_dtype,
                   use_pallas=cfg.runtime.use_pallas)
    text = tok.decode(np.asarray(out.tokens)[0, : int(out.lengths[0])])
    log.info("E2E transcript (%s): %r", wav, text)
    entry = {"wav": wav, "converted": notes, "transcript": text}
    if ref_text is not None:
        from avsr_tpu.infer.wer import wer
        entry["ref"] = ref_text
        entry["wer"] = wer(ref_text, text)
        log.info("E2E WER vs --ref-text: %.3f", entry["wer"])
    return entry


def _decode_manifest(cfg, manifest_dir: str, split: str) -> dict:
    """The FULL reference eval protocol on converted pretrained weights:
    batched greedy decode over ``{split}.tsv``/``{split}.wrd`` (with the
    utt-id alias logic the manifest dataset carries), corpus WER/CER, and
    the ``results_{ts}.txt`` + ``wer_{ts}.txt`` artifacts — one command
    reproducing /root/reference/scripts/clip_whisper/decode.py:316-440,
    656-686 the moment real assets exist."""
    import dataclasses

    from avsr_tpu.cli.convert_hf import build_converted_params
    from avsr_tpu.cli.decode import run_protocol
    from avsr_tpu.data.dataset import build_dataset
    from avsr_tpu.data.loader import DataLoader
    from avsr_tpu.data.tokenizer import load_tokenizer
    from avsr_tpu.infer.generate import prepare_params_for_decode

    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, path=str(manifest_dir), synthetic=False))
    params, notes = build_converted_params(cfg)
    params = prepare_params_for_decode(params, cfg.model)
    llm_dir = Path(cfg.model.llm_path) if cfg.model.llm_path else None
    if llm_dir and (llm_dir / "tokenizer.json").exists():
        tok = load_tokenizer(llm_dir)
    else:
        log.warning("no tokenizer.json under %s — decoding with the byte "
                    "tokenizer (WER will not be meaningful)", llm_dir)
        tok = load_tokenizer(None)
    ds = build_dataset(cfg.data, tok, split=split,
                       modality=cfg.model.modality,
                       image_size=cfg.model.image_size)
    loader = DataLoader(ds, cfg.data, tok, model_cfg=cfg.model,
                        batch_size=cfg.decode.batch_size, shuffle=False,
                        compute_dtype=cfg.runtime.compute_dtype)
    stats: dict = {}
    run_protocol(cfg, params, tok, ds, loader, stats_out=stats)
    log.info("manifest eval (%s/%s): WER %.4f over %d utts", manifest_dir,
             split, stats.get("wer", float("nan")), stats.get("utterances", 0))
    return {"manifest": str(manifest_dir), "split": split,
            "converted": notes, **stats}


def main(argv: list[str] | None = None) -> int:
    p = base_parser("Pretrained-weights parity harness (HF torch vs avsr_tpu)")
    p.add_argument("--report", default="parity_report.json")
    p.add_argument("--wav", default=None,
                   help="real WAV for the end-to-end decode check")
    p.add_argument("--ref-text", default=None,
                   help="reference transcript for --wav (records WER)")
    p.add_argument("--manifest", default=None,
                   help="LRS3-style manifest dir: run the full reference "
                        "eval protocol (batch decode + corpus WER + "
                        "results_/wer_ artifacts) on converted weights")
    p.add_argument("--split", default="test",
                   help="manifest split for --manifest (default: test)")
    args = p.parse_args(argv)
    cfg = load_cli_config(args)
    m = cfg.model
    # bf16-pass matmuls (this XLA build's default) would dominate the
    # parity error; pin full f32 for the comparison.
    jax.config.update("jax_default_matmul_precision", "highest")
    rng = np.random.default_rng(0)

    checks = [
        ("whisper", m.whisper_path,
         m.modality in ("audio", "both") and m.audio_encoder == "whisper",
         _check_whisper),
        (m.audio_encoder, m.audio_encoder_path,
         m.modality in ("audio", "both")
         and m.audio_encoder in ("hubert", "wav2vec2"), _check_ssl),
        ("clip", m.clip_path,
         m.modality in ("video", "both") and m.video_encoder == "clip",
         _check_clip),
        ("resnet", m.video_encoder_path,
         m.modality in ("video", "both") and m.video_encoder == "resnet",
         _check_resnet),
        ("efficientnet", m.video_encoder_path,
         m.modality in ("video", "both")
         and m.video_encoder == "efficientnet", _check_efficientnet),
        ("llm", m.llm_path, True, _check_llm),
    ]

    report: dict = {"timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
                    "matmul_precision": "highest", "modules": {}}
    for name, path, active, fn in checks:
        if not (path and active):
            continue
        if not Path(path).exists():
            log.warning("%s: path %s does not exist — skipping", name, path)
            continue
        report["modules"][name] = fn(m, rng)

    if args.wav:
        if not report["modules"]:
            log.warning("--wav given but no checkpoint paths resolved")
        else:
            report["e2e"] = _decode_wav(cfg, args.wav, args.ref_text)

    if args.manifest:
        if not report["modules"]:
            log.warning("--manifest given but no checkpoint paths resolved")
        else:
            report["eval"] = _decode_manifest(cfg, args.manifest, args.split)

    if not report["modules"]:
        print("parity: no pretrained assets found — nothing checked "
              "(set model.whisper_path / model.clip_path / model.llm_path)")
        return 3

    report["all_pass"] = all(v["pass"] for v in report["modules"].values())
    out = Path(args.report)
    out.write_text(json.dumps(report, indent=2))
    log.info("report -> %s", out)
    status = "PASS" if report["all_pass"] else "FAIL"
    print(f"parity {status}: "
          + ", ".join(f"{k} {v['max_abs_err']:.2e}/{v['tol_max_abs']:.0e}"
                      for k, v in report["modules"].items())
          + (f" | transcript: {report['e2e']['transcript']!r}"
             if "e2e" in report else "")
          + (f" | eval WER {report['eval']['wer']:.4f} "
             f"({report['eval']['utterances']} utts)"
             if "eval" in report else ""))
    return 0 if report["all_pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
