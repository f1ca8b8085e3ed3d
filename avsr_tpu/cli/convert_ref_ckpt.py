"""Convert a REFERENCE trainer checkpoint (``.pt``) to an avsr_tpu export.

The reference trainer saves ``{epoch, model_state_dict, optimizer_state_dict,
scheduler_state_dict, train_losses, ...}`` (clip_whisper_trainer.py:752-763)
where ``model_state_dict`` is the full ``ClipWhisperModel``:

    whisper.*           HF WhisperModel weights (frozen)
    clip.*              HF CLIPVisionModel weights (frozen)
    llm.*               HF CausalLM — peft-wrapped when use_lora
    audio_connector.*   trained connector (modality_connector.py)
    video_connector.*   trained connector

What transfers EXACTLY: the whisper/clip/llm base weights (same HF
architectures our converters already map), the *trained* peft LoRA adapters
(``lora_A/B`` -> our ``a``/``b``; peft's ``alpha/r`` scaling equals our
``lora_scale``), and ``simple`` connectors (a single Linear on both sides).

What cannot transfer: the other connector types. They are TPU-first
re-designs here (models/connectors.py), not weight-compatible ports of the
reference's torch stacks — those weights stay at fresh init with a loud
warning (connectors retrain in hours; see docs/migration.md).

Usage:
    avsr-convert-ref --config cfg.yaml --checkpoint model_best.pt --out dir
    python -m avsr_tpu.cli.train  --config cfg.yaml --checkpoint dir ...
"""

from __future__ import annotations

import logging
import re
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.cli.common import base_parser, load_cli_config

log = logging.getLogger("avsr.cli.convert_ref")

_PREFIXES = ("whisper", "clip", "llm", "audio_connector", "video_connector")


def split_ref_state_dict(sd: dict[str, Any]) -> dict[str, dict[str, Any]]:
    """Group a ClipWhisperModel state dict by top-level submodule, with the
    submodule prefix stripped. Unknown top-level keys are ignored (buffers
    like rotary inv_freq are re-derived on our side)."""
    out: dict[str, dict[str, Any]] = {p: {} for p in _PREFIXES}
    for k, v in sd.items():
        head, _, rest = k.partition(".")
        if head in out and rest:
            out[head][rest] = v
    return {k: v for k, v in out.items() if v}


# ---------------------------------------------------------------------------
# peft-wrapped LLM: split base weights from trained LoRA
# ---------------------------------------------------------------------------

_PEFT_WRAP = "base_model.model."
# "...q_proj.lora_A.default.weight" (adapter name optional in older exports)
_LORA_RE = re.compile(r"^(.*)\.lora_(A|B)(?:\.[^.]+)?\.weight$")


def normalize_peft_llm(
    sd: dict[str, Any],
) -> tuple[dict[str, Any], dict[str, dict[str, Any]]]:
    """peft LoraModel state dict -> (plain CausalLM state dict, lora map).

    Returns ``(base_sd, lora)`` where ``base_sd`` has the unwrapped HF key
    names (``model.layers.0.self_attn.q_proj.weight``) consumable by
    ``convert_hf_llama``, and ``lora`` maps the unwrapped module path
    (``model.layers.0.self_attn.q_proj``) to ``{"A": [r, din], "B":
    [dout, r]}`` torch tensors. A non-peft state dict passes through with an
    empty lora map."""
    base: dict[str, Any] = {}
    lora: dict[str, dict[str, Any]] = {}
    for k, v in sd.items():
        if k.startswith(_PEFT_WRAP):
            k = k[len(_PEFT_WRAP):]
        m = _LORA_RE.match(k)
        if m:
            lora.setdefault(m.group(1), {})[m.group(2)] = v
            continue
        # wrapped Linear's frozen weight: "...q_proj.base_layer.weight"
        base[k.replace(".base_layer.", ".")] = v
    return base, lora


_HF_TO_OURS = {"q_proj": "q", "k_proj": "k", "v_proj": "v", "o_proj": "o",
               "gate_proj": "gate", "up_proj": "up", "down_proj": "down"}


def attach_trained_lora(llm_params: dict, lora: dict[str, dict[str, Any]],
                        lora_cfg) -> tuple[dict, int]:
    """Replace fresh-init adapters with the checkpoint's trained A/B.

    Our ``proj`` computes ``y + (alpha/r) * x @ a @ b`` (models/llama.py:80-95)
    and peft computes ``y + (alpha/r) * lora_B(lora_A(x))`` — so
    ``a = A.T  [din, r]``, ``b = B.T  [r, dout]``, scaling comes from config.
    The checkpoint's rank must match ``model.lora.r`` (the scale alpha/r is
    config-side; a silent rank mismatch would rescale the trained update)."""
    n = 0
    for path, ab in lora.items():
        m = re.match(r"^model\.layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)$", path)
        if not m or "A" not in ab or "B" not in ab:
            raise ValueError(f"unrecognized LoRA module in checkpoint: {path}")
        li, tgt = int(m.group(1)), _HF_TO_OURS.get(m.group(2))
        if tgt is None or li >= len(llm_params["layers"]):
            raise ValueError(f"LoRA target {path} has no counterpart here")
        A = np.asarray(ab["A"].detach().to("cpu").float())
        B = np.asarray(ab["B"].detach().to("cpu").float())
        if A.shape[0] != lora_cfg.r:
            raise ValueError(
                f"checkpoint LoRA rank {A.shape[0]} != model.lora.r "
                f"{lora_cfg.r} — set model.lora.r (and alpha) to the values "
                "the reference run used")
        leaf = llm_params["layers"][li][tgt]
        leaf["lora"] = {"a": jnp.asarray(A.T), "b": jnp.asarray(B.T)}
        n += 1
    return llm_params, n


# ---------------------------------------------------------------------------
# simple-connector transfer (the one weight-compatible connector type)
# ---------------------------------------------------------------------------

def convert_simple_connector(sd: dict[str, Any]) -> dict:
    """Reference SimpleModalityConnector (one nn.Linear,
    modality_connector.py:25-44) -> our ``simple`` connector params
    (connectors.py: {"out": {"w" [din,dout], "b"}})."""
    w = np.asarray(sd["linear.weight"].detach().to("cpu").float())
    b = np.asarray(sd["linear.bias"].detach().to("cpu").float())
    return {"out": {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}}


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------

def build_ref_converted_params(cfg, ckpt_path: str) -> tuple[dict, list[str]]:
    """Fresh-init params with everything transferable from a reference
    trainer checkpoint swapped in. Returns (params, notes)."""
    import torch

    from avsr_tpu.models.avsr import init_avsr_model
    from avsr_tpu.models.clip_vit import convert_hf_clip_vision
    from avsr_tpu.models.llama import convert_hf_llama
    from avsr_tpu.models.whisper_encoder import convert_hf_whisper_encoder

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    if not isinstance(sd, dict) or not any(
            k.partition(".")[0] in _PREFIXES for k in sd):
        raise ValueError(
            f"{ckpt_path} does not look like a reference trainer checkpoint "
            "(expected model_state_dict with whisper./clip./llm./*_connector. "
            "keys; clip_whisper_trainer.py:752-763)")
    parts = split_ref_state_dict(sd)
    epoch = ckpt.get("epoch") if isinstance(ckpt, dict) else None
    log.info("reference checkpoint%s: found %s",
             f" (epoch {epoch})" if epoch is not None else "",
             ", ".join(sorted(parts)))

    m = cfg.model
    params = init_avsr_model(jax.random.key(cfg.training.seed), m)
    notes: list[str] = []

    if "whisper" in parts and "whisper" in params:
        params["whisper"] = convert_hf_whisper_encoder(parts["whisper"],
                                                       m.whisper)
        notes.append("whisper")
    if "clip" in parts and "clip" in params:
        params["clip"] = convert_hf_clip_vision(parts["clip"], m.clip)
        notes.append("clip")

    if "llm" in parts:
        base_sd, lora = normalize_peft_llm(parts["llm"])
        llm = convert_hf_llama(base_sd, m.llm)
        if lora:
            if not m.lora.use_lora:
                raise ValueError(
                    "checkpoint carries trained LoRA adapters but "
                    "model.lora.use_lora is false")
            llm, n = attach_trained_lora(llm, lora, m.lora)
            notes.append(f"llm+lora({n})")
        else:
            if m.lora.use_lora:
                from avsr_tpu.models.llama import add_lora
                llm = add_lora(jax.random.key(cfg.training.seed + 1), llm,
                               m.llm, m.lora)
            notes.append("llm")
        params["llm"] = llm

    for side in ("audio_connector", "video_connector"):
        if side not in parts or side not in params:
            continue
        if m.connector_type == "simple":
            params[side] = convert_simple_connector(parts[side])
            notes.append(side)
        else:
            log.warning(
                "%s: reference %r connector weights are NOT transferable — "
                "the TPU-first architecture here differs "
                "(models/connectors.py); leaving it at fresh init. "
                "Connectors retrain in hours (docs/migration.md).",
                side, m.connector_type)

    return params, notes


def main(argv: list[str] | None = None) -> int:
    p = base_parser("Convert a reference trainer .pt checkpoint to an "
                    "avsr_tpu params export")
    p.add_argument("--checkpoint", required=True,
                   help="reference model_best.pt / checkpoint_epoch_N.pt")
    p.add_argument("--out", required=True, help="output params directory")
    args = p.parse_args(argv)
    cfg = load_cli_config(args)

    from avsr_tpu.train.checkpoint import export_params

    params, notes = build_ref_converted_params(cfg, args.checkpoint)
    out = Path(args.out).absolute()
    export_params(params, out)
    log.info("params export -> %s (converted: %s)", out, ", ".join(notes))
    print(f"exported params to {out} (converted: {', '.join(notes)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
