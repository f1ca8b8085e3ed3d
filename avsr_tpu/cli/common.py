"""Shared CLI plumbing: config loading, logging, data/model construction.

One canonical entry-point pattern (replacing the reference's three config
systems, SURVEY.md §5.6): ``--config file.yaml`` plus positional
``section.key=value`` overrides; CLI wins over YAML wins over defaults.
"""

from __future__ import annotations

import argparse
import logging
from typing import Any

import jax

from avsr_tpu.core.config import AVSRConfig, load_config
from avsr_tpu.core.logging import setup_logging


# Memory-mode presets — one-flag launch parity with the reference's
# train_modes.sh launcher (scripts/clip_whisper/train_modes.sh:95-201:
# standard / fp16 / 4bit / max, plus 8bit). Each mode is a set of dotted
# config overrides applied BEFORE the positional overrides, so an explicit
# key=value on the command line still wins. Documented with the reference
# mapping in avsr_tpu/configs/modes.md. The ref's model-size-aware
# grad-clip auto-tune (:95-110) is a fixed training.max_grad_norm=0.5 here,
# measured stable across model sizes with the packed-loss design.
MODE_OVERRIDES: dict[str, list[str]] = {
    "standard": [],
    # TPUs prefer bf16 over fp16 (MXU-native); compute already defaults to
    # bf16 in base.yaml, so the preset just pins it against YAML overrides.
    "fp16": ["runtime.compute_dtype=bfloat16"],
    "4bit": ["model.use_4bit=true"],
    "8bit": ["model.use_8bit=true"],
    "max": ["model.use_4bit=true", "mesh.remat=true",
            "training.grad_accum_steps=8", "data.batch_size=1"],
}


def base_parser(description: str, *,
                modes: bool = False) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--log_file", default=None)
    p.add_argument("--verbose", action="store_true")
    if modes:
        # dest is namespaced so CLIs that define their own --mode (e.g.
        # avsr-profile's train/decode selector) never collide with the
        # preset machinery in load_cli_config.
        p.add_argument("--mode", dest="memory_mode",
                       choices=sorted(MODE_OVERRIDES),
                       default=None,
                       help="memory-mode preset (config override bundle; "
                            "explicit key=value overrides still win)")
    p.add_argument("overrides", nargs="*",
                   help="dotted config overrides, e.g. model.modality=audio")
    return p


def load_cli_config(args: argparse.Namespace) -> AVSRConfig:
    setup_logging(args.log_file,
                  level=logging.DEBUG if args.verbose else logging.INFO)
    overrides = list(args.overrides)
    mode = getattr(args, "memory_mode", None)
    if mode:
        overrides = MODE_OVERRIDES[mode] + overrides
        logging.getLogger("avsr.cli").info(
            "mode=%s -> %s", mode, " ".join(MODE_OVERRIDES[mode]) or "(defaults)")
    cfg = load_config(args.config, overrides)
    from avsr_tpu.core.runtime import setup_runtime
    setup_runtime(cfg.runtime)
    return cfg


def build_data(cfg: AVSRConfig, split: str = "train", *,
               shuffle: bool | None = None, batch_size: int | None = None):
    """-> (tokenizer, dataset, loader)."""
    from avsr_tpu.data.dataset import build_dataset
    from avsr_tpu.data.loader import DataLoader
    from avsr_tpu.data.tokenizer import load_tokenizer

    tok = load_tokenizer(cfg.model.llm_path or None)
    ds = build_dataset(cfg.data, tok, split=split,
                       modality=cfg.model.modality,
                       image_size=cfg.model.image_size)
    # Pod-slice runs (one JAX process per host): train/val loaders become
    # multi-host — each process loads only its row slice of every global
    # batch (mesh.multihost). Decode/serve stay whole-batch per process.
    data_shard = None
    if split in ("train", "valid") and jax.process_count() > 1:
        from avsr_tpu.mesh.multihost import process_shard
        data_shard = process_shard()
    loader = DataLoader(
        ds, cfg.data, tok, model_cfg=cfg.model,
        batch_size=batch_size,
        shuffle=(split == "train") if shuffle is None else shuffle,
        seed=cfg.training.seed,
        compute_dtype=cfg.runtime.compute_dtype,
        data_shard=data_shard)
    return tok, ds, loader


def init_or_load_params(cfg: AVSRConfig, checkpoint: str | None = None) -> Any:
    """Fresh init, optionally overwritten from a params-only export or a
    trainer checkpoint directory. Honors runtime.param_dtype for the stored
    master params and keeps frozen leaves in compute_dtype (cast_frozen:
    they are only ever read, so no f32 master is needed)."""
    import jax.numpy as jnp

    from avsr_tpu.models.avsr import init_avsr_model

    params_fp = init_avsr_model(jax.random.key(cfg.training.seed), cfg.model,
                                dtype=jnp.dtype(cfg.runtime.param_dtype))
    quant_bits = (4 if cfg.model.use_4bit else
                  8 if cfg.model.use_8bit else 0)

    def quantize(p):
        from avsr_tpu.ops.quant import quantize_llm
        p = dict(p)
        p["llm"] = quantize_llm(p["llm"], quant_bits)
        return p

    params = quantize(params_fp) if quant_bits else params_fp
    if checkpoint:
        if quant_bits:
            # A use_4bit/8bit training run checkpoints the quantized tree
            # (qw/scale leaves); a convert_hf export or fp training run
            # stores full-precision kernels. Try the quantized structure
            # first, fall back to restore-fp-then-quantize (the reference's
            # load-then-BnB recipe, clip_whisper_model.py:913-928).
            try:
                params = _restore(checkpoint, params, cfg)
            except Exception:  # noqa: BLE001 — orbax structure mismatch
                log = logging.getLogger("avsr.cli")
                restored = None
                if quant_bits == 4:
                    # Pre-layout-change int4 checkpoints store interleaved
                    # "qw4" leaves; restore into that structure and repack
                    # to the current half-split layout.
                    from avsr_tpu.ops.quant import (legacy_int4_template,
                                                    upgrade_legacy_int4)
                    try:
                        restored = upgrade_legacy_int4(_restore(
                            checkpoint, legacy_int4_template(params), cfg))
                        log.info("restored legacy int4 (qw4) checkpoint — "
                                 "repacked to the half-split layout")
                    except Exception:  # noqa: BLE001 — not legacy either
                        restored = None
                if restored is not None:
                    params = restored
                else:
                    log.info("checkpoint is full-precision — quantizing "
                             "after restore")
                    params = quantize(_restore(checkpoint, params_fp, cfg))
        else:
            params = _restore(checkpoint, params, cfg)
    from avsr_tpu.train.state import cast_frozen
    params = cast_frozen(params, cfg.model,
                         dtype=jnp.dtype(cfg.runtime.compute_dtype))
    return params


def validate_modality_media(cfg, parser, *, have_audio: bool,
                            have_video: bool) -> None:
    """The checkpoint's param tree is built from model.modality, so the
    provided media must match it (override model.modality=... to run a
    different mode — that path re-validates)."""
    need_audio = cfg.model.modality in ("audio", "both")
    need_video = cfg.model.modality in ("video", "both")
    if (need_audio and not have_audio) or (need_video and not have_video):
        parser.error(
            f"model.modality={cfg.model.modality!r} needs "
            f"{'--audio ' if need_audio else ''}"
            f"{'--video' if need_video else ''} "
            "(or override model.modality=audio/video/both)")


def load_decode_params(cfg: AVSRConfig, checkpoint: str | None,
                       mesh=None, return_raw: bool = False) -> Any:
    """Inference params: load/quantize, then the serving layout transform
    (fused q|k|v + gate|up, optional lm-head quantization —
    infer.generate.prepare_params_for_decode). With a device mesh the
    fused ops.qmatmul kernel is disabled up front: a pallas custom-call
    has no GSPMD partitioning rule, so XLA would all-gather the sharded
    quantized weights every decode step. ``return_raw`` also returns the
    pre-transform tree (speculative decode builds its self-draft from it:
    the draft quantization only recognizes raw projection keys)."""
    from avsr_tpu.infer.generate import prepare_params_for_decode

    if mesh is not None:
        from avsr_tpu.ops.qmatmul import set_force_xla
        set_force_xla(True)
    raw = init_or_load_params(cfg, checkpoint)
    prepared = prepare_params_for_decode(
        raw, cfg.model, lm_head_bits=cfg.decode.lm_head_bits)
    if return_raw:
        return prepared, raw
    return prepared


def _restore(checkpoint: str, params_like, cfg: AVSRConfig):
    """Restore a trainer checkpoint dir or a params-only export into the
    structure of ``params_like``."""
    from pathlib import Path

    from avsr_tpu.train.checkpoint import CheckpointManager, load_params
    ck = Path(checkpoint)
    if (ck / "best.json").exists() or any(ck.glob("meta_*.json")):
        from avsr_tpu.train.state import create_train_state
        state, _ = create_train_state(params_like, cfg, total_steps=1)
        return CheckpointManager(ck).restore(state).params
    return load_params(ck, params_like)


def maybe_mesh(cfg: AVSRConfig):
    """Build a mesh + batch sharder when >1 device is visible. Under
    multi-process JAX (pod slice) the sharder assembles global arrays from
    each host's local loader shard (mesh.multihost); single-process keeps
    the plain device_put path — same NamedShardings either way."""
    if len(jax.devices()) == 1:
        return None, None
    from avsr_tpu.mesh.sharding import batch_sharder, build_mesh

    mesh = build_mesh(cfg.mesh)
    if jax.process_count() > 1:
        from avsr_tpu.mesh.multihost import multihost_batch_sharder
        return mesh, multihost_batch_sharder(mesh)
    return mesh, batch_sharder(mesh)


def load_multilora(cfg: AVSRConfig, checkpoint: str | None,
                   adapter_ckpts: list[str]) -> tuple[Any, Any]:
    """Base params + stacked adapter bank for multi-tenant LoRA serving.

    The base loads RAW (unfused — the per-projection adapters must target
    unconcatenated q/k/v; quantized base leaves from use_4bit/8bit compose
    fine), with only the lm head optionally quantized for serving
    (decode.lm_head_bits keeps the tree structure). Each adapter
    checkpoint is any trainer ckpt / params export for THIS config whose
    LLM carries lora leaves; only those leaves are kept. Returns
    (params, bank) for ServingEngine/AVSRServer(adapter_bank=...)."""
    from avsr_tpu.infer.adapters import extract_lora, stack_lora_bank

    if not cfg.model.lora.use_lora:
        raise ValueError("--adapter serving needs model.lora.use_lora=true")
    params = init_or_load_params(cfg, checkpoint)
    if cfg.decode.lm_head_bits:
        from avsr_tpu.ops.quant import quantize_llm
        params = dict(params)
        params["llm"] = quantize_llm(params["llm"], 0,
                                     lm_head_bits=cfg.decode.lm_head_bits)
    # empty list: raw base, no bank yet — the runtime-onboarding start
    # state (serve --allow-onboarding; POST /v1/adapters bootstraps)
    bank = (stack_lora_bank([
        extract_lora(init_or_load_params(cfg, ck)["llm"])
        for ck in adapter_ckpts
    ]) if adapter_ckpts else None)
    return params, bank
