"""--mode memory presets: one-flag launch parity with the reference's
train_modes.sh launcher (scripts/clip_whisper/train_modes.sh:95-201 —
standard/fp16/4bit/max). Each preset is a config-override bundle applied
before the positional overrides (avsr_tpu/cli/common.py MODE_OVERRIDES,
documented in avsr_tpu/configs/modes.md)."""

import pytest

from avsr_tpu.cli.common import MODE_OVERRIDES, base_parser, load_cli_config
from avsr_tpu.core.config import load_config

TINY = [
    "data.synthetic=true", "data.synthetic_size=4",
    "data.max_label_length=24", "data.audio_buckets=[100]",
    "data.video_buckets=[4]",
    "model.modality=audio",
    "model.whisper={d_model: 32, n_heads: 2, n_layers: 1, max_frames: 100}",
    "model.llm={vocab_size: 260, d_model: 64, n_layers: 1, n_heads: 4, "
    "n_kv_heads: 2, ffn_dim: 128, max_seq_len: 256, tie_embeddings: true}",
    "model.lora={use_lora: true, r: 2, alpha: 4}",
    "training.max_steps=2", "training.warmup_steps=1",
    "training.log_interval=1", "training.save_every_steps=0",
    "mesh.remat=false", "mesh.donate=false",
]


@pytest.mark.parametrize("mode", sorted(MODE_OVERRIDES))
def test_mode_config_validates(mode):
    cfg = load_config(None, MODE_OVERRIDES[mode])
    if mode in ("4bit", "max"):
        assert cfg.model.use_4bit
    if mode == "8bit":
        assert cfg.model.use_8bit
    if mode == "fp16":
        assert cfg.runtime.compute_dtype == "bfloat16"
    if mode == "max":
        assert cfg.data.batch_size == 1
        assert cfg.training.grad_accum_steps == 8
        assert cfg.mesh.remat


def test_explicit_override_beats_mode():
    args = base_parser("t", modes=True).parse_args(
        ["--mode", "max", "data.batch_size=4"])
    cfg = load_cli_config(args)
    assert cfg.model.use_4bit          # from the preset
    assert cfg.data.batch_size == 4    # CLI wins over preset


@pytest.mark.slow
@pytest.mark.parametrize("mode", sorted(MODE_OVERRIDES))
def test_mode_smoke_train(mode, tmp_path):
    """One-flag launch: every mode runs a real (tiny) train step through
    the actual CLI entry point. batch_size/grad_accum are re-overridden
    after the preset so the 8-virtual-device test mesh divides the batch
    (explicit overrides winning over the preset is itself the contract)."""
    from avsr_tpu.cli import train as cli_train

    argv = ["--mode", mode, *TINY,
            "data.batch_size=8", "training.grad_accum_steps=1",
            f"training.checkpoint_dir={tmp_path / 'run'}"]
    assert cli_train.main(argv) == 0
