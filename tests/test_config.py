"""The canonical config system (core/config.py): YAML + dotted overrides,
type coercion, unknown-key rejection, and every validate() rule — the one
schema replacing the reference's three overlapping systems (SURVEY §5.6)."""

import pytest

from avsr_tpu.core.config import AVSRConfig, load_config, save_config, to_dict


def test_defaults_load_and_validate():
    cfg = load_config()
    assert cfg.model.modality == "both"
    assert cfg.mesh.axis_names == ("dcn", "dp", "fsdp", "ep", "sp", "tp",
                                   "pp")


def test_cli_overrides_win_over_yaml(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("model:\n  modality: audio\ntraining:\n  learning_rate: 1.0e-3\n")
    cfg = load_config(y, ["model.modality=video", "mesh.tp=1"])
    assert cfg.model.modality == "video"          # CLI beats YAML
    assert cfg.training.learning_rate == 1e-3     # YAML beats default


def test_override_coercion():
    cfg = load_config(None, [
        "data.audio_buckets=[100,200]",           # yaml list -> tuple[int]
        "data.audio_buckets=100,200",             # string form too
        "model.freeze_llm=false",                 # bool
        "training.learning_rate=5e-5",            # float
        "model.whisper.max_frames=200",           # nested int
    ])
    assert cfg.data.audio_buckets == (100, 200)
    assert cfg.model.freeze_llm is False
    # scalar into a tuple field -> 1-tuple (single-bucket CLI override)
    one = load_config(None, ["data.audio_buckets=1000"])
    assert one.data.audio_buckets == (1000,)
    assert load_config(None, {"data.video_buckets": 25}).data.video_buckets \
        == (25,)
    assert cfg.training.learning_rate == 5e-5
    assert cfg.model.whisper.max_frames == 200


def test_unknown_key_rejected():
    with pytest.raises(KeyError, match="Unknown config key"):
        load_config(None, ["model.no_such_knob=1"])
    with pytest.raises(KeyError, match="training.lr"):
        load_config(None, ["training.lr=1"])       # ref-style name: rejected


@pytest.mark.parametrize("override,match", [
    ("model.modality=speech", "modality"),
    ("model.connector_type=mlp", "connector_type"),
    (["model.connector_type=qformer", "model.modality=audio"], "fuses"),
    (["model.use_4bit=true", "model.use_8bit=true"], "mutually exclusive"),
    ("training.grad_accum_steps=0", "grad_accum_steps"),
    (["model.llm.n_heads=6", "model.llm.n_kv_heads=4"], "divisible"),
    ("data.audio_buckets=[200,100]", "increasing"),
    ("data.audio_buckets=[4000]", "whisper.max_frames"),
    (["mesh.pp=2", "mesh.sp=2"], "mutually exclusive"),
    ("mesh.pp=3", "stages"),                       # 16 layers % 3 != 0
    # a mesh knob must not silently change training math: LoRA dropout
    # rng is not threaded across pipeline stages
    (["mesh.pp=2", "model.lora.dropout=0.1"], "lora.dropout"),
])
def test_validate_rejects(override, match):
    ov = [override] if isinstance(override, str) else override
    with pytest.raises((ValueError, KeyError), match=match):
        load_config(None, ov)


def test_save_roundtrip(tmp_path):
    cfg = load_config(None, ["model.modality=audio", "mesh.fsdp=2"])
    save_config(cfg, tmp_path / "out.yaml")
    cfg2 = load_config(tmp_path / "out.yaml")
    assert to_dict(cfg) == to_dict(cfg2)


def test_dict_overrides():
    cfg = load_config(None, {"model.max_seq_len": 256})
    assert cfg.model.max_seq_len == 256


def test_validate_cli_checkify(tmp_path):
    """--checkify runs the forward under jax.experimental.checkify and
    still passes on healthy numerics (SURVEY §5.2 debug tier)."""
    from avsr_tpu.cli import validate as cli_validate

    rc = cli_validate.main([
        "--config", "avsr_tpu/configs/tiny_cpu.yaml", "--checkify",
        "--num_batches", "1",
    ])
    assert rc == 0
