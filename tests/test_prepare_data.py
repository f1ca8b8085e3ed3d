"""Dataset preparation CLI: demo dataset -> manifests -> trainable loader.

Covers the reference README's promised-but-missing prepare_dataset /
demo-dataset tooling (README.md:65, SURVEY.md §0) with real files end to
end: generated media -> manifest build -> ManifestAVSRDataset -> DataLoader
batch."""

import numpy as np
import pytest

from avsr_tpu.cli import prepare_data
from avsr_tpu.core.config import DataConfig
from avsr_tpu.data.dataset import ManifestAVSRDataset
from avsr_tpu.data.loader import DataLoader
from avsr_tpu.data.manifest import load_manifest
from avsr_tpu.data.tokenizer import ByteTokenizer


def test_demo_to_training_batch(tmp_path):
    rc = prepare_data.main(["--demo", "10", "--out", str(tmp_path),
                            "--splits", "0.6,0.2,0.2", "--seed", "1"])
    assert rc == 0
    root, entries = load_manifest(tmp_path / "train.tsv")
    assert len(entries) == 6
    assert all(e.num_samples > 0 and e.num_frames > 0 for e in entries)
    # splits are disjoint and cover everything
    ids = set()
    for split, n in (("train", 6), ("valid", 2), ("test", 2)):
        _, es = load_manifest(tmp_path / f"{split}.tsv")
        assert len(es) == n
        assert (tmp_path / f"{split}.wrd").read_text().count("\n") == n
        split_ids = {e.utt_id for e in es}
        assert not (ids & split_ids)
        ids |= split_ids
    assert len(ids) == 10

    cfg = DataConfig(path=str(tmp_path), batch_size=2,
                     max_audio_length=48000, max_video_length=16,
                     max_label_length=48, audio_buckets=(100, 200, 300),
                     video_buckets=(8, 16))
    tok = ByteTokenizer()
    ds = ManifestAVSRDataset(cfg, tok, modality="both", image_size=32)
    loader = DataLoader(ds, cfg, tok, shuffle=False)
    hb, batch = next(iter(loader))
    assert hb.audio_lens.min() > 0
    assert hb.frame_lens.min() > 0
    assert np.isfinite(np.asarray(batch.mel)).all()


def test_scan_mode_with_sidecar_txt(tmp_path):
    from avsr_tpu.data.audio_io import write_wav

    d = tmp_path / "raw"
    d.mkdir()
    for i in range(4):
        x = np.sin(np.linspace(0, 40, 8000)).astype(np.float32)
        write_wav(d / f"s{i}.wav", x)
        (d / f"s{i}.txt").write_text(f"hello world {i}\n")
    rc = prepare_data.main(["--data_dir", str(d), "--out", str(tmp_path / "o"),
                            "--splits", "0.5,0.25,0.25"])
    assert rc == 0
    _, entries = load_manifest(tmp_path / "o" / "train.tsv")
    assert len(entries) == 2
    assert entries[0].num_samples == 8000


@pytest.mark.slow
def test_demo_dataset_trains_and_decodes(tmp_path):
    """Real files end to end: prepare_data --demo -> manifest dataset with
    native batch WAV decode -> Trainer -> decode CLI. The only other E2E
    test uses in-memory synthetic data; this one exercises the real-media
    path (manifests, deferred audio, loader-native decode) inside training."""
    from avsr_tpu.cli import decode as cli_decode
    from avsr_tpu.cli import train as cli_train

    data_dir = tmp_path / "data"
    rc = prepare_data.main(["--demo", "12", "--out", str(data_dir),
                            "--splits", "0.7,0.15,0.15", "--seed", "2"])
    assert rc == 0

    ckpt = tmp_path / "run"
    overrides = [
        f"data.path={data_dir}",
        "data.synthetic=false",
        "data.batch_size=8",      # dp=8 virtual mesh
        "data.max_label_length=48",
        "data.max_video_length=16",
        "data.audio_buckets=[100,200,300]",
        "data.video_buckets=[8,16]",
        "model.modality=audio",
        "model.whisper={d_model: 32, n_heads: 2, n_layers: 1, max_frames: 300}",
        "model.llm={vocab_size: 260, d_model: 32, n_layers: 1, n_heads: 4, "
        "n_kv_heads: 2, ffn_dim: 64, max_seq_len: 512}",
        "model.lora={use_lora: true, r: 2, alpha: 4}",
        "training.max_steps=3",
        "training.warmup_steps=1",
        "training.log_interval=1",
        "training.save_every_steps=0",
        f"training.checkpoint_dir={ckpt}",
        "mesh.remat=false", "mesh.donate=false",
        "runtime.compute_dtype=float32",
        "decode.max_new_tokens=4",
        "decode.batch_size=8",
        f"decode.output_dir={tmp_path / 'dec'}",
    ]
    assert cli_train.main(overrides) == 0
    assert (ckpt / "ckpt").exists()
    assert cli_decode.main(["--checkpoint", str(ckpt / "ckpt"),
                            "--split", "test", *overrides]) == 0
    assert list((tmp_path / "dec").glob("wer_*.txt"))
