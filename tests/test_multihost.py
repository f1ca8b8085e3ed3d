"""Multi-host (pod-slice) data feeding: mesh.multihost + loader data_shard.

Real multi-process JAX cannot run in one test process, so the contracts are
verified the way the module is designed to allow (multihost.py docstring):
the local-shard selection + metadata bucket agreement must reassemble
byte-identically into the single-host loader's batches, and under
process_count == 1 the multihost sharders must produce exactly the arrays
(values AND NamedShardings) the single-host sharders produce — which is the
path the real pod run reduces to per process.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from avsr_tpu.core.config import DataConfig, MeshConfig, ModelConfig
from avsr_tpu.data.dataset import ManifestAVSRDataset, SyntheticAVSRDataset
from avsr_tpu.data.loader import DataLoader
from avsr_tpu.data.manifest import ManifestEntry, write_manifest
from avsr_tpu.data.tokenizer import ByteTokenizer
from avsr_tpu.mesh.multihost import (
    local_rows,
    multihost_batch_sharder,
    multihost_infer_batch_sharder,
    put_global,
)
from avsr_tpu.mesh.sharding import batch_sharder, build_mesh, infer_batch_sharder


def _data_cfg(**kw):
    base = dict(synthetic=True, synthetic_size=10, batch_size=4,
                max_audio_length=48000, max_video_length=8,
                max_label_length=32,
                audio_buckets=(100, 200, 300), video_buckets=(4, 8))
    base.update(kw)
    return DataConfig(**base)


def test_local_rows_partition():
    # union over processes is exactly [0, B), contiguous and disjoint
    spans = [local_rows(8, (i, 4)) for i in range(4)]
    assert spans == [(0, 2), (2, 4), (4, 6), (6, 8)]
    with pytest.raises(ValueError):
        local_rows(6, (0, 4))      # B must divide process count
    with pytest.raises(ValueError):
        local_rows(8, (4, 4))      # index out of range


def test_synthetic_length_hints_exact():
    cfg = _data_cfg()
    ds = SyntheticAVSRDataset(cfg, ByteTokenizer(), image_size=16)
    for i in range(len(ds)):
        n_a, n_v = ds.length_hints(i)
        s = ds[i]
        assert s.audio.shape[0] == n_a
        assert s.frames.shape[0] == n_v


def test_manifest_length_hints_from_metadata(tmp_path):
    entries = [ManifestEntry("u1", "v/u1.mp4", "a/u1.wav", 75, 48000),
               ManifestEntry("u2", "v/u2.mp4", "a/u2.wav", 50, 32000)]
    write_manifest(tmp_path / "train.tsv", tmp_path, entries)
    (tmp_path / "train.wrd").write_text("hello\nworld\n")
    ds = ManifestAVSRDataset(_data_cfg(path=str(tmp_path), synthetic=False),
                             ByteTokenizer(), modality="audio",
                             defer_audio=True)
    # no media IO: the files above do not exist
    assert ds.length_hints(0) == (48000, 75)
    assert ds.length_hints(1) == (32000, 50)


def test_sharded_loaders_reassemble_single_host():
    """Two data_shard loaders concatenated == the single-host loader,
    byte for byte — incl. the wrap-padded final batch (10 % 4 != 0), whose
    duplicate rows must be zero-label-length on whichever host owns them."""
    cfg = _data_cfg(synthetic_size=10, batch_size=4, num_workers=1)
    tok = ByteTokenizer()
    mc = ModelConfig(prompt="t:")

    def mk(shard):
        ds = SyntheticAVSRDataset(cfg, tok, image_size=16)
        return DataLoader(ds, cfg, tok, model_cfg=mc, shuffle=True, seed=3,
                          prefetch=1, data_shard=shard)

    full = [hb for hb, _ in mk(None)]
    half0 = [hb for hb, _ in mk((0, 2))]
    half1 = [hb for hb, _ in mk((1, 2))]
    assert len(full) == len(half0) == len(half1) == 3

    for f, a, b in zip(full, half0, half1):
        assert a.audio.shape[0] == 2 and a.frames.shape[0] == 2
        np.testing.assert_array_equal(np.concatenate([a.audio, b.audio]),
                                      f.audio)
        np.testing.assert_array_equal(np.concatenate([a.frames, b.frames]),
                                      f.frames)
        np.testing.assert_array_equal(np.concatenate([a.labels, b.labels]),
                                      f.labels)
        np.testing.assert_array_equal(
            np.concatenate([a.label_lens, b.label_lens]), f.label_lens)
        np.testing.assert_array_equal(
            np.concatenate([a.audio_lens, b.audio_lens]), f.audio_lens)
        np.testing.assert_array_equal(
            np.concatenate([a.frame_lens, b.frame_lens]), f.frame_lens)
        assert a.utt_ids + b.utt_ids == f.utt_ids

    # wrap boundary: 10 samples -> last batch has 2 real rows; host 0 owns
    # rows 0-1 (real), host 1 owns rows 2-3 (wrapped duplicates, weight 0)
    assert (full[-1].label_lens[2:] == 0).all()
    assert (half0[-1].label_lens > 0).all()
    assert (half1[-1].label_lens == 0).all()


def test_data_shard_validation():
    cfg = _data_cfg(batch_size=4)
    tok = ByteTokenizer()
    ds = SyntheticAVSRDataset(cfg, tok, image_size=16)
    with pytest.raises(ValueError, match="divide"):
        DataLoader(ds, cfg, tok, data_shard=(0, 3))
    with pytest.raises(ValueError, match="index"):
        DataLoader(ds, cfg, tok, data_shard=(2, 2))

    class NoHints:
        def __len__(self):
            return 4
    with pytest.raises(ValueError, match="length_hints"):
        DataLoader(NoHints(), cfg, tok, data_shard=(0, 2))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multihost_sharders_match_single_process():
    """process_count == 1: the multihost sharders must be byte- and
    sharding-identical to the single-host ones (the degenerate path every
    per-process view of a pod run reduces to)."""
    mesh = build_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    rng = np.random.default_rng(0)
    stacked = {"x": rng.standard_normal((2, 4, 6)).astype(np.float32),
               "lens": rng.integers(1, 5, (2, 4)).astype(np.int32),
               "scalar": np.float32(0.5)}

    a = batch_sharder(mesh)(stacked)
    b = multihost_batch_sharder(mesh)(stacked)
    for k in stacked:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding == b[k].sharding, k

    infer = {"x": rng.standard_normal((4, 6)).astype(np.float32),
             "odd": rng.standard_normal((3, 6)).astype(np.float32)}
    c = infer_batch_sharder(mesh)(infer)
    d = multihost_infer_batch_sharder(mesh)(infer)
    for k in infer:
        np.testing.assert_array_equal(np.asarray(c[k]), np.asarray(d[k]))
        assert c[k].sharding == d[k].sharding, k

    g = put_global(np.arange(8, dtype=np.float32), mesh, P(("dp",)))
    assert np.asarray(g).tolist() == list(range(8))


def test_sharded_loaders_reassemble_compact_transfer():
    """data.compact_transfer composes with multi-host feeding: the link
    packing (int16 PCM, planar YUV420) is per-row deterministic, so
    per-process slices still reassemble the single-host loader's batches
    byte-identically."""
    cfg = _data_cfg(synthetic_size=8, batch_size=4, num_workers=1,
                    compact_transfer=True)
    tok = ByteTokenizer()
    mc = ModelConfig(prompt="t:")

    def mk(shard):
        ds = SyntheticAVSRDataset(cfg, tok, image_size=16)
        return DataLoader(ds, cfg, tok, model_cfg=mc, shuffle=True, seed=3,
                          prefetch=1, data_shard=shard)

    full = [hb for hb, _ in mk(None)]
    half0 = [hb for hb, _ in mk((0, 2))]
    half1 = [hb for hb, _ in mk((1, 2))]
    assert len(full) == len(half0) == len(half1) == 2

    for f, a, b in zip(full, half0, half1):
        assert f.audio.dtype == np.int16 and f.frames is None
        np.testing.assert_array_equal(np.concatenate([a.audio, b.audio]),
                                      f.audio)
        np.testing.assert_array_equal(
            np.concatenate([a.frames_y, b.frames_y]), f.frames_y)
        np.testing.assert_array_equal(
            np.concatenate([a.frames_uv, b.frames_uv]), f.frames_uv)
        np.testing.assert_array_equal(np.concatenate([a.labels, b.labels]),
                                      f.labels)
