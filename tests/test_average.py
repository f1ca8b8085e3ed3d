"""Checkpoint averaging (cli/average.py): the standard ASR last-K
parameter average, exported as a params-only Orbax file that avsr-decode
consumes directly. No reference equivalent (its best checkpoint is a
single val-loss argmin, trainer:301-305)."""

import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.cli import average as cli_average
from avsr_tpu.cli import decode as cli_decode
from avsr_tpu.cli import train as cli_train
from avsr_tpu.cli.average import average_params


def test_average_params_math_and_dtype():
    t1 = {"w": jnp.ones((2, 2), jnp.bfloat16), "idx": jnp.arange(3)}
    t2 = {"w": jnp.full((2, 2), 2.0, jnp.bfloat16), "idx": jnp.arange(3)}
    avg = average_params([t1, t2])
    np.testing.assert_allclose(np.asarray(avg["w"], np.float32), 1.5)
    assert avg["w"].dtype == jnp.bfloat16      # cast back to stored dtype
    np.testing.assert_array_equal(np.asarray(avg["idx"]), np.arange(3))


def test_average_params_nonfloat_mismatch_raises():
    t1 = {"idx": jnp.arange(3)}
    t2 = {"idx": jnp.arange(3) + 1}
    with pytest.raises(ValueError, match="not averageable"):
        average_params([t1, t2])


def _overrides(ckpt_dir, dec_dir):
    return [
        "data.synthetic=true",
        "data.synthetic_size=4",
        "data.batch_size=8",
        "data.max_label_length=24",
        "data.audio_buckets=[100]",
        "data.video_buckets=[4]",
        "model.modality=audio",
        "model.whisper={d_model: 16, n_heads: 2, n_layers: 1, max_frames: 100}",
        "model.llm={vocab_size: 260, d_model: 32, n_layers: 1, n_heads: 2, "
        "n_kv_heads: 2, ffn_dim: 64, max_seq_len: 256}",
        "training.max_steps=3",
        "training.save_every_steps=1",
        "training.keep_checkpoints=4",
        "training.log_interval=100",
        f"training.checkpoint_dir={ckpt_dir}",
        "mesh.remat=false",
        "mesh.donate=false",
        "runtime.compute_dtype=float32",
        "decode.max_new_tokens=4",
        "decode.batch_size=8",
        f"decode.output_dir={dec_dir}",
    ]


@pytest.mark.slow   # 37.8s measured r05 — >20s fast-tier policy
def test_average_cli_end_to_end(tmp_path):
    """Train 3 steps (checkpoint each), average the last 2, and decode
    from the averaged export — proving the artifact is a drop-in
    --checkpoint for the eval protocol."""
    ckpt_dir = tmp_path / "run"
    dec_dir = tmp_path / "dec"
    out = tmp_path / "avg_params"
    overrides = _overrides(ckpt_dir, dec_dir)

    assert cli_train.main(overrides) == 0
    ck = str(ckpt_dir / "ckpt")
    assert cli_average.main(
        ["--checkpoint", ck, "--last", "2", "--out", str(out),
         *overrides]) == 0
    assert out.exists()

    # the averaged export differs from the final checkpoint alone, and is
    # the true mean: check one trainable leaf against the two sources
    from avsr_tpu.core.config import load_config
    from avsr_tpu.models.avsr import init_avsr_model
    from avsr_tpu.train.checkpoint import CheckpointManager, load_params
    from avsr_tpu.train.state import create_train_state
    import jax

    cfg = load_config(None, overrides)
    params_like = init_avsr_model(jax.random.key(cfg.training.seed),
                                  cfg.model)
    state_like, _ = create_train_state(params_like, cfg, total_steps=1)
    mngr = CheckpointManager(ck)
    steps = mngr.all_steps()[-2:]
    assert len(steps) == 2
    leaf = lambda p: np.asarray(  # noqa: E731
        jax.tree.leaves(p["audio_connector"])[0], np.float32)
    srcs = [leaf(mngr.restore(state_like, step=s).params) for s in steps]
    got = leaf(load_params(out, params_like))
    np.testing.assert_allclose(got, (srcs[0] + srcs[1]) / 2, rtol=1e-6)
    assert not np.allclose(got, srcs[1])       # not just the newest ckpt

    assert cli_decode.main(
        ["--checkpoint", str(out), "--split", "train", *overrides]) == 0
    assert sorted(dec_dir.glob("wer_*.txt"))


def test_average_refuses_quantized(tmp_path):
    with pytest.raises(SystemExit, match="quantiz"):
        cli_average.main(
            ["--checkpoint", str(tmp_path), "--out", str(tmp_path / "o"),
             "model.use_4bit=true"])
