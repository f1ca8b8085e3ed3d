"""Subprocess worker for the REAL multi-process multi-host proof
(tests/test_multihost_2proc.py — VERDICT r03 next-step #6).

Runs one jitted train step over an 8-device dp2·fsdp2·tp2 mesh and prints
``LOSS <value>``. With ``nproc > 1`` the process joins a localhost
``jax.distributed`` cluster (Gloo CPU collectives), sees 8//nproc local
devices, loads ONLY its row slice of every global batch
(``DataLoader(data_shard=process_shard())``) and assembles global arrays
through ``mesh.multihost.multihost_batch_sharder`` — exactly the pod-slice
path cli/train.py auto-enables. With ``nproc == 1`` it is the plain
single-process run the multi-process loss must match.

Usage: python tests/multihost_worker.py <pid> <nproc> <port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(pid: int, nproc: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // nproc}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if nproc > 1:
        jax.distributed.initialize(f"127.0.0.1:{port}",
                                   num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 8

    import dataclasses

    from avsr_tpu.core.config import (
        AVSRConfig,
        DataConfig,
        MeshConfig,
        RuntimeConfig,
        TrainingConfig,
    )
    from avsr_tpu.data.dataset import SyntheticAVSRDataset
    from avsr_tpu.data.loader import DataLoader
    from avsr_tpu.data.tokenizer import ByteTokenizer
    from avsr_tpu.mesh.multihost import multihost_batch_sharder, process_shard
    from avsr_tpu.mesh.sharding import batch_sharder, build_mesh, shard_state
    from avsr_tpu.models.avsr import init_avsr_model
    from avsr_tpu.train.state import create_train_state
    from avsr_tpu.train.step import make_train_step, microbatch
    from test_models_avsr import tiny_model_cfg

    model = tiny_model_cfg(modality="audio")
    model = dataclasses.replace(
        model,
        llm=dataclasses.replace(model.llm, vocab_size=260, max_seq_len=256),
        whisper=dataclasses.replace(model.whisper, max_frames=200))
    cfg = AVSRConfig(
        data=DataConfig(synthetic=True, synthetic_size=8, batch_size=4,
                        max_audio_length=48000, max_video_length=8,
                        max_label_length=24, audio_buckets=(100, 200),
                        video_buckets=(4, 8), num_workers=0),
        model=model,
        training=TrainingConfig(num_epochs=1, learning_rate=1e-3,
                                warmup_steps=2, grad_accum_steps=1,
                                log_interval=1, save_every_steps=0),
        mesh=MeshConfig(dp=2, fsdp=2, tp=2, remat=False, donate=False),
        runtime=RuntimeConfig(compute_dtype="float32"),
    )

    tok = ByteTokenizer()
    ds = SyntheticAVSRDataset(cfg.data, tok, image_size=16)
    shard = process_shard() if nproc > 1 else None
    loader = DataLoader(ds, cfg.data, tok, model_cfg=cfg.model,
                        shuffle=True, seed=3, prefetch=1, data_shard=shard,
                        compute_dtype=cfg.runtime.compute_dtype)

    mesh = build_mesh(cfg.mesh)
    shard_batch = (multihost_batch_sharder(mesh) if nproc > 1
                   else batch_sharder(mesh))

    params = init_avsr_model(jax.random.key(0), cfg.model)
    state, tx = create_train_state(params, cfg, total_steps=10)
    state = shard_state(state, mesh)
    step_fn = make_train_step(cfg, tx)

    _, batch = next(iter(loader))
    stacked = shard_batch(microbatch(batch, 1))
    state, metrics = step_fn(state, stacked, jax.random.key(1))
    loss = float(metrics["loss"])
    loader.close()
    print(f"LOSS {loss:.10f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
