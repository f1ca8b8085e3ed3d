"""analyze_memory CLI: analytic per-mode report + measured allocator deltas
(ref scripts/clip_whisper/analyze_memory.py:320-589). CPU backends expose no
allocator stats, so the measured section only appears on TPU — the analytic
JSON + charts must work everywhere."""

import json
from pathlib import Path

import jax

from avsr_tpu.cli.analyze_memory import main, measured_component_bytes


def test_analyze_memory_cli_writes_report(tmp_path):
    rc = main(["--config", "avsr_tpu/configs/tiny_cpu.yaml",
               "--output_dir", str(tmp_path),
               "model.modality=both"])
    assert rc == 0
    report = json.loads((tmp_path / "memory_stats.json").read_text())
    assert set(report["modes"]) == {"fp32", "bf16", "int8_llm", "int4_llm"}
    comps = report["modes"]["fp32"]
    assert {"whisper", "clip", "llm"} <= set(comps)
    # int8 quantizes the LLM only: its share must shrink vs fp32
    assert report["modes"]["int8_llm"]["llm"] < comps["llm"]
    assert report["params_trainable"] < report["params_total"]
    assert "llm_remat" in report["activation_estimate_gib"]
    assert (tmp_path / "memory_analysis.png").exists()


def test_measured_component_bytes():
    """Every backend measures real on-device buffer sizes (>= the logical
    nbytes — tile layout padding only adds); allocator deltas appear only
    where memory_stats exists (standard TPU runtimes)."""
    from avsr_tpu.core.config import load_config
    from avsr_tpu.models.avsr import init_avsr_model

    cfg = load_config("avsr_tpu/configs/tiny_cpu.yaml", {})
    measured = measured_component_bytes(cfg)
    shapes = jax.eval_shape(lambda k: init_avsr_model(k, cfg.model),
                            jax.random.key(0))
    assert set(measured) == set(shapes)
    for name, row in measured.items():
        logical = sum(leaf.size * leaf.dtype.itemsize for leaf in
                      jax.tree_util.tree_leaves(shapes[name]))
        assert row["on_device"] >= logical > 0
    dev = jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats and "bytes_in_use" in stats:
        assert all("allocator_delta" in r for r in measured.values())
