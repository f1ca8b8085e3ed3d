"""Profile CLI: trace the jitted step, parse the raw .xplane.pb, attribute
device time. The reference has no timeline tracer at all (SURVEY §5.1 —
logging-based memory stats only); this is its TPU-native upgrade. On the CPU
test backend jax.profiler emits host planes rather than device op lines, so
the tests assert the capture->parse->report contract, not TPU numbers."""

import json

import pytest

from avsr_tpu.cli.profile import analyze_trace, main

TINY = ["--config", "avsr_tpu/configs/tiny_cpu.yaml"]


@pytest.mark.slow   # 8.5s measured r05 — fast-tier budget policy
def test_profile_train_writes_report(tmp_path):
    rc = main(TINY + ["--mode", "train", "--steps", "2",
                      "--output_dir", str(tmp_path)])
    assert rc == 0
    report = json.loads((tmp_path / "profile_report.json").read_text())
    assert report["mode"] == "train"
    assert report["steps"] == 2
    assert report["wall_s"] > 0
    # the trace parsed: some plane existed and carried timed events
    assert report["planes"]
    assert report["device_busy_ms"] > 0
    assert report["top_ops"], "no events aggregated from the trace"
    row = report["top_ops"][0]
    assert set(row) == {"name", "ms", "pct"} and row["ms"] > 0
    # raw trace retained next to the report for TensorBoard-equipped hosts
    assert list(tmp_path.glob("plugins/profile/*/*.xplane.pb"))


def test_profile_decode_mode(tmp_path):
    rc = main(TINY + ["--mode", "decode", "--steps", "1",
                      "--output_dir", str(tmp_path),
                      "decode.max_new_tokens=4"])
    assert rc == 0
    report = json.loads((tmp_path / "profile_report.json").read_text())
    assert report["mode"] == "decode"
    assert report["device_busy_ms"] > 0


def test_analyze_trace_missing_dir(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        analyze_trace(tmp_path)
