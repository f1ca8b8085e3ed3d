"""Logging, metrics, and observability.

TPU-native replacement for the reference's logging stack (SURVEY.md §5.5):
console+file logging with third-party silencing (ref train.py:91-124,
src/utils/setup.py:15-62), per-step loss CSV (ref trainer:269-274), and a
metrics meter tracking tokens/sec & utterances/sec. (Timeline tracing
lives in the Trainer: RuntimeConfig.profile_dir drives jax.profiler.)
"""

from __future__ import annotations

import csv
import json
import logging
import sys
import time
from collections import deque
from pathlib import Path
from typing import Any

_NOISY = ("urllib3", "filelock", "fsspec", "absl", "matplotlib",
          "PIL", "transformers", "jax._src", "orbax")


def setup_logging(
    log_file: str | Path | None = None,
    level: int = logging.INFO,
    name: str = "avsr",
) -> logging.Logger:
    """Console (+optional file) logging with noisy third-party loggers silenced."""
    root = logging.getLogger()
    root.setLevel(level)
    for h in list(root.handlers):
        root.removeHandler(h)
    fmt = logging.Formatter(
        "%(asctime)s | %(levelname)-7s | %(name)s | %(message)s", "%H:%M:%S")
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(fmt)
    root.addHandler(sh)
    if log_file:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        root.addHandler(fh)
    for noisy in _NOISY:
        logging.getLogger(noisy).setLevel(logging.WARNING)
    return logging.getLogger(name)


class CSVLogger:
    """Append-only CSV metrics log (reference trainer loss_log.csv:269-274)."""

    def __init__(self, path: str | Path, fieldnames: list[str]):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.fieldnames = fieldnames
        if not self.path.exists():
            with open(self.path, "w", newline="") as fh:
                csv.DictWriter(fh, fieldnames=fieldnames).writeheader()
            return
        # Schema migration on resume: if the existing file was written by
        # an older fieldname set (e.g. pre-'wer' logs), rewriting with the
        # new header keeps appended rows aligned — blind appends against a
        # stale header would silently shift every column after the insert.
        with open(self.path, newline="") as fh:
            reader = csv.DictReader(fh)
            old = reader.fieldnames or []
            if old == fieldnames:
                return
            rows = list(reader)
        with open(self.path, "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=fieldnames)
            writer.writeheader()
            for row in rows:
                writer.writerow({k: row.get(k, "") for k in fieldnames})

    def log(self, **row: Any) -> None:
        with open(self.path, "a", newline="") as fh:
            csv.DictWriter(fh, fieldnames=self.fieldnames).writerow(
                {k: row.get(k, "") for k in self.fieldnames})


class ThroughputMeter:
    """Rolling tokens/sec + utterances/sec + step-time meter (window-averaged)."""

    def __init__(self, window: int = 50):
        self._events: deque[tuple[float, int, int]] = deque(maxlen=window)
        self._last = time.perf_counter()

    def step(self, n_tokens: int, n_utts: int) -> dict[str, float]:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._events.append((dt, n_tokens, n_utts))
        total_t = sum(e[0] for e in self._events) or 1e-9
        return {
            "step_time_s": dt,
            "tokens_per_sec": sum(e[1] for e in self._events) / total_t,
            "utts_per_sec": sum(e[2] for e in self._events) / total_t,
        }


class LossStabilityMonitor:
    """Windowed loss-stability guard (reference trainer:338-351).

    Tracks the last ``window`` epoch/step losses; reports instability when
    a configured number of consecutive non-finite losses is seen.
    """

    def __init__(self, window: int = 5, max_bad: int = 3):
        self.window: deque[float] = deque(maxlen=window)
        self.max_bad = max_bad
        self.consecutive_bad = 0

    def update(self, loss: float) -> bool:
        """Returns True when an emergency checkpoint should be taken."""
        import math
        finite = math.isfinite(loss)
        self.window.append(loss if finite else float("nan"))
        self.consecutive_bad = 0 if finite else self.consecutive_bad + 1
        return self.consecutive_bad >= self.max_bad


def save_loss_plot(losses: dict[str, list[float]], out_dir: str | Path) -> None:
    """Loss curves as PNG + JSON (reference trainer:856-882). Matplotlib-gated."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "loss_history.json", "w") as fh:
        json.dump(losses, fh)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # matplotlib optional
        return
    fig, ax = plt.subplots(figsize=(8, 5))
    for name, series in losses.items():
        if series:
            ax.plot(series, label=name)
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.legend()
    fig.savefig(out / "loss_curve.png", dpi=100, bbox_inches="tight")
    plt.close(fig)
