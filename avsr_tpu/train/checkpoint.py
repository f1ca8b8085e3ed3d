"""One coherent checkpoint story (Orbax), replacing the reference's three.

The reference has three overlapping, partially-broken checkpoint formats
(SURVEY.md §3.5: trainer unified dict, save_pretrained directory,
save_unified_checkpoint with undefined attrs). Here there is exactly one:
an Orbax CheckpointManager directory holding {params, opt_state, step} as a
sharded (mesh-aware) pytree plus a JSON metadata sidecar (the ref's
``_meta.json`` :765-781 equivalent) — with retention (keep N), true
step-resume, and best-checkpoint tracking.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp

from avsr_tpu.core.config import AVSRConfig
from avsr_tpu.core.config import to_dict as cfg_to_dict
from avsr_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str | Path, cfg: AVSRConfig | None = None,
                 keep: int = 3):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True),
        )
        self.cfg = cfg
        self.best_val = float("inf")

    # -- save ---------------------------------------------------------------

    def save(self, state: TrainState, *, metrics: dict[str, Any] | None = None,
             is_best: bool = False, tag: str = "",
             data_state: dict[str, int] | None = None,
             fit_state: dict[str, Any] | None = None) -> None:
        step = int(state.step)
        self._mngr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(
                    {"step": state.step, "params": state.params,
                     "opt_state": state.opt_state})),
        )
        meta = {
            "step": step,
            "time": time.strftime("%Y-%m-%d %H:%M:%S"),
            "metrics": {k: float(v) for k, v in (metrics or {}).items()},
            "tag": tag,
            "is_best": is_best,
        }
        if data_state is not None:
            # loader position for mid-epoch resume (no repeated samples)
            meta["data_state"] = data_state
        if fit_state is not None:
            # best-metric / early-stop progress, so resume doesn't reset
            # the patience counter or overwrite tag='best' with a worse model
            meta["fit_state"] = fit_state
        if self.cfg is not None:
            meta["config"] = cfg_to_dict(self.cfg)
        with open(self.dir / f"meta_{step}.json", "w") as fh:
            json.dump(meta, fh, indent=2)
        if is_best:
            with open(self.dir / "best.json", "w") as fh:
                json.dump(meta, fh, indent=2)

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    # -- restore ------------------------------------------------------------

    def latest_step(self) -> int | None:
        return self._mngr.latest_step()

    def all_steps(self) -> list[int]:
        """Retained checkpoint steps, ascending."""
        return sorted(self._mngr.all_steps())

    def read_meta(self, step: int) -> dict[str, Any] | None:
        path = self.dir / f"meta_{step}.json"
        if not path.exists():
            return None
        with open(path) as fh:
            return json.load(fh)

    def restore(self, state_like: TrainState,
                step: int | None = None) -> TrainState:
        """Restore into the structure (and shardings) of ``state_like``."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.dir}")
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct,
            {"step": state_like.step, "params": state_like.params,
             "opt_state": state_like.opt_state})
        restored = self._mngr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract)))["state"]
        return TrainState(restored["step"], restored["params"],
                          restored["opt_state"])

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()


def export_params(params, path: str | Path) -> None:
    """Standalone params-only export (serving / decode without opt state)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_params(path: str | Path, params_like=None):
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if params_like is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          params_like)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)
