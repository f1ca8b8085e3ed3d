"""The training loop: epochs, validation, checkpoint cadences, guards.

TPU-native rewrite of ``ClipWhisperTrainer.train``
(src/clip_whisper/trainer/clip_whisper_trainer.py:253-405): epoch loop with
best-val tracking, periodic + time-based (2-hour default) + final +
emergency checkpoints, loss CSV, throughput meters, a loss-stability monitor
(ref :338-351), and true step-resume (the ref's --resume_from is declared
but never invoked — train.py:270-272).

Differences by design:
  * grad accumulation is real (microbatched scan in train.step);
  * checkpoints are async Orbax saves — the device never waits on disk;
  * NaN handling is on-device (lax.cond skip) — the loop only counts.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.core.config import AVSRConfig
from avsr_tpu.core.logging import (
    CSVLogger,
    LossStabilityMonitor,
    ThroughputMeter,
    save_loss_plot,
)
from avsr_tpu.data.loader import DataLoader
from avsr_tpu.train.checkpoint import CheckpointManager
from avsr_tpu.train.state import TrainState, count_trainable, create_train_state
from avsr_tpu.train.step import make_eval_step, make_train_step, microbatch

log = logging.getLogger("avsr.train")


class _Preempted(Exception):
    pass


class _EarlyStopped(Exception):
    pass


class Trainer:
    def __init__(self, cfg: AVSRConfig, params, train_loader: DataLoader,
                 val_loader: DataLoader | None = None,
                 mesh=None, shard_batch=None, tok=None):
        self.cfg = cfg
        t = cfg.training
        steps_per_epoch = max(len(train_loader) // max(t.grad_accum_steps, 1), 1)
        self.total_steps = (t.max_steps if t.max_steps > 0
                            else steps_per_epoch * t.num_epochs)
        self.state, self.tx = create_train_state(params, cfg, self.total_steps)
        if mesh is not None:
            from avsr_tpu.mesh.sharding import shard_train_step
            self.train_step, self.eval_step = shard_train_step(
                cfg, self.tx, mesh)
        else:
            self.train_step = make_train_step(cfg, self.tx)
            self.eval_step = make_eval_step(cfg)
        self.shard_batch = shard_batch
        self.mesh = mesh
        if mesh is not None:
            from avsr_tpu.mesh.sharding import infer_batch_sharder
            self._infer_shard = infer_batch_sharder(mesh)
        else:
            self._infer_shard = None
        self.train_loader = train_loader
        self.val_loader = val_loader

        out = Path(t.checkpoint_dir)
        out.mkdir(parents=True, exist_ok=True)
        self.ckpt = CheckpointManager(out / "ckpt", cfg,
                                      keep=t.keep_checkpoints)
        self.csv = CSVLogger(out / "loss_log.csv",
                             ["step", "epoch", "split", "loss", "accuracy",
                              "wer", "grad_norm", "lr_step_time_s",
                              "tokens_per_sec", "utts_per_sec", "skipped"])
        self.monitor = LossStabilityMonitor(
            window=t.loss_stability_window, max_bad=3)
        self.meter = ThroughputMeter()
        self.history: dict[str, list[float]] = {"train": [], "val": []}
        self.best_val = float("inf")
        # In-training WER eval + best-metric tracking (training.
        # eval_wer_every_epochs / best_metric / early_stop_patience)
        self.tok = tok
        self.best_wer = float("inf")
        self._evals_no_improve = 0
        if (t.eval_wer_every_epochs > 0 and tok is None
                and val_loader is not None):
            log.warning("eval_wer_every_epochs set but the Trainer got no "
                        "tokenizer — in-training WER eval disabled")
        self._last_time_ckpt = time.time()
        self._rng = jax.random.key(t.seed)
        self._profiling = False
        self._start_epoch = 0
        self._preempted = False

        trainable, total = count_trainable(params, cfg.model)
        log.info("model: %.2fM params, %.2fM trainable (%.1f%%)",
                 total / 1e6, trainable / 1e6, 100 * trainable / max(total, 1))

    # ------------------------------------------------------------------

    def maybe_resume(self) -> bool:
        t = self.cfg.training
        src = t.resume_from or (
            str(self.ckpt.dir) if self.ckpt.latest_step() is not None else "")
        if not src:
            return False
        mngr = self.ckpt if src == str(self.ckpt.dir) else CheckpointManager(src)
        try:
            self.state = mngr.restore(self.state)
        except FileNotFoundError:
            return False
        # Mid-epoch data-order resume: replay the interrupted epoch's
        # deterministic shuffle and skip already-consumed batches, so no
        # sample repeats (the ref logs --resume_from and restarts data from
        # scratch — train.py:270-272).
        meta = mngr.read_meta(int(self.state.step)) or {}
        fit = meta.get("fit_state")
        if fit:
            self.best_val = float(fit.get("best_val", self.best_val))
            self.best_wer = float(fit.get("best_wer", self.best_wer))
            self._evals_no_improve = int(
                fit.get("evals_no_improve", self._evals_no_improve))
        ds_state = meta.get("data_state")
        if ds_state:
            self.train_loader.set_position(ds_state["epoch"],
                                           ds_state["batches"])
            self._start_epoch = max(ds_state["epoch"] - 1, 0)
            log.info("resumed from step %d (epoch %d, batch %d)",
                     int(self.state.step), ds_state["epoch"],
                     ds_state["batches"])
        else:
            log.info("resumed from step %d", int(self.state.step))
        return True

    # ------------------------------------------------------------------

    def train(self) -> dict[str, Any]:
        t = self.cfg.training
        accum = max(t.grad_accum_steps, 1)
        epoch = self._start_epoch
        self._unstable = 0
        self._install_preemption_handler()
        try:
            while int(self.state.step) < self.total_steps:
                epoch += 1
                # Micro-batches from different length buckets have different
                # static shapes; accumulate per shape group so every stacked
                # [accum, micro, ...] batch is homogeneous.
                self._groups = {}
                for hb, batch in self.train_loader:
                    key = tuple(
                        x.shape for x in jax.tree_util.tree_leaves(batch))
                    group = self._groups.setdefault(key, [])
                    group.append(batch)
                    if len(group) < accum:
                        continue
                    del self._groups[key]
                    self._guarded_step(group, epoch)
                    if int(self.state.step) >= self.total_steps:
                        break
                if int(self.state.step) < self.total_steps:
                    # Flush partial groups — no data silently dropped; each
                    # is zero-weight-padded to `accum` in _step (no recompile).
                    for group in list(self._groups.values()):
                        if int(self.state.step) >= self.total_steps:
                            break
                        self._guarded_step(group, epoch)
                    self._groups = {}
                self._end_of_epoch(epoch)
        except _Preempted:
            log.info("stopped on preemption at step %d — resume to continue",
                     int(self.state.step))
        except _EarlyStopped:
            log.info("early stop at epoch %d: no %s improvement in %d "
                     "evals (best loss %.4f, best WER %.4f)", epoch,
                     t.best_metric, self._evals_no_improve, self.best_val,
                     self.best_wer)
        except (KeyboardInterrupt, Exception):
            log.exception("training interrupted — emergency checkpoint")
            self.ckpt.save(self.state, tag="emergency",
                           data_state=self._data_state(),
                           fit_state=self._fit_state())
            self.ckpt.wait()
            raise
        finally:
            if self._profiling:   # run ended inside the trace window
                jax.profiler.stop_trace()
                self._profiling = False
            self._restore_sigterm_handler()
        if not self._preempted:   # preempt path already saved this step
            self.ckpt.save(self.state, tag="final",
                           is_best=not np.isfinite(self.best_val),
                           data_state=self._data_state(),
                           fit_state=self._fit_state())
        self.ckpt.wait()
        save_loss_plot(self.history, Path(t.checkpoint_dir))
        return {"steps": int(self.state.step), "epochs": epoch,
                "best_val": self.best_val, "best_wer": self.best_wer}

    # ------------------------------------------------------------------

    def _data_state(self) -> dict[str, int]:
        """Loader position for checkpoint meta. Batches consumed into
        still-pending accumulation groups have NOT been applied to the
        params, so the saved position rewinds past them — on resume those
        batches replay. A replayed batch may (rarely) be one that was
        already stepped in an interleaved group, so resume is at-least-once
        per micro-batch across a preemption, never lossy."""
        st = self.train_loader.state()
        pending = sum(len(g) for g in getattr(self, "_groups", {}).values())
        return {"epoch": st["epoch"],
                "batches": max(st["batches"] - pending, 0)}

    def _fit_state(self) -> dict[str, float | int]:
        """Best-metric + early-stop progress for checkpoint meta. Without
        it a resumed run resets the patience counter and the first
        post-resume eval always "improves" vs inf, overwriting tag='best'
        with a possibly worse model."""
        return {"best_val": self.best_val, "best_wer": self.best_wer,
                "evals_no_improve": self._evals_no_improve}

    # ------------------------------------------------------------------

    def _guarded_step(self, micro_batches, epoch: int) -> dict[str, float]:
        t = self.cfg.training
        metrics = self._step(micro_batches, epoch)
        if metrics["skipped"]:
            self._unstable += 1
            if self._unstable > t.max_unstable_batches:
                raise RuntimeError(
                    f"too many unstable steps ({self._unstable}) — "
                    "aborting (ref trainer:444-451)")
        else:
            self._unstable = 0
        if self.monitor.update(metrics["loss"]):
            log.error("loss unstable — emergency checkpoint")
            self.ckpt.save(self.state, metrics=metrics, tag="emergency",
                           data_state=self._data_state(),
                           fit_state=self._fit_state())
        return metrics

    # ------------------------------------------------------------------

    def _step(self, micro_batches, epoch: int) -> dict[str, float]:
        t = self.cfg.training
        accum = max(t.grad_accum_steps, 1)
        n_real = len(micro_batches)
        weights = None
        if 1 < accum:
            if n_real < accum:
                # zero-weight-pad a partial group to the compiled accum shape
                micro_batches = micro_batches + \
                    [micro_batches[-1]] * (accum - n_real)
                weights = np.zeros((accum,), np.float32)
                weights[:n_real] = 1.0 / n_real
            # jnp.stack keeps the (already on-device) featurized batches
            # on device — np.stack here would round-trip tens of MB through
            # the host every accumulation step.
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *micro_batches)
        else:
            stacked = microbatch(micro_batches[0], 1)
        if self.shard_batch is not None:
            stacked = self.shard_batch(stacked)
        self._rng, sub = jax.random.split(self._rng)
        if weights is None:
            self.state, metrics = self.train_step(self.state, stacked, sub)
        else:
            self.state, metrics = self.train_step(
                self.state, stacked, sub, weights)
        m = {k: float(v) for k, v in metrics.items()}
        step = int(self.state.step)
        self.history["train"].append(m["loss"])

        labels = np.asarray(micro_batches[0].label_lens)
        thr = self.meter.step(int(labels.sum()) * n_real,
                              labels.shape[0] * n_real)
        if step % max(t.log_interval, 1) == 0 or step == 1:
            log.info("step %d/%d | loss %.4f | acc %.3f | gnorm %.2f | "
                     "%.1f tok/s | %.2f utt/s",
                     step, self.total_steps, m["loss"], m["accuracy"],
                     m["grad_norm"], thr["tokens_per_sec"], thr["utts_per_sec"])
        self.csv.log(step=step, epoch=epoch, split="train", **m,
                     lr_step_time_s=round(thr["step_time_s"], 4),
                     tokens_per_sec=round(thr["tokens_per_sec"], 1),
                     utts_per_sec=round(thr["utts_per_sec"], 3))

        if t.save_every_steps > 0 and step % t.save_every_steps == 0:
            self.ckpt.save(self.state, metrics=m,
                           data_state=self._data_state(),
                           fit_state=self._fit_state())
        if time.time() - self._last_time_ckpt > t.save_every_secs:
            # ref 2-hour wall-clock cadence (trainer:256-257, 310-318)
            self.ckpt.save(self.state, metrics=m, tag="timed",
                           data_state=self._data_state(),
                           fit_state=self._fit_state())
            self._last_time_ckpt = time.time()
        self._maybe_profile(step)
        if step % 100 == 0:
            self._log_device_memory(step)
        if self._preempted:
            # TPU preemption (SIGTERM): save with loader position and stop
            # cleanly — the next run resumes mid-epoch with no lost samples.
            log.warning("preemption signal — checkpoint + clean stop")
            self.ckpt.save(self.state, metrics=m, tag="preempt",
                           data_state=self._data_state(),
                           fit_state=self._fit_state())
            self.ckpt.wait()
            raise _Preempted
        return m

    # ------------------------------------------------------------------

    def _install_preemption_handler(self) -> None:
        """SIGTERM -> checkpoint-and-exit at the next step boundary (the
        preemption-aware loop SURVEY.md §5.3 calls for; the reference has
        only same-process exception recovery, trainer:394-405)."""
        import signal
        import threading

        self._preempted = False
        if threading.current_thread() is not threading.main_thread():
            return

        def _on_term(signum, frame):
            del signum, frame
            self._preempted = True

        try:
            self._old_sigterm = signal.signal(signal.SIGTERM, _on_term)
            # keep the handler object so restore can verify it is still
            # ours; a separate installed flag distinguishes "never
            # installed" from "previous handler was None" (set from C —
            # restore falls back to SIG_DFL there so the dead-trainer
            # swallow still can't occur). ADVICE r04.
            self._own_sigterm = _on_term
            self._sigterm_installed = True
        except (ValueError, OSError):   # non-main interpreter contexts
            pass

    def _restore_sigterm_handler(self) -> None:
        """Undo _install_preemption_handler when train() exits. Without
        this, a finished Trainer leaves its handler on the PROCESS: later
        SIGTERMs are silently swallowed (set a dead trainer's flag) instead
        of terminating — observed as a `timeout`-wrapped suite absorbing
        the signal and running past its deadline. Restores only if the
        current handler is still this Trainer's own (surrounding code may
        have installed its own mid-train; don't clobber it)."""
        import signal

        if not getattr(self, "_sigterm_installed", False):
            return
        self._sigterm_installed = False
        old = getattr(self, "_old_sigterm", None)
        own = getattr(self, "_own_sigterm", None)
        self._old_sigterm = None
        self._own_sigterm = None
        try:
            if signal.getsignal(signal.SIGTERM) is not own:
                return        # someone re-bound it after us: theirs wins
            signal.signal(signal.SIGTERM,
                          signal.SIG_DFL if old is None else old)
        except (ValueError, OSError):
            pass

    def _log_device_memory(self, step: int) -> None:
        """Per-100-step device memory telemetry (ref trainer:484-487,
        967-974 logged CUDA stats on the same cadence)."""
        stats = getattr(jax.local_devices()[0], "memory_stats", lambda: None)()
        if stats:
            used = stats.get("bytes_in_use", 0)
            peak = stats.get("peak_bytes_in_use", used)
            limit = stats.get("bytes_limit", 0)
            log.info("step %d | device mem %.2f GiB (peak %.2f / limit %.2f)",
                     step, used / 2**30, peak / 2**30, limit / 2**30)

    def _maybe_profile(self, step: int) -> None:
        """runtime.profile_dir: capture a jax.profiler timeline of steps
        4-7 (past compile + warmup) — the TPU answer to the reference's
        memory-only instrumentation (trainer:484-487, 967-974)."""
        pdir = self.cfg.runtime.profile_dir
        if not pdir:
            return
        if step == 4 and not self._profiling:
            jax.profiler.start_trace(pdir)
            self._profiling = True
            log.info("profiler: tracing steps 4-7 -> %s", pdir)
        elif step == 7 and self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
            log.info("profiler: trace written to %s", pdir)

    # ------------------------------------------------------------------

    def _end_of_epoch(self, epoch: int) -> None:
        if self.val_loader is None:
            return
        t = self.cfg.training
        losses, accs = [], []
        for hb, batch in self.val_loader:
            out = self.eval_step(self.state.params, batch)
            loss = float(out["loss"])
            # ref clamps non-finite val losses (trainer:580-582)
            losses.append(loss if np.isfinite(loss) else 1e6)
            accs.append(float(out["accuracy"]))
        if not losses:
            return
        val_loss = float(np.mean(losses))
        self.history["val"].append(val_loss)
        log.info("epoch %d | val loss %.4f | val acc %.3f", epoch, val_loss,
                 float(np.mean(accs)))
        self.csv.log(step=int(self.state.step), epoch=epoch, split="val",
                     loss=val_loss, accuracy=float(np.mean(accs)))
        val_wer = None
        if (t.eval_wer_every_epochs > 0 and self.tok is not None
                and epoch % t.eval_wer_every_epochs == 0):
            val_wer = self._eval_wer(epoch)

        # Best-checkpoint selection + early stopping on the configured
        # metric. best_metric='wer' only compares on epochs that ran a WER
        # eval; 'loss' compares every epoch (the reference's behavior,
        # trainer:301-305). Both bests are tracked regardless.
        if t.best_metric == "wer":
            if val_wer is None:
                self.best_val = min(self.best_val, val_loss)
                return
            improved = val_wer < self.best_wer
            metrics = {"val_wer": val_wer, "val_loss": val_loss}
        else:
            improved = val_loss < self.best_val
            metrics = {"val_loss": val_loss}
            if val_wer is not None:
                metrics["val_wer"] = val_wer
        self.best_val = min(self.best_val, val_loss)
        if val_wer is not None:
            self.best_wer = min(self.best_wer, val_wer)
        if improved:
            self._evals_no_improve = 0
            self.ckpt.save(self.state, metrics=metrics,
                           is_best=True, tag="best",
                           fit_state=self._fit_state())
        else:
            self._evals_no_improve += 1
            if (t.early_stop_patience > 0
                    and self._evals_no_improve >= t.early_stop_patience):
                raise _EarlyStopped

    def _eval_wer(self, epoch: int) -> float:
        """In-training WER: greedy-decode up to eval_wer_max_utts val
        utterances with the CURRENT params (LoRA live, encoders as
        trained) and return corpus WER — the metric of record
        (SURVEY.md §5.5), tracked during training instead of only in
        cli/decode.py afterwards. jit traces cache across epochs (one per
        val bucket shape), so only the first eval pays compiles."""
        from avsr_tpu.infer.generate import generate_tokens
        from avsr_tpu.infer.wer import WERAccumulator

        t, d = self.cfg.training, self.cfg.decode
        acc = WERAccumulator()
        seen: set[str] = set()
        t0 = time.time()
        for hb, batch in self.val_loader:
            # Same mesh plumbing as cli/decode.py:129-135: shard the val
            # batch across the mesh (otherwise every chip redundantly
            # decodes the replicated batch) and thread mesh= so sp/pp
            # handling inside generate engages.
            if self._infer_shard is not None:
                batch = self._infer_shard(batch)
            out = generate_tokens(
                self.state.params, self.cfg.model, batch,
                max_new_tokens=d.max_new_tokens, eos_id=self.tok.eos_id,
                compute_dtype=self.cfg.runtime.compute_dtype,
                use_pallas=self.cfg.runtime.use_pallas,
                kv_cache_dtype=d.kv_cache_dtype, mesh=self.mesh)
            tokens = np.asarray(out.tokens)
            lens = np.asarray(out.lengths)
            for i, (utt, ref) in enumerate(zip(hb.utt_ids, hb.texts)):
                if utt in seen:     # final short batch is wrap-padded
                    continue
                seen.add(utt)
                acc.add(ref, self.tok.decode(tokens[i, : lens[i]]))
            if acc.utterances >= t.eval_wer_max_utts:
                break
        log.info("epoch %d | val WER %.4f CER %.4f (%d utts, %.1fs)",
                 epoch, acc.wer, acc.cer, acc.utterances, time.time() - t0)
        self.csv.log(step=int(self.state.step), epoch=epoch,
                     split="val_wer", wer=round(acc.wer, 4))
        return acc.wer
