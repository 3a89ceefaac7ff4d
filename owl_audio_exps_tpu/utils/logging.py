"""Metric accumulation + experiment logging.

``LogHelper`` reproduces the reference's per-key accumulation with
cross-process reduction on pop (reference: owl_wms/utils/logging.py:17-64,
which all_gathers python objects over NCCL; here cross-host sums ride
``multihost_utils`` when more than one process exists).

Experiment sink: wandb when importable + configured (reference logs
exclusively to wandb, SURVEY.md §5.5); otherwise a JSONL file sink with
stdout echo so runs are observable in any environment.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

try:
    import wandb as _wandb
    HAS_WANDB = True
except ImportError:
    _wandb = None
    HAS_WANDB = False


class LogHelper:
    """Accumulate scalar metrics over grad-accum steps; pop() returns the
    per-key means reduced across processes."""

    def __init__(self):
        self._sums: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}

    def log(self, key: str, value):
        if np.ndim(value) > 0:  # histogram vectors etc.: last value wins
            if not hasattr(self, "_arrays"):
                self._arrays = {}
            self._arrays[key] = np.asarray(value)
            return
        v = float(value)
        self._sums[key] = self._sums.get(key, 0.0) + v
        self._counts[key] = self._counts.get(key, 0) + 1

    def log_dict(self, d: Dict[str, float]):
        for k, v in d.items():
            self.log(k, v)

    def pop(self) -> Dict[str, float]:
        out = {k: self._sums[k] / max(self._counts[k], 1)
               for k in self._sums}
        self._sums.clear()
        self._counts.clear()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            keys = sorted(out)
            vals = np.asarray([out[k] for k in keys], dtype=np.float32)
            summed = multihost_utils.process_allgather(vals).sum(axis=0)
            out = {k: float(summed[i] / jax.process_count())
                   for i, k in enumerate(keys)}
        # array-valued telemetry (histograms): rank-local, last value wins
        if getattr(self, "_arrays", None):
            out.update(self._arrays)
            self._arrays = {}
        return out


class DeferredMetrics:
    """Device-side metric buffer: the train loop appends raw jax scalars
    every step (no host sync — async dispatch keeps running ahead) and
    only converts to floats at the logging cadence, so the host blocks
    once per window instead of once per step (VERDICT.md Weak #8).
    """

    def __init__(self):
        self._pending = []  # (step_idx, {key: device_scalar})

    def append(self, step_idx: int, metrics: Dict):
        self._pending.append((step_idx, metrics))

    def __len__(self):
        return len(self._pending)

    def drain(self):
        """Blocks on the buffered device values; returns
        [(step_idx, {key: float | ndarray})] and clears the buffer."""
        def host(v):
            return np.asarray(v) if np.ndim(v) > 0 else float(v)

        out = [(s, {k: host(v) for k, v in m.items()})
               for s, m in self._pending]
        self._pending.clear()
        return out


class ExperimentLogger:
    """wandb if available, else JSONL + stdout. Rank-0 only
    (reference: owl_wms/trainers/base.py:26-43)."""

    def __init__(self, wandb_cfg=None, run_dir: str = "runs",
                 config: Optional[dict] = None):
        self.is_main = jax.process_index() == 0
        self._wandb_run = None
        self._file = None
        if not self.is_main:
            return
        if HAS_WANDB and wandb_cfg is not None and \
                wandb_cfg.get("project") and os.environ.get("WANDB_API_KEY"):
            self._wandb_run = _wandb.init(
                entity=wandb_cfg.get("name"),
                project=wandb_cfg.get("project"),
                name=wandb_cfg.get("run_name"),
                config=config,
            )
        else:
            os.makedirs(run_dir, exist_ok=True)
            run_name = (wandb_cfg.get("run_name") if wandb_cfg else None) \
                or f"run_{int(time.time())}"
            self._file = open(os.path.join(run_dir, f"{run_name}.jsonl"), "a")

    def log(self, metrics: Dict[str, float], step: Optional[int] = None):
        if not self.is_main:
            return
        metrics = self._render_histograms(metrics)
        if self._wandb_run is not None:
            self._wandb_run.log(metrics, step=step)
        elif self._file is not None:
            rec = {"step": step, "time": time.time(),
                   **{k: (v.tolist() if isinstance(v, np.ndarray) else v)
                      for k, v in metrics.items()}}
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
            scalars = {k: v for k, v in metrics.items()
                       if isinstance(v, (int, float))}
            print(f"[step {step}] " + " ".join(
                f"{k}={v:.5g}" for k, v in scalars.items()), flush=True)

    def _render_histograms(self, metrics: Dict) -> Dict:
        """'watch_hist/<x>' count vectors (+ _lo/_hi range scalars from
        utils/telemetry.py) become wandb.Histogram in wandb mode; other
        sinks keep the raw counts."""
        if self._wandb_run is None:
            return metrics
        out = dict(metrics)
        for key in list(out):
            if key.startswith("watch_hist/") and np.ndim(out[key]) > 0:
                counts = np.asarray(out.pop(key))
                lo = float(out.pop(f"{key}_lo", 0.0))
                hi = float(out.pop(f"{key}_hi", 1.0))
                edges = np.linspace(lo, max(hi, lo + 1e-12),
                                    len(counts) + 1)
                out[key] = _wandb.Histogram(
                    np_histogram=(counts, edges))
        return out

    def log_media(self, key: str, payload, step: Optional[int] = None):
        """Media logging (videos/audio). With wandb present mirrors the
        reference's to_wandb_av/to_wandb_samples; otherwise saves arrays
        to the run dir."""
        if not self.is_main:
            return
        if self._wandb_run is not None:
            self._wandb_run.log({key: payload}, step=step)
        elif self._file is not None:
            out_dir = os.path.dirname(self._file.name)
            np.save(os.path.join(out_dir, f"{key.replace('/', '_')}"
                                 f"_{step}.npy"),
                    np.asarray(payload))

    def finish(self):
        if self._wandb_run is not None:
            self._wandb_run.finish()
        if self._file is not None:
            self._file.close()


class Timer:
    """Wall-clock timer (reference: owl_wms/utils/__init__.py:14-19)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t = time.time()

    def hit(self) -> float:
        return time.time() - self._t
