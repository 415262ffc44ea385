"""Experiment logging and observability.

Parity + upgrades over the reference (SURVEY.md §5):
  * scalar/image logging to TensorBoard (tensorboardX, as the reference's
    d_nerf SummaryWriter at logs/summaries/<exp>) AND an always-on
    metrics.jsonl (machine-readable, the reference had only console prints);
  * throughput counters — steps/sec and ray-samples/sec/chip, the BASELINE
    primary metric, sampled over a sliding window;
  * ``args.txt`` / ``config.txt`` experiment snapshots (run.py:531-540);
  * a debug-NaN switch standing in for the reference's always-on
    ``torch.autograd.set_detect_anomaly`` perf foot-gun (utils.py:2) — off by
    default, enables ``jax_debug_nans`` when set.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def enable_debug_nans(on: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", on)


def snapshot_args(basedir: str, expname: str, args, config_path: Optional[str]) -> None:
    """Write args.txt (+ config.txt copy) like run.py:531-540. Process 0
    only in multi-process runs (parallel/multihost.py host-role rule)."""
    from swnerf_tpu.parallel.multihost import is_primary

    if not is_primary():
        return
    d = os.path.join(basedir, expname)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "args.txt"), "w") as f:
        for k in sorted(vars(args)):
            f.write(f"{k} = {getattr(args, k)}\n")
    if config_path is not None and os.path.exists(config_path):
        with open(os.path.join(d, "config.txt"), "w") as f:
            f.write(open(config_path).read())


class ExperimentLogger:
    def __init__(self, basedir: str, expname: str, use_tensorboard: bool = True):
        from swnerf_tpu.parallel.multihost import is_primary

        self.dir = os.path.join(basedir, expname)
        self._jsonl = None
        self._tb = None
        if not is_primary():  # multi-process: p0 owns metrics.jsonl + TB
            self._t_last = time.perf_counter()
            self._step_last: Optional[int] = None
            return
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(basedir, "summaries", expname))
            except Exception:
                self._tb = None
        self._t_last = time.perf_counter()
        self._step_last: Optional[int] = None

    def scalars(self, step: int, values: Dict[str, Any]) -> None:
        if self._jsonl is None:
            return
        rec = {"step": int(step), "t": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(v), int(step))

    def image(self, step: int, tag: str, img01) -> None:
        if self._tb is not None:
            import numpy as np

            img = np.asarray(img01)
            if img.ndim == 2:
                img = img[..., None]
            self._tb.add_image(tag, np.clip(img, 0, 1), int(step), dataformats="HWC")

    def throughput(
        self, step: int, samples_per_step: int, n_devices: int, synced: bool = True
    ) -> Dict[str, float]:
        """steps/sec + ray-samples/sec/chip since the last call.

        ``synced=False`` marks windows timed under per-step async dispatch
        (K=1 steps per dispatch): the host can enqueue ahead of the device,
        so the reading is an upper bound (host enqueue rate, not device
        throughput — VALIDATION.md round-2 K=1 note). Such windows get
        ``_enqueue``-suffixed keys so they can't be mistaken for the
        BASELINE device metric; K>1 scan dispatches block on the fetched
        metrics each window and time true device throughput.
        """
        now = time.perf_counter()
        if self._step_last is None:
            self._step_last, self._t_last = step, now
            return {}
        dsteps = step - self._step_last
        dt = max(now - self._t_last, 1e-9)
        self._step_last, self._t_last = step, now
        sps = dsteps / dt
        suffix = "" if synced else "_enqueue"
        out = {
            "steps_per_sec" + suffix: sps,
            "ray_samples_per_sec_per_chip"
            + suffix: sps * samples_per_step / max(n_devices, 1),
        }
        self.scalars(step, out)
        return out

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
