"""Observability: TensorBoard metrics + jax profiler traces.

Capability parity with the reference's logging/tracing surface
(reference: mmcv TextLoggerHook + TensorboardLoggerHook
configs/_base_/default_runtime.py:6-11; the patched by-epoch TB hook
tools/tensorboard_modified.py; BEVFormerDistill's raw per-iter
SummaryWriter bevformer_distill.py:253-258,982-984; and the profiling gap
noted in SURVEY.md §5 — filled here with jax.profiler xplane traces).
"""
from __future__ import annotations

import contextlib
import os
import os.path as osp
import time
from typing import Dict, Optional


class MetricsWriter:
    """TensorBoard scalar writer (torch.utils.tensorboard backend, which
    ships in this image; degrades to JSONL when unavailable)."""

    def __init__(self, log_dir: str, by_epoch: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.by_epoch = by_epoch
        self._jsonl = open(osp.join(log_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def write(self, metrics: Dict[str, float], step: int,
              epoch: Optional[int] = None):
        import json
        rec = {"step": step, "ts": time.time()}
        if epoch is not None:
            rec["epoch"] = epoch
        for k, v in metrics.items():
            v = float(v)
            rec[k] = v
            if self._tb is not None:
                tag = f"train/{k}"
                self._tb.add_scalar(tag, v, step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context producing xplane/perfetto dumps."""
    import jax
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Simple EMA step timer for it/s logging."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = None
        self._last = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else \
                (1 - self.alpha) * self.ema + self.alpha * dt
        self._last = now
        return self.ema
