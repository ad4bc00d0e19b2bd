"""Tracing / profiling hooks (SURVEY.md §5.1).

Counterpart of the reference's torch.profiler setup (ref
training_loop.py:83-93, misc.profiled_function, per-phase CUDA events):
  - trace(): jax.profiler.trace context producing TensorBoard-compatible
    traces under <run_dir>/profiling_logs
  - named_scope: re-export of jax.named_scope (the record_function analogue)
  - PhaseTimer: host wall-clock timing around block_until_ready'd phases,
    reported as Timing/<phase> like the reference's CUDA-event telemetry.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    if not enabled:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class PhaseTimer:
    """Accumulates per-phase wall time; values land in stats.jsonl as
    Timing/<phase> (ref training_loop.py:206-215, 499-505)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def means(self) -> Dict[str, float]:
        return {f'Timing/{k}': self.totals[k] / self.counts[k] for k in self.totals}

    def reset(self):
        self.totals.clear()
        self.counts.clear()
