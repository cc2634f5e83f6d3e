"""Tracing / profiling utilities.

TPU-native replacement for the reference's cProfile harnesses
(/root/reference/main.py:86-116, pit.py:198-214) and fvcore FLOP counting
(GenericNNetWrapper.py:389-397):

- ``phase_timer``: wall-clock phase timers with device sync (the reference's
  warmup-then-measure pattern);
- ``trace``: context manager around ``jax.profiler`` writing a TensorBoard
  trace directory;
- ``cost_stats``: XLA-reported FLOPs / bytes for a jitted function — the
  fvcore analog, from the compiler instead of operator tables;
- ``MetricsLogger``: JSONL metrics stream (steps/s, sims/s, losses, gate
  winrates — SURVEY.md §5 observability row).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

import jax


class phase_timer:
    """with phase_timer(metrics, "selfplay"): ... — records seconds with a
    block_until_ready barrier so device work is attributed correctly."""

    def __init__(self, sink: Optional[Dict[str, float]] = None,
                 name: str = "phase", sync: Any = None):
        self.sink = sink if sink is not None else {}
        self.name = name
        self.sync = sync

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync is not None:
            jax.block_until_ready(self.sync)
        self.seconds = time.perf_counter() - self.t0
        self.sink[self.name] = self.sink.get(self.name, 0.0) + self.seconds
        return False


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace for TensorBoard (reference: cProfile dump of
    execution.prof; here: full XLA timeline)."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def cost_stats(fn, *args, **kwargs) -> Dict[str, float]:
    """Compile fn and return XLA cost analysis (flops, bytes accessed) —
    the reference's fvcore FLOP counter analog."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    out: Dict[str, float] = {}
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        for k in ("flops", "bytes accessed", "transcendentals"):
            if k in ca:
                out[k.replace(" ", "_")] = float(ca[k])
    except Exception:                                  # backend-dependent
        pass
    try:
        mem = compiled.memory_analysis()
        out["temp_bytes"] = float(mem.temp_size_in_bytes)
        out["argument_bytes"] = float(mem.argument_size_in_bytes)
    except Exception:
        pass
    return out


class MetricsLogger:
    """Append-only JSONL metrics (the reference logs tqdm bars + score.txt;
    structured streams feed dashboards instead)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, record: Dict[str, Any]):
        record = dict(record, ts=time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")
