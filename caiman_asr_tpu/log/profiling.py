"""Profiling hooks (reference: log/profiling.py:12-70 + train.py:204-272).

- ``Profiler``: wraps ``jax.profiler`` trace capture (the yappi equivalent;
  view with TensorBoard or Perfetto) behind ``--profiler``.
- ``PhaseTimers``: coarse per-phase wall-clock accumulation
  (dataloading / feat_proc / fwd_bwd), dumped to
  ``benchmark/timings_step{N}.json`` like the reference's timings files.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path
from typing import Dict, Optional


class Profiler:
    def __init__(self, output_dir: str | Path, enabled: bool = False):
        self.enabled = enabled
        self.dir = Path(output_dir) / "profile"
        self._active = False

    def start(self):
        if self.enabled and not self._active:
            import jax

            self.dir.mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(str(self.dir))
            self._active = True

    def stop(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler trace written to {self.dir}")


class PhaseTimers:
    PHASES = ("dataloading", "feat_proc", "fwd_bwd")

    def __init__(self, output_dir: Optional[str | Path] = None):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.output_dir = Path(output_dir) if output_dir else None

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_ms": round(1e3 * v / max(self.counts[k], 1), 3)}
            for k, v in self.totals.items()
        }

    def dump(self, step: int):
        if self.output_dir is None:
            return
        out = self.output_dir / "benchmark"
        out.mkdir(parents=True, exist_ok=True)
        (out / f"timings_step{step}.json").write_text(
            json.dumps(self.summary(), indent=1)
        )

    def reset(self):
        self.totals.clear()
        self.counts.clear()
