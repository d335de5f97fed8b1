"""Tracing / metrics (SURVEY.md §5: the reference has only the
`simulation_info` audit string; the survey prescribes structured
per-enrichment metrics + optional jax.profiler hooks)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class EnrichmentMetrics:
    """Structured per-enrichment metrics collector.

    Usage::

        m = EnrichmentMetrics()
        with m.step():
            ...one enrichment...
        m.record(mode=k, amplitude=a, fp_its=n)
        m.summary()
    """

    def __init__(self):
        self.rows = []
        self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self._t0 = time.perf_counter()
        yield
        self._last_dt = time.perf_counter() - self._t0

    def record(self, **kw):
        kw.setdefault("wall_s", getattr(self, "_last_dt", None))
        self.rows.append(kw)

    def summary(self) -> dict:
        if not self.rows:
            return {}
        total = sum(r["wall_s"] or 0.0 for r in self.rows)
        return {
            "enrichments": len(self.rows),
            "total_wall_s": total,
            "modes_per_s": len(self.rows) / total if total else None,
            "mean_fp_its": (
                sum(r.get("fp_its", 0) for r in self.rows) / len(self.rows)
            ),
            "final_amplitude": self.rows[-1].get("amplitude"),
        }
