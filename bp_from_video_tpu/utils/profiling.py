"""Stage-boundary profiler (reference profiler.py rebuilt for an async
device).

The reference wraps each stage method with a cProfile toggle (reference
profiler.py:17-32) and prints a filtered report after the loop (bp.py:37).
cProfile is wrong for JAX — dispatch returns before the device finishes —
so this profiler measures wall time per decorated call with an optional
``fence`` that blocks on the result (device-inclusive timing), plus
jax.profiler trace hooks for deep dives.

Same usage shape: decorate stage boundaries with ``@profiler.timeit``, dump
with ``profiler.printit()``; a global ``enabled`` toggle makes it free when
off (reference profiler.py:7, pbp.py:11).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field

import jax


@dataclass
class _Stat:
    calls: int = 0
    total: float = 0.0
    best: float = field(default=float("inf"))
    worst: float = 0.0

    def add(self, dt: float):
        self.calls += 1
        self.total += dt
        self.best = min(self.best, dt)
        self.worst = max(self.worst, dt)


class StageProfiler:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stats: dict[str, _Stat] = {}

    def timeit(self, func=None, *, name: str | None = None,
               fence: bool = False):
        """Decorator recording wall time per call.  ``fence=True`` blocks on
        the returned pytree so on-device work is included (use on the
        outermost jitted call only — fencing inner stages serializes the
        pipeline)."""
        if func is None:
            return lambda f: self.timeit(f, name=name, fence=fence)
        label = name or func.__name__

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            if not self.enabled:
                return func(*args, **kwargs)
            t0 = time.perf_counter()
            out = func(*args, **kwargs)
            if fence:
                jax.block_until_ready(out)
            self.stats.setdefault(label, _Stat()).add(
                time.perf_counter() - t0)
            return out
        return wrapper

    def report(self) -> str:
        if not self.stats:
            return "(no profile data)"
        rows = ["stage                          calls   total ms    mean ms"
                "     min ms     max ms"]
        for name, s in sorted(self.stats.items(),
                              key=lambda kv: -kv[1].total):
            rows.append(f"{name:30s} {s.calls:5d} {s.total*1e3:10.2f} "
                        f"{s.total/s.calls*1e3:10.3f} {s.best*1e3:10.3f} "
                        f"{s.worst*1e3:10.3f}")
        return "\n".join(rows)

    def printit(self, clear: bool = False) -> None:
        if self.enabled:
            print(self.report())
            if clear:
                self.stats.clear()

    def clear(self) -> None:
        self.stats.clear()

    # Deep-dive hooks: wrap a region with an XLA trace for tensorboard.
    def start_trace(self, logdir: str) -> None:  # pragma: no cover
        jax.profiler.start_trace(logdir)

    def stop_trace(self) -> None:  # pragma: no cover
        jax.profiler.stop_trace()


profiler = StageProfiler()
timeit = profiler.timeit
printit = profiler.printit
