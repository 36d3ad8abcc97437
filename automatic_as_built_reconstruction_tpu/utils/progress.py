"""Progress bar + scoped timers.

[ref: second/utils/progress_bar.py + the --measure_time timer wrappers in
second/pytorch/train.py — lineage-expected, UNVERIFIED]
"""
from __future__ import annotations

import contextlib
import shutil
import sys
import time
from typing import Dict, Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")


def progress_bar(iterable: Iterable[T], total: Optional[int] = None,
                 desc: str = "", width: Optional[int] = None,
                 file=None) -> Iterator[T]:
    """Wrap an iterable with a single-line text progress bar."""
    file = file or sys.stderr
    if total is None:
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
    width = width or max(
        10, min(40, shutil.get_terminal_size((80, 20)).columns - 40))
    start = time.perf_counter()
    for i, item in enumerate(iterable):
        yield item
        done = i + 1
        elapsed = time.perf_counter() - start
        rate = done / max(elapsed, 1e-9)
        if total:
            filled = int(width * done / total)
            bar = "#" * filled + "-" * (width - filled)
            eta = (total - done) / max(rate, 1e-9)
            msg = (f"\r{desc}[{bar}] {done}/{total} "
                   f"{rate:.1f} it/s eta {eta:.0f}s")
        else:
            msg = f"\r{desc}{done} it, {rate:.1f} it/s"
        file.write(msg)
        file.flush()
    file.write("\n")
    file.flush()


class StageTimers:
    """Named accumulating timers for per-stage ms reports.

    Mirrors the reference's ``--measure_time`` per-stage accounting.
    NOTE: on-device work must be synchronized before/after the ``with``
    block for meaningful numbers (see docs/DESIGN.md §9 for why naive
    device timing lies on this relay).
    """

    def __init__(self):
        self._totals: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._totals[name] = self._totals.get(name, 0.0) + dt
            self._counts[name] = self._counts.get(name, 0) + 1

    def means_ms(self) -> Dict[str, float]:
        return {k: self._totals[k] / max(self._counts[k], 1) * 1000
                for k in self._totals}

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.1f} ms"
                          for k, v in sorted(self.means_ms().items()))

    def clear(self):
        self._totals.clear()
        self._counts.clear()
