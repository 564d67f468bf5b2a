"""Terminal progress bar (feature reference: /root/reference/exllamav3/util/
progress.py — rich bars there; a dependency-free ANSI bar here)."""
from __future__ import annotations

import sys
import time


class ProgressBar:
    def __init__(self, text: str, total: int, width: int = 40,
                 transparent: bool = False):
        self.text = text
        self.total = max(total, 1)
        self.width = width
        self.transparent = transparent or not sys.stderr.isatty()
        self.t0 = time.time()
        self._last = -1

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.update(self.total)
        if not self.transparent:
            sys.stderr.write("\n")
            sys.stderr.flush()

    def update(self, n: int):
        if self.transparent:
            return
        pct = int(n * 100 / self.total)
        if pct == self._last:
            return
        self._last = pct
        filled = int(self.width * n / self.total)
        bar = "█" * filled + "░" * (self.width - filled)
        dt = time.time() - self.t0
        rate = n / dt if dt > 0 else 0.0
        sys.stderr.write(f"\r{self.text:<24} {bar} {pct:3d}% "
                         f"({n}/{self.total}, {rate:.1f}/s)")
        sys.stderr.flush()
