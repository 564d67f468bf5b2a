"""Terminal cache-occupancy visualizer.

Feature reference: /root/reference/exllamav3/generator/visualizer.py
(CacheVisualizer:221 — pygame window showing page states). Here: an ANSI
terminal grid; each cell is one page, colored by state (free / referenced /
cached-reusable), refreshed in place. Call update() per iteration.
"""
from __future__ import annotations

import sys


class CacheVisualizer:
    FREE, CACHED, ACTIVE = "·", "▒", "█"

    def __init__(self, generator, cols: int = 64, stream=None):
        self.generator = generator
        self.cols = cols
        self.stream = stream or sys.stderr
        self._lines = 0

    def render(self) -> str:
        pt = self.generator.pagetable
        cells = []
        for p in pt.pages:
            if p.ref_count > 0:
                cells.append(self.ACTIVE)
            elif p.page_hash is not None:
                cells.append(self.CACHED)
            else:
                cells.append(self.FREE)
        rows = ["".join(cells[i : i + self.cols])
                for i in range(0, len(cells), self.cols)]
        free = pt.num_free_pages()
        hdr = (f"pages: {pt.num_pages}  free: {free}  "
               f"active jobs: {len(self.generator.active)}  "
               f"cached served: {pt.cached_pages_served}")
        return hdr + "\n" + "\n".join(rows)

    def update(self) -> None:
        out = self.render()
        if self._lines:
            self.stream.write(f"\x1b[{self._lines}F\x1b[J")
        self.stream.write(out + "\n")
        self.stream.flush()
        self._lines = out.count("\n") + 1
