"""Paged KV bookkeeping: content-hash prefix reuse, ref counting, eviction.

Feature reference: /root/reference/exllamav3/generator/pagetable.py
(CachePage:22 blake2b hash chaining, PageTable:299, allocation with cache-hit
revival :528, eviction by access serial :386). Host-side numpy/python — the
device only sees block tables (int32 arrays).

Page index 0 is reserved as the padding/scratch target for inactive batch
rows, so jitted steps can always write through a valid index.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np

from ..constants import PAGE_SIZE


def _page_hash(prev_hash: bytes | None, ids: np.ndarray) -> bytes:
    h = hashlib.blake2b(digest_size=16)
    h.update(prev_hash or b"\x00" * 16)
    h.update(np.ascontiguousarray(ids, dtype=np.int64).tobytes())
    return h.digest()


@dataclass
class CachePage:
    index: int
    ref_count: int = 0
    page_hash: bytes | None = None  # set when the page is complete
    prev_hash: bytes | None = None
    access_serial: int = 0
    kv_position: int = 0  # filled tokens in this page


class PageTable:
    def __init__(self, num_pages: int, disable_reuse: bool = False):
        assert num_pages >= 2
        self.num_pages = num_pages
        self.page_size = PAGE_SIZE
        # recurrent-state models can't skip prefill tokens: cached-page reuse
        # off (the reference reaches the same end via position-keyed
        # recurrent-state checkpoints, cache/recurrent.py)
        self.disable_reuse = disable_reuse
        # CPU second-tier hooks (generator/cpu_cache.py):
        # evict_cb(page_hash, page_idx) fires before a hashed page is evicted;
        # restore_cb(page_hash, page_idx) -> bool refills a fresh page from
        # the CPU tier so its tokens count as reused.
        self.evict_cb = None
        self.restore_cb = None
        # page 0 reserved for padding writes
        self.pages = [CachePage(index=i) for i in range(num_pages)]
        self.pages[0].ref_count = 1
        self.hash_index: dict[bytes, int] = {}
        self.access_serial = 0
        # metrics
        self.cached_pages_served = 0
        self.cached_tokens_served = 0

    # -- stats ------------------------------------------------------------

    def num_free_pages(self) -> int:
        return sum(1 for p in self.pages[1:] if p.ref_count == 0)

    def max_batch_fit(self, new_tokens_per_job: int = 1) -> int:
        return self.num_free_pages()

    # -- allocation ----------------------------------------------------------

    def _touch(self, page: CachePage):
        self.access_serial += 1
        page.access_serial = self.access_serial

    def _evict_one(self) -> CachePage | None:
        """Free the least-recently-used unreferenced page."""
        cand = None
        for p in self.pages[1:]:
            if p.ref_count == 0:
                if cand is None or p.access_serial < cand.access_serial:
                    cand = p
        if cand is None:
            return None
        if cand.page_hash is not None and self.hash_index.get(cand.page_hash) == cand.index:
            if self.evict_cb is not None:
                self.evict_cb(cand.page_hash, cand.index)
            del self.hash_index[cand.page_hash]
        cand.page_hash = None
        cand.prev_hash = None
        cand.kv_position = 0
        return cand

    def allocate_sequence(self, ids: np.ndarray) -> tuple[list[int], int] | None:
        """Allocate pages for a token sequence (prompt). Reuses complete
        cached pages by hash-chain prefix match.

        Returns (page_indices, reused_tokens) or None if out of pages.
        reused_tokens counts positions whose KV is already cached (the
        prefill can skip them).
        """
        n = len(ids)
        num_pages = (n + self.page_size - 1) // self.page_size
        allocated: list[int] = []
        reused_tokens = 0
        prev_hash: bytes | None = None
        matching = not self.disable_reuse
        for pi in range(num_pages):
            a, b = pi * self.page_size, min((pi + 1) * self.page_size, n)
            complete = (b - a) == self.page_size
            page_hash = _page_hash(prev_hash, ids[a:b]) if complete else None
            hit = None
            if matching and page_hash is not None:
                idx = self.hash_index.get(page_hash)
                if idx is not None:
                    hit = self.pages[idx]
            if hit is not None:
                hit.ref_count += 1
                self._touch(hit)
                allocated.append(hit.index)
                reused_tokens += self.page_size
                self.cached_pages_served += 1
                self.cached_tokens_served += self.page_size
            else:
                page = self._evict_one()
                if page is None:
                    for i in allocated:  # roll back
                        self.pages[i].ref_count -= 1
                    return None
                page.ref_count = 1
                page.prev_hash = prev_hash
                # hash registered only once prefill fills the page
                # (finalize_page) — a concurrent job must not match it early
                page.page_hash = None
                page.kv_position = 0
                self._touch(page)
                allocated.append(page.index)
                # CPU second tier: refill the fresh page from host RAM
                if (matching and page_hash is not None
                        and self.restore_cb is not None
                        and self.restore_cb(page_hash, page.index)):
                    page.page_hash = page_hash
                    self.hash_index[page_hash] = page.index
                    reused_tokens += self.page_size
                    self.cached_pages_served += 1
                    self.cached_tokens_served += self.page_size
                else:
                    matching = False
            prev_hash = page_hash
        return allocated, reused_tokens

    def extend_sequence(self, current_pages: list[int]) -> int | None:
        """Allocate one more (unique, incomplete) page for decode growth."""
        page = self._evict_one()
        if page is None:
            return None
        page.ref_count = 1
        page.prev_hash = None
        page.page_hash = None
        page.kv_position = 0
        self._touch(page)
        return page.index

    def finalize_page(self, page_idx: int, prev_hash: bytes | None, ids: np.ndarray):
        """Register a just-completed page for future prefix reuse."""
        page = self.pages[page_idx]
        if page.ref_count <= 0:
            return
        h = _page_hash(prev_hash, ids)
        page.prev_hash = prev_hash
        page.page_hash = h
        # latest writer wins the hash slot
        self.hash_index[h] = page_idx

    def release_sequence(self, page_indices: list[int]):
        for i in page_indices:
            p = self.pages[i]
            p.ref_count = max(0, p.ref_count - 1)
            self._touch(p)

    # -- defragmentation -------------------------------------------------------

    def plan_defrag(self) -> list[int] | None:
        """Permutation order (new_idx -> old_idx) compacting live/hashed
        pages to the front (reference pagetable.py defrag rotation :824).
        Returns None when already compact."""
        live = [p.index for p in self.pages[1:] if p.ref_count > 0 or p.page_hash]
        free = [p.index for p in self.pages[1:]
                if p.ref_count == 0 and not p.page_hash]
        order = [0] + live + free
        return None if order == list(range(self.num_pages)) else order

    def apply_defrag(self, order: list[int]) -> dict:
        """Reindex pages per `order`; returns {old_idx: new_idx} so callers
        can remap job page lists and permute device cache tensors."""
        remap = {old: new for new, old in enumerate(order)}
        new_pages = [None] * self.num_pages
        for new, old in enumerate(order):
            p = self.pages[old]
            p.index = new
            new_pages[new] = p
        self.pages = new_pages
        self.hash_index = {h: remap[i] for h, i in self.hash_index.items()}
        return remap
