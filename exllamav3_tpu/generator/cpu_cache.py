"""Host-RAM second-tier page cache.

Feature reference: /root/reference/exllamav3/generator/cpu_cache.py
(CPUPageCache — evicted complete pages stored in pinned system RAM and
restored on prefix hit instead of recomputing the prefill). TPU version:
page KV slices are device_get into numpy buffers keyed by content hash;
restoring a page is one .at[page].set per layer tensor (a single H2D put
fused into the next step's donation chain).
"""
from __future__ import annotations

from collections import OrderedDict

import numpy as np
import jax.numpy as jnp


class CPUPageCache:
    def __init__(self, max_bytes: int = 1 << 30):
        self.max_bytes = max_bytes
        self.used_bytes = 0
        self.store: OrderedDict[bytes, dict] = OrderedDict()  # hash -> layer slices
        self.hits = 0
        self.misses = 0

    def _entry_bytes(self, entry: dict) -> int:
        return sum(a.nbytes for layer in entry.values() for a in layer.values())

    def put(self, page_hash: bytes, cache_state: dict, page_idx: int) -> None:
        """Snapshot one page's rows from every paged layer tensor."""
        if page_hash in self.store:
            self.store.move_to_end(page_hash)
            return
        entry = {}
        for key, layer in cache_state.items():
            lk = {}
            for name, arr in layer.items():
                if arr.ndim >= 2 and arr.shape[0] > page_idx and name[0] in "kv":
                    lk[name] = np.asarray(arr[page_idx])
            if lk:
                entry[key] = lk
        nb = self._entry_bytes(entry)
        while self.used_bytes + nb > self.max_bytes and self.store:
            _, old = self.store.popitem(last=False)
            self.used_bytes -= self._entry_bytes(old)
        if nb <= self.max_bytes:
            self.store[page_hash] = entry
            self.used_bytes += nb

    def restore(self, page_hash: bytes, cache_state: dict, page_idx: int) -> bool:
        """Write a stored page back into device cache at page_idx."""
        entry = self.store.get(page_hash)
        if entry is None:
            self.misses += 1
            return False
        for key, layer in entry.items():
            dst = cache_state.get(key)
            if dst is None:
                return False
            for name, rows in layer.items():
                dst[name] = dst[name].at[page_idx].set(jnp.asarray(rows))
        self.hits += 1
        self.store.move_to_end(page_hash)
        return True

    def has(self, page_hash: bytes) -> bool:
        return page_hash in self.store
