"""Host-RAM LRU stash for recurrent layer states.

Feature reference: /root/reference/exllamav3/cache/recurrent.py
(RecurrentCache:21 — stashed recurrent checkpoints in system RAM, default
4 GB budget, keyed by handle; stash/unstash/prune). Lets a paused/requeued
job on a recurrent-state model resume from its exact position without
re-running the prompt, and backs periodic mid-generation checkpoints.
"""
from __future__ import annotations

import itertools
from collections import OrderedDict

import numpy as np
import jax.numpy as jnp

_handles = itertools.count(1)


class RecurrentStateCache:
    def __init__(self, max_bytes: int = 4 << 30):
        self.max_bytes = max_bytes
        self.used_bytes = 0
        self.store: OrderedDict[int, dict] = OrderedDict()

    @staticmethod
    def _nbytes(entry: dict) -> int:
        return sum(a.nbytes for layer in entry["layers"].values()
                   for a in layer.values())

    def stash(self, cache_state: dict, recurrent_keys: list, slot: int,
              position: int) -> int:
        """Snapshot slot `slot` of every recurrent layer; returns a handle."""
        layers = {}
        for k in recurrent_keys:
            # pg_* arrays are page-indexed pools (DSV4), not per-slot state;
            # their pages stay allocated to the queued job
            layers[k] = {name: np.asarray(arr[slot])
                         for name, arr in cache_state[k].items()
                         if not name.startswith("pg_")}
        entry = {"layers": layers, "position": position}
        nb = self._nbytes(entry)
        while self.used_bytes + nb > self.max_bytes and self.store:
            _, old = self.store.popitem(last=False)
            self.used_bytes -= self._nbytes(old)
        h = next(_handles)
        self.store[h] = entry
        self.used_bytes += nb
        return h

    def unstash(self, handle: int, cache_state: dict, slot: int,
                pop: bool = True) -> int | None:
        """Restore a stashed state into slot `slot`; returns its position."""
        entry = self.store.get(handle)
        if entry is None:
            return None
        for k, layer in entry["layers"].items():
            dst = cache_state[k]
            for name, rows in layer.items():
                dst[name] = dst[name].at[slot].set(jnp.asarray(rows))
        if pop:
            self.drop(handle)
        else:
            self.store.move_to_end(handle)
        return entry["position"]

    def drop(self, handle: int) -> None:
        entry = self.store.pop(handle, None)
        if entry is not None:
            self.used_bytes -= self._nbytes(entry)

    def prune(self, keep_bytes: int | None = None) -> None:
        limit = self.max_bytes if keep_bytes is None else keep_bytes
        while self.used_bytes > limit and self.store:
            _, old = self.store.popitem(last=False)
            self.used_bytes -= self._nbytes(old)
