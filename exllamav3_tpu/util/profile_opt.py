"""Opt-in lightweight profiler (feature reference:
/root/reference/exllamav3/util/profile_opt.py — no-op unless enabled).

Set EXL3TPU_PROFILE=1 to record wall time per decorated function; dump with
print_profile() or atexit.
"""
from __future__ import annotations

import atexit
import functools
import os
import time
from collections import defaultdict

_ENABLED = bool(os.environ.get("EXL3TPU_PROFILE"))
_times: dict = defaultdict(float)
_calls: dict = defaultdict(int)


def profile_opt(name: str | None = None):
    def deco(fn):
        if not _ENABLED:
            return fn
        label = name or f"{fn.__module__}.{fn.__qualname__}"

        @functools.wraps(fn)
        def wrapped(*a, **kw):
            t0 = time.perf_counter()
            try:
                return fn(*a, **kw)
            finally:
                _times[label] += time.perf_counter() - t0
                _calls[label] += 1

        return wrapped

    return deco


def print_profile() -> None:
    if not _times:
        return
    width = max(len(k) for k in _times)
    for k in sorted(_times, key=_times.get, reverse=True):
        print(f"{k:<{width}}  {_times[k]:10.4f}s  {_calls[k]:8d} calls")


if _ENABLED:
    atexit.register(print_profile)
