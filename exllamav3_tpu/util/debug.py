"""Category-gated debug logging.

Feature reference: /root/reference/exllamav3/util/debug.py:11-33
(EXLLAMA_DEBUGLOG_<CAT> env gates, timestamped lines). TPU port uses
EXL3TPU_DEBUGLOG_<CAT>; EXL3TPU_DEBUGLOG=1 enables every category.
"""
from __future__ import annotations

import os
import sys
import time

_t0 = time.time()
_enabled_cache: dict = {}


def log_enabled(category: str) -> bool:
    if category not in _enabled_cache:
        _enabled_cache[category] = bool(
            os.environ.get(f"EXL3TPU_DEBUGLOG_{category.upper()}")
            or os.environ.get("EXL3TPU_DEBUGLOG"))
    return _enabled_cache[category]


def log(category: str, *args) -> None:
    if not log_enabled(category):
        return
    ts = time.time() - _t0
    print(f"[{ts:10.4f}] [{category:>10}]", *args, file=sys.stderr, flush=True)
