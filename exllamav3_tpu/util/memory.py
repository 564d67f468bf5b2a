"""Memory introspection helpers.

Feature reference: /root/reference/exllamav3/util/memory.py (device/host
memory accounting, malloc_trim on idle). JAX exposes per-device stats via
device.memory_stats(); host RSS comes from /proc. malloc_trim is called via
ctypes where glibc provides it (the reference does the same through its
extension).
"""
from __future__ import annotations

import ctypes
import ctypes.util
import os


def device_memory_stats(device=None) -> dict:
    import jax

    dev = device or jax.devices()[0]
    stats = {}
    try:
        stats = dict(dev.memory_stats() or {})
    except Exception:
        pass
    return stats


def host_rss_bytes() -> int:
    try:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
    except Exception:
        return 0


def malloc_trim() -> bool:
    """Return freed heap pages to the OS (reference util/memory.py:67)."""
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c"))
        return bool(libc.malloc_trim(0))
    except Exception:
        return False


def free_mem_report() -> str:
    ds = device_memory_stats()
    used = ds.get("bytes_in_use", 0)
    limit = ds.get("bytes_limit", 0)
    return (f"device: {used / 2**30:.2f} / {limit / 2**30:.2f} GiB in use; "
            f"host rss: {host_rss_bytes() / 2**30:.2f} GiB")
