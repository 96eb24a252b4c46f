"""s2ray: S2-geometry spatial engine on Ray Data.

Import-time allocator tuning: the vectorized batch stages allocate fresh
multi-MB numpy buffers every batch; with glibc's default M_MMAP_THRESHOLD
(128 KB) each of those is a private mmap that is returned to the OS on
free, so every batch pays first-touch page faults again (measured 5x
slow-down on fault-expensive hosts, and fault handling serializes across
workers).  Raising the threshold keeps large chunks on the heap for reuse.
Runs in every process that imports s2ray — driver and Ray workers alike.
"""

from __future__ import annotations


def _tune_malloc() -> None:
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD = -3
        M_TRIM_THRESHOLD = -1
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass  # non-glibc platform: defaults are fine


_tune_malloc()
