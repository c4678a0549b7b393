"""Serving-mode allocator tuning for the local tier's numpy kernels.

The phrase/topk kernels allocate tens-of-MB temporary arrays (packed keys,
segment gathers, varbyte decode intermediates) per query. glibc malloc
serves allocations above M_MMAP_THRESHOLD (128 KB default) with mmap and
returns them to the kernel on free, so EVERY fresh query re-faults and
re-zeroes its temp pages — measured at 2-3× the steady-state kernel time on
the first touch of each new phrase (0.6 s vs 0.22 s at 1.28 M docs).

``enable_heap_pooling`` raises M_MMAP_THRESHOLD and M_TRIM_THRESHOLD so
large temps live on the heap and freed blocks stay in the process pool for
reuse. The pool's high-water mark is bounded by the serving working set
(one query's temps + the byte-budgeted LRUs), which the LocalExecutor
budgets already cap. Called from SearchEngine.warm() — an explicit opt-in
to serving mode — never at import.

No-op (returns False) off glibc/Linux or if mallopt is unavailable.
"""

from __future__ import annotations

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_POOL_BYTES = 1 << 28  # 256 MB: covers kernel temps; giant allocs still mmap

_enabled = False


def enable_heap_pooling(pool_bytes: int = _POOL_BYTES) -> bool:
    """Idempotent; True if mallopt succeeded (glibc present)."""
    global _enabled
    if _enabled:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok_trim = libc.mallopt(_M_TRIM_THRESHOLD, int(pool_bytes))
        ok_mmap = libc.mallopt(_M_MMAP_THRESHOLD, int(pool_bytes))
        _enabled = bool(ok_trim and ok_mmap)
    except Exception:
        _enabled = False
    return _enabled
