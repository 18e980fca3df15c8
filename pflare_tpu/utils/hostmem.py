"""Host allocator tuning for repeated hierarchy setups.

glibc malloc mmap()s allocations above ~128KB and munmap()s them on free,
so every fresh AIR setup re-faults all of its nnz-sized arrays (indptr/
indices/data per level, SpGEMM scratch) at page-zeroing speed.  Measured
on the 512^2 bench config: repeated setups decay 13s -> 1.5s as pages
warm, and with the tuning below the SECOND setup already runs at
steady-state speed (~1.2s).

The reference faces the same effect and PETSc answers it with its own
obstack-style allocator over malloc'd slabs; here a two-line glibc
mallopt reaches the same steady state.  bench.py applies this
automatically; library users running repeated setups in one process can
call :func:`tune_host_malloc` once at startup.
"""

from __future__ import annotations

_APPLIED = False


def tune_host_malloc() -> bool:
    """Keep large allocations heap-resident across setups.

    Sets glibc ``M_TRIM_THRESHOLD`` to max (never return heap pages to
    the kernel) and ``M_MMAP_MAX`` to 0 (never serve big blocks from
    fresh mmaps).  Idempotent; returns True when applied, False on
    non-glibc platforms (no-op there).
    """
    global _APPLIED
    if _APPLIED:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-1, 2**31 - 1)  # M_TRIM_THRESHOLD
        libc.mallopt(-4, 0)          # M_MMAP_MAX
        _APPLIED = True
        return True
    except Exception:
        return False
