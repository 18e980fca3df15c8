"""Cumulative named wall-clock timers.

Reference: src/Timers.F90 -- global cumulative timers keyed by phase,
printed under print_stats_timings and parsed by tools/parse output parsing.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

_TIMERS: dict[str, float] = {}
_COUNTS: dict[str, int] = {}

# Labels match the reference's printed timer names so output parsers carry
# over (reference: src/Timers.F90:31-70, tools/parse_pflare_output.py:62-75)
LABELS = {
    "air_setup": "Total setup time",
    "air_coarsen": "CF splitting time",
    "air_extract": "Submatrix extraction time",
    "air_inverse": "Approximate inverse time",
    "air_prolong": "Prolongator time",
    "air_restrict": "Restrictor time",
    "air_rap": "RAP time",
    "air_drop": "Drop tolerance time",
    "air_identity": "Identity/IS time",
    "air_constrain": "Constraint time",
    "air_repartition": "Repartition time",
}


@contextmanager
def timer(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _TIMERS[name] = _TIMERS.get(name, 0.0) + dt
        _COUNTS[name] = _COUNTS.get(name, 0) + 1


def timer_time(name: str) -> float:
    return _TIMERS.get(name, 0.0)


def reset_timers():
    _TIMERS.clear()
    _COUNTS.clear()


def get_timers() -> dict:
    return dict(_TIMERS)


def print_timers():
    for name, label in LABELS.items():
        if name in _TIMERS:
            print(f" {label} : {_TIMERS[name]:.6f}")


def device_sync_read(x) -> float:
    """The ONE honest timing barrier: a VALUE read-back of a scalar
    reduction of ``x``.  On remote-attached TPU backends
    ``block_until_ready`` returns before execution completes (measured in
    docs/tpu.md), so every published ms figure goes through this helper
    -- dispatch-to-value-read -- instead.  Returns the f32 sum so callers
    can also sanity-check for NaN."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    leaves = [x] if hasattr(x, "dtype") else [
        v for v in jax.tree_util.tree_leaves(x) if hasattr(v, "dtype")]
    acc = None
    for v in leaves:
        s = jnp.sum(v.astype(jnp.float32))
        acc = s if acc is None else acc + s
    return float(np.asarray(acc))
