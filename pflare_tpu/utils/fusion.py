"""XLA:CPU fusion-recompute mitigation.

XLA:CPU's loop-fusion emitter evaluates a fusion's expression tree per
OUTPUT element, so when several gather-SpMVs chain inside one fusion (a
Horner polynomial applier, an F-smooth residual chain), every upstream
matvec is recomputed for each consumed element: O(n * K^depth) instead of
O(depth * n * K).  Measured on the reference streaming matrix (2,364
rows, 10-level all-matrix-free AIR cycle): 60 s per jitted V-cycle vs
50 ms eager -- a 1000x blowup.  `jax.lax.optimization_barrier` does NOT
help: XLA:CPU strips opt-barrier during optimization and fuses anyway.

The working mitigation is disabling the HLO "fusion" pass on the CPU
backend (measured 920x faster on an 8-deep matvec chain; elementwise
fusion loss costs only ~2x on pure elementwise code, irrelevant next to
the blowup).  XLA reads the flag from the environment at backend
initialisation, so it must be set BEFORE the first jax backend touch --
call :func:`disable_cpu_fusion_blowup` at process start (tests/conftest,
bench subprocesses, and the driver dry-run do this).

TPU is NOT affected: its fusion cost model does not duplicate expensive
producers this way, and no flag is set for TPU runs.
"""

from __future__ import annotations

import os

_FLAG = "--xla_disable_hlo_passes=fusion"


def disable_cpu_fusion_blowup() -> bool:
    """Append the fusion-pass-disable flag to XLA_FLAGS (idempotent).

    Returns True if the flag is (now) present.  Must run before jax
    initialises its backends to take effect.
    """
    cur = os.environ.get("XLA_FLAGS", "")
    if _FLAG in cur:
        return True
    os.environ["XLA_FLAGS"] = (cur + " " + _FLAG).strip()
    return True
