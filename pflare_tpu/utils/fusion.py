"""XLA:CPU fusion-recompute post-mortem (and why no flag is set).

**The pathology.**  XLA:CPU's loop-fusion emitter evaluates a fusion's
expression tree per OUTPUT element.  When several gather-SpMVs chain
inside one fusion -- a matrix-free Horner polynomial applier, an F-smooth
residual chain -- every upstream matvec is recomputed for each consumed
element: O(n * K^depth) instead of O(depth * n * K).  Measured on the
reference streaming matrix (2,364 rows, 10-level all-matrix-free AIR
cycle): 60 s per jitted V-cycle vs 50 ms eager, and an 8-deep ELL matvec
chain at 3,000 rows runs 920x faster with fusion off.  Only
gather-based chains blow up; DIA slice chains recompute cheap slices and
stay fast, which is why the production (assembled/DIA) configurations
never see this.

**Dead ends, recorded so they are not retried.**
- ``jax.lax.optimization_barrier``: present in the lowered stablehlo but
  STRIPPED by XLA:CPU during optimisation -- the chain fuses anyway.
- ``XLA_FLAGS=--xla_disable_hlo_passes=fusion``: fixes the blowup (the
  920x above) but makes this jaxlib SEGFAULT while compiling/serialising
  unrelated programs (reproduced deterministically in the device-setup
  test suite; crash inside ``put_executable_and_time``).  Do not ship.

**The working mitigation** lives in ``PCAIR._build_apply``: on the CPU
backend, hierarchies whose smoothers are matrix-free fall back to EAGER
application (per-op dispatch never forms the pathological fusion; 50 ms
vs 60 s).  TPU execution is unaffected in all cases.

``disable_cpu_fusion_blowup`` remains for experiments on jaxlibs where
the flag is safe; nothing in the library calls it.
"""

from __future__ import annotations

import os

_FLAG = "--xla_disable_hlo_passes=fusion"


def disable_cpu_fusion_blowup() -> bool:
    """Append the fusion-pass-disable flag to XLA_FLAGS (idempotent).

    WARNING: known to segfault jaxlib 0.8-era CPU compilation on some
    programs (see module docstring).  Must run before jax initialises
    its backends to take effect.  Returns True if the flag is present.
    """
    cur = os.environ.get("XLA_FLAGS", "")
    if _FLAG in cur:
        return True
    os.environ["XLA_FLAGS"] = (cur + " " + _FLAG).strip()
    return True
