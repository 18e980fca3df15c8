"""Hierarchy statistics: grid / operator / cycle / storage complexities
(counterpart of python/ex_pcair_complexities.py; reference:
src/AIR_MG_Stats.F90): the quantities the reference prints under
-pc_air_print_stats_timings and asserts in CI (grid complexity < 3.0,
python/run_parse_tests.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pflare_tpu as pf


def main():
    for label, opts in {
        "defaults": pf.AIROptions(),
        "lump + drop": pf.AIROptions(a_lump=True, a_drop=1e-4),
        "matrix-free smoothing": pf.AIROptions(matrix_free_polys=True),
    }.items():
        pc = pf.PCAIR(opts, jit=False)
        pc.setup(pf.adv_diff_2d(64))
        s = pc.stats()
        print(f"{label}: levels={s['levels']} "
              f"grid={s['grid_complexity']:.2f} "
              f"op={s['operator_complexity']:.2f} "
              f"cycle={s['cycle_complexity']:.2f} "
              f"storage={s['storage_complexity']:.2f}")

    # the reference's CI assertion runs on small 8x8 advection cases
    # (reference: python/run_parse_tests.py:47,128-133)
    pc8 = pf.PCAIR(pf.AIROptions(), jit=False)
    pc8.setup(pf.adv_diff_2d(8))
    gc = pc8.stats()["grid_complexity"]
    print(f"\n8x8 CI case: grid complexity {gc:.3f} (< 3.0 asserted)")
    assert gc < 3.0

    # the full view() output (the -pc_air_print_stats_timings analogue)
    print()
    pc.view()


if __name__ == "__main__":
    main()
