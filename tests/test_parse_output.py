"""print_stats/print_timers -> tools/parse_output.py round trip.

Mirrors the reference's CI parser assertions (reference:
python/run_parse_tests.py:1-13, docs/dev/ci.md:21-23): run a small case
with stats+timers printing enabled, parse the captured output, and assert
the structured values (grid complexity < 3.0, timers present, level count
matches the PC).
"""

import io
import os
import sys
from contextlib import redirect_stdout

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from parse_output import parse_output  # noqa: E402

from pflare_tpu import AIROptions, PCAIR, adv_diff_2d  # noqa: E402


def _captured_run():
    from pflare_tpu.utils.timers import reset_timers

    reset_timers()   # the timers are global and cumulative by design
    A = adv_diff_2d(30)
    pc = PCAIR(AIROptions(print_stats_timings=True, a_lump=True,
                          a_drop=1e-5, strong_threshold=0.99))
    buf = io.StringIO()
    with redirect_stdout(buf):
        pc.setup(A)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
    res = pc.solve(b, rtol=1e-5, max_it=10)
    text = buf.getvalue() + f"\niterations: {res.iterations}\n"
    return pc, res, text


def test_parser_round_trip():
    pc, res, text = _captured_run()
    parsed = parse_output(text)
    assert parsed["n_levels"] == pc.n_levels
    # the reference CI bound (reference: python/run_parse_tests.py:7)
    assert 1.0 < parsed["complexities"]["grid"] < 3.0
    assert parsed["complexities"]["operator"] >= 1.0
    assert parsed["complexities"]["cycle"] > 0
    assert parsed["complexities"]["storage"] > 0
    # no reuse configured => reuse storage complexity 0
    assert parsed["complexities"]["reuse_storage"] == 0.0
    assert parsed["iterations"] == res.iterations
    assert parsed["iterations"] <= 10
    # every printed timer parses; total setup dominates its phases
    assert "Total setup" in parsed["timings"]
    assert parsed["timings"]["Total setup"] > 0
    phase_sum = sum(v for k, v in parsed["timings"].items()
                    if k != "Total setup")
    assert phase_sum <= parsed["timings"]["Total setup"] * 1.001


def test_parser_matches_stats_getters():
    pc, _, text = _captured_run()
    parsed = parse_output(text)
    s = pc.stats()
    assert abs(parsed["complexities"]["grid"]
               - s["grid_complexity"]) < 1e-5
    assert abs(parsed["complexities"]["operator"]
               - s["operator_complexity"]) < 1e-5
