"""Parse pflare_tpu stats/timer output into a structured dict.

Counterpart to the reference's output parser (reference:
tools/parse_pflare_output.py): drivers print per-level coarsening info,
complexities and cumulative timers under ``print_stats_timings``; this tool
turns a captured log into {levels, complexities, timings, iterations} for
CI assertions (reference: python/run_parse_tests.py asserts
grid complexity < 3.0 etc.).
"""

from __future__ import annotations

import re
import sys


COMPLEXITY_KEYS = {
    "Grid complexity": "grid",
    "Operator complexity": "operator",
    "Cycle complexity": "cycle",
    "Storage complexity": "storage",
    "Reuse storage complexity": "reuse_storage",
}


def parse_output(text: str) -> dict:
    out = {
        "levels": [],
        "complexities": {},
        "timings": {},
        "n_levels": None,
        "iterations": None,
    }
    for line in text.splitlines():
        line = line.strip()
        m = re.match(r"Number of levels:\s+(\d+)", line)
        if m:
            out["n_levels"] = int(m.group(1))
            continue
        for label, key in COMPLEXITY_KEYS.items():
            m = re.match(rf"{label}:\s+([0-9.eE+-]+)", line)
            if m:
                out["complexities"][key] = float(m.group(1))
                break
        m = re.match(r"(.+?) time :\s+([0-9.eE+-]+)", line)
        if m:
            out["timings"][m.group(1).strip()] = float(m.group(2))
            continue
        m = re.match(r"Global rows\s+(\d+)\s+Global F-points\s+(\d+)\s+"
                     r"Global C-points\s+(\d+)", line)
        if m:
            out["levels"].append({
                "rows": int(m.group(1)),
                "fine": int(m.group(2)),
                "coarse": int(m.group(3)),
            })
            continue
        m = re.search(r"iterations[:=]?\s+(\d+)", line)
        if m and out["iterations"] is None:
            out["iterations"] = int(m.group(1))
    return out


if __name__ == "__main__":
    import json

    text = sys.stdin.read() if len(sys.argv) < 2 else open(sys.argv[1]).read()
    print(json.dumps(parse_output(text), indent=2))
