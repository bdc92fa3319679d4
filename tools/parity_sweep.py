"""Multi-SF parity sweep (round-5 verdict #4): run the full driver-protocol
mirror (tools/driver_sim.py) at EVERY available scale factor and pin the
result as PARITY_SWEEP.json.

Why: the driver hash-checks at sf0.01 only, and sf0.01-only parity can
hide scale-dependent tie/float bugs — empty groups at sf0.001, new
ordering ties at sf0.1. Each SF runs in a FRESH subprocess (its own
vanilla SparkSession, its own DuckDB views), exactly the seam the real
driver exercises.

Usage: python tools/parity_sweep.py [sf_dir ...]   (default: all three)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def run_one(sf_dir: str) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "driver_sim.py")],
        env={**os.environ, "MARASA_SIM_SF_DIR": sf_dir},
        capture_output=True,
        text=True,
        timeout=3600,
    )
    out = proc.stdout
    m = re.search(r"(\d+)/(\d+) queries pass; fails=\[(.*?)\]", out)
    passed, total = (int(m.group(1)), int(m.group(2))) if m else (0, 0)
    fails = [f.strip().strip("'\"") for f in m.group(3).split(",") if f.strip()] if m else []
    mism = [ln for ln in out.splitlines() if ln.startswith(("MISMATCH", "ERROR"))]
    return {
        "sf_dir": sf_dir,
        "exit": proc.returncode,
        "passed": passed,
        "total": total,
        "fails": fails,
        "detail": mism[:40],
        "wall_s": round(time.time() - t0, 1),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--allow-dirty"]
    allow_dirty = "--allow-dirty" in sys.argv[1:]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _gitstate import refuse_if_dirty

    git = refuse_if_dirty(REPO, allow_dirty)
    sfs = args or DEFAULT_SFS
    results = {}
    for sf in sfs:
        print(f"== sweeping {sf} ==", file=sys.stderr, flush=True)
        results[os.path.basename(sf.rstrip("/"))] = run_one(sf)
    ok = all(r["exit"] == 0 and r["passed"] == r["total"] > 0 for r in results.values())
    out = {
        "green": ok,
        "label": time.strftime("%Y-%m-%d %H:%M"),
        "sha": git["sha"],
        "dirty": git["dirty"],
        "sweeps": results,
    }
    path = os.path.join(REPO, "PARITY_SWEEP.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: (v["passed"], v["total"], v["fails"][:5]) for k, v in results.items()}))
    print(f"wrote {path}; green={ok}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
