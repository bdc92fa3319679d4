"""The stale-scratch sweep runs ONCE per process, not per query build
(round-5 verdict nit #2: an os.walk of every sibling scratch dir on every
fresh_scratch call is I/O in the query path)."""

from __future__ import annotations

import os
import time

from marasa_spark.queries import _util
from marasa_spark.queries._util import fresh_scratch, sweep_stale_scratch


def _make_dir(name: str, age_s: float) -> str:
    d = f"{_util.SCRATCH}/{name}"
    os.makedirs(d, exist_ok=True)
    f = f"{d}/data"
    with open(f, "w") as fh:
        fh.write("x")
    old = time.time() - age_s
    os.utime(f, (old, old))
    os.utime(d, (old, old))
    return d


def test_sweep_removes_stale_keeps_live_and_own():
    stale = _make_dir("sweeptest_sf0.001_p1", 3 * 3600)  # dead pid, >2h
    live = _make_dir("sweeptest_sf0.001_p2", 60)  # dead pid but recent
    own = _make_dir(f"sweeptest_sf0.001_p{os.getpid()}", 3 * 3600)  # our pid
    try:
        removed = sweep_stale_scratch(force=True)
        assert removed >= 1
        assert not os.path.isdir(stale), "stale dead-pid dir must be swept"
        assert os.path.isdir(live), "recently-touched dir must survive"
        assert os.path.isdir(own), "current-pid dirs are never swept"
    finally:
        for d in (stale, live, own):
            import shutil

            shutil.rmtree(d, ignore_errors=True)


def test_sweep_is_once_per_process():
    # after the forced run above (or any earlier fresh_scratch), the
    # non-forced path is a no-op flag check — no os.walk per query build
    sweep_stale_scratch(force=True)
    stale = _make_dir("sweeponce_sf0.001_p1", 3 * 3600)
    try:
        assert sweep_stale_scratch() == 0, "second sweep must short-circuit"
        assert os.path.isdir(stale), "short-circuited sweep must not touch disk"
        d = fresh_scratch("sweeponce2", "/root/testdata/sf0.001")
        assert not os.path.isdir(d)
        assert os.path.isdir(stale), "fresh_scratch must not re-sweep"
    finally:
        import shutil

        shutil.rmtree(stale, ignore_errors=True)
