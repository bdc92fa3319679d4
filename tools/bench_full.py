"""Full-registry bench sweep (VERDICT r4 #1) — time EVERY registered op at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) with the bench.py
protocol (warmed session, per-op warm best-of-N wall-clock of collect()
on a once-built plan), write BENCHFULL.json, and flag any op whose
latency is >2x the max latency among its group's HEADLINE representatives.

Groups with no headline representative (A, B, L, M) fall back to 2x the
slowest single headline op overall — a deliberately loose bound whose only
job is to surface q_asof-r3-style order-of-magnitude outliers that the
21-query headline bench cannot see.

Build-time note: ops whose work happens at BUILD time (streaming drains to
a memory sink, log-store writes) report a near-zero collect() latency by
this protocol; `build_s` is recorded alongside so those are not invisible.

Usage: python tools/bench_full.py [--runs N] [--only PREFIX]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE, box_ratio, calibration_probe  # noqa: E402
from marasa_spark.registry import REGISTRY, queries_map  # noqa: E402
from marasa_spark.session import get_spark  # noqa: E402

# Ops allowed to exceed their group threshold, each with the reason the
# cost is inherent rather than a plan bug. Every entry must name the
# registered scale-path replacement (or the bounding) that makes the cost
# acceptable; anything slow WITHOUT a waiver is a finding.
WAIVERS: dict[str, str] = {
    "k5_dedup_near": "contract-mandated O(n²) exact-Jaccard reference, "
    "bounded to doc_id<1000; scale path is k9 MinHash-LSH",
    "k55_containment_dedup": "bounded (doc_id<1000) all-pairs containment "
    "reference (k5's posture); scale path is k60's lossless prefix-filter "
    "join",
    "l2_udf_pandas": "the L group's PURPOSE is the Python boundary: l2 is "
    "the Arrow-vectorized scalar UDF over 600k rows (the fast path l1 "
    "exists to contrast with); its cost is the Arrow round-trip, not a "
    "plan defect, and it rides the threshold boundary across sweeps",
    "k60_containment_prefix_join": "the containment SCALE path itself — "
    "df-rank + prefix join + candidate verification is ~10 stages of "
    "constant overhead at this bound, already cheaper than the k55 "
    "all-pairs reference it replaces (same doc_id<1000 bound, same "
    "oracle) and the asymptotic shape (no all-pairs) is the point",
    "k9_dedup_minhash_lsh": "the LSH scale path at FULL recall (hash-"
    "oracled vs unbounded all-pairs since r8): the corpus's densest "
    "near-dup family is ~3.2k docs at sf0.1, so the within-family "
    "candidate join and the ~1M-true-pair output are inherent to the "
    "data, not a plan defect; since r9 the join emits each pair once "
    "(first-kept-shared-band predicate — no dedup aggregate) and the "
    "band shuffle carries (doc, band, bucket) plus the bands-long "
    "bucket array; the collect protocol pays the 1M-row py4j bill",
    "k80_incremental_near_dup": "the measured window INCLUDES the one-time "
    "corpus index build (tokenize + 32-hash minhash + two parquet "
    "persists) that the op exists to amortize across daily batches — a "
    "nightly job at scale, not per-query cost; the probe itself is the "
    "banded equi-join + candidate verify (corpus never re-scanned, "
    "pinned by test_plan_audit)",
    "k10_dedup_simhash": "linear signature computation (64 weighted bit "
    "positions per doc via higher-order array exprs); no pair stage",
    "k11_embed_neardup": "all-pairs cosine verification reference, "
    "bounded to vec_id<1000; scale path is k21 random-hyperplane LSH",
    "k52_semdedup": "within-cluster pairwise cosine; cluster COUNT is "
    "SemDeDup's scale knob (32 fixed centroids here) so per-cluster pair "
    "work stays bounded while total pairs grow linearly in corpus size",
    "h5_fn_math": "pure scan+project plan; cost is py4j materialization "
    "of 600k wide rows under the collect protocol (q_string_date "
    "anatomy) — a writer at scale",
    "m6_gap_fill": "output IS the ~1M-row dense grid at sf0.1; cost is "
    "py4j row materialization under the collect protocol — a writer at "
    "scale",
    "k19_ngram_jaccard": "bounded (doc_id<200) all-pairs shingle-Jaccard "
    "verify stage; candidates come from k9 at scale",
    "k20_edit_distance": "bounded (doc_id<50) O(len²)-per-pair Levenshtein "
    "verify stage; never all-pairs at scale",
    "k21_embed_lsh_neardup": "LSH on an isotropic random-vector corpus "
    "collides maximally (r=2 bits/band keeps recall≥0.9 at θ=0.35); real "
    "embedding corpora cluster and bucket sparsely",
    "k22_ann_ivf_kmeans": "build cost is Lloyd's iterations (trained "
    "index); per-query probe cost is the sublinear 'sec' metric",
    "k50_minhash_jaccard_est": "estimator EVAL op: the exact-Jaccard "
    "comparison column (the thing being evaluated against) is the cost, "
    "bounded to doc_id<1000; the estimator itself is the cheap 64-slot "
    "signature compare",
}


def bench_op(spark, fn, sf_dir: str, runs: int) -> tuple[float, float]:
    """Return (build_s, best_of_N collect_s). Build = fn() + first collect
    (plan analysis, parquet footers, JIT, and any side-effect work)."""
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.collect()  # warm
    build_s = time.perf_counter() - t0
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = df.collect()
        times.append(time.perf_counter() - t0)
        del rows
    gc.collect()
    return build_s, min(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", default="", help="only op ids with this prefix")
    ap.add_argument(
        "--merge-from",
        default="",
        help="reuse timings from a prior (possibly killed) sweep: a file of "
        "its per-op stderr lines ('qid  X.XXXXs  (build Y.YYYs)'); only ops "
        "absent from it are re-measured",
    )
    ap.add_argument(
        "--allow-dirty",
        action="store_true",
        help="sweep a dirty tree anyway (artifact records dirty=true)",
    )
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _gitstate import refuse_if_dirty

    # --only / --merge-from runs are interim diagnostics, not the shipped
    # artifact (they don't overwrite BENCHFULL.json as the round record);
    # still record provenance, but only full clean sweeps refuse dirt.
    git = refuse_if_dirty(
        REPO, args.allow_dirty or bool(args.only) or bool(args.merge_from)
    )

    merged: dict[str, dict] = {}
    if args.merge_from:
        import re

        pat = re.compile(
            r"^(\w+)\s+([0-9.]+)s\s+\(build\s+([0-9.]+)s\)\s*$"
        )
        with open(args.merge_from) as f:
            for line in f:
                m = pat.match(line.strip())
                if m:
                    merged[m.group(1)] = {
                        "sec": float(m.group(2)),
                        "build_s": float(m.group(3)),
                    }
        print(f"merged {len(merged)} prior timings", file=sys.stderr)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="marasa_spark_bench_full")
    # same bench-box advisory tuning as bench.py (see its comment)
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "1m"),
    )

    # box-speed calibration (round-5 verdict #1): raw times on a VM whose
    # speed swings 1.3-1.7x between rounds defeat raw-time flags, so every
    # op gets a sec_norm = sec / (this box's spark probe / the frozen r5
    # reference probe) and ALL cross-round flagging uses sec_norm. The
    # probe is a point sample and transient co-located load inflates it
    # (observed: 2.3x at sweep start vs 1.0x quiet), so it runs BOTH
    # before and after the sweep and the smaller (least-contended) ratio
    # wins; both samples are recorded.
    calib = calibration_probe(spark, sf_dir)
    print(f"calibration(start): {calib}", file=sys.stderr)

    # prior sweep (read BEFORE overwrite) for normalized cross-round
    # regression detection
    path = os.path.join(REPO, "BENCHFULL.json")
    prior_norm: dict[str, float] = {}
    prior_raw: dict[str, float] = {}
    prior_probes: dict[str, float] = {}
    prior_label = None
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        prior_ratio = prior.get("box_ratio_vs_r5", 1.0)  # r5 sweep ≡ ratio 1.0
        prior_label = prior.get("label", "prior")
        prior_probes = prior.get("calibration", {}).get("used", {})
        for qid, o in prior.get("ops", {}).items():
            if "sec" in o:
                prior_norm[qid] = o.get("sec_norm", round(o["sec"] / prior_ratio, 4))
                prior_raw[qid] = o["sec"]

    qmap = queries_map()
    headline_ids = {qid for ids in HEADLINE.values() for qid in ids}

    ops: dict[str, dict] = {}
    for qid, fn in qmap.items():
        if args.only and not qid.startswith(args.only):
            continue
        group = REGISTRY[qid].group
        if qid in merged:
            ops[qid] = {**merged[qid], "group": group}
        else:
            try:
                build_s, t = bench_op(spark, fn, sf_dir, args.runs)
                ops[qid] = {
                    "sec": round(t, 4),
                    "build_s": round(build_s, 4),
                    "group": group,
                }
                print(f"{qid:28s} {t:8.4f}s  (build {build_s:7.3f}s)", file=sys.stderr)
            except Exception as e:  # record, keep sweeping
                ops[qid] = {"error": f"{type(e).__name__}: {e}", "group": group}
                print(f"{qid:28s} ERROR {type(e).__name__}: {e}", file=sys.stderr)

    calib_end = calibration_probe(spark, sf_dir)
    print(f"calibration(end): {calib_end}", file=sys.stderr)
    best = calib if calib["duckdb_lineitem_agg_sec"] <= calib_end["duckdb_lineitem_agg_sec"] else calib_end
    # probe gate (VERDICT r7 #1): start/end disagreement means load varied
    # WITHIN the sweep window and no scalar ratio can correct the timings.
    # A full sweep is too expensive to auto-rerun, so the artifact is
    # marked contended instead — CLAUDE.md's rule: never use a contended
    # sweep as the regression prior.
    probe_drift = round(
        max(calib["duckdb_lineitem_agg_sec"], calib_end["duckdb_lineitem_agg_sec"])
        / min(calib["duckdb_lineitem_agg_sec"], calib_end["duckdb_lineitem_agg_sec"]),
        3,
    )
    contended = probe_drift > 1.20
    if contended:
        print(
            f"WARNING: probe drift {probe_drift}x > 1.2x — sweep ran on a "
            "contended box; do NOT use this artifact as a regression prior",
            file=sys.stderr,
        )
    ratio = box_ratio(best, sf)
    print(f"box_ratio_vs_r5={ratio:.3f}", file=sys.stderr)
    for o in ops.values():
        if "sec" in o:
            o["sec_norm"] = round(o["sec"] / ratio, 4)

    # per-group threshold: 2x the slowest headline op IN that group;
    # fallback (no headline rep in group): 2x the slowest headline op anywhere.
    # All thresholding runs on sec_norm (box-neutral) — within one sweep the
    # ratio cancels, but merge-from mixes timings from different sessions
    # and the recorded thresholds must be comparable across rounds.
    headline_t = {
        qid: ops[qid]["sec_norm"]
        for qid in headline_ids
        if qid in ops and "sec_norm" in ops[qid]
    }
    global_max = max(headline_t.values()) if headline_t else 0.0
    group_max: dict[str, float] = {}
    for qid, t in headline_t.items():
        g = REGISTRY[qid].group
        group_max[g] = max(group_max.get(g, 0.0), t)

    # absolute floor: several groups' headline reps are sub-0.1 s, which
    # would flag every legitimately-heavier op in the group; the sweep's
    # job is order-of-magnitude outliers, so anything under a second is
    # never "the next q_asof" regardless of its group rep.
    floor = 1.0
    # 15% hysteresis: both the op timing and the headline-rep threshold are
    # run-to-run noisy; an op sitting AT 2x flips in and out across sweeps
    # (observed: l2 at 2.83 vs 2.74 one run, 2.44 vs 2.47 the next). The
    # sweep hunts order-of-magnitude outliers, not 2.0x-vs-2.1x jitter.
    hysteresis = 1.15
    thresholds = {
        g: round(max(2 * hysteresis * group_max.get(g, global_max), floor), 4)
        for g in sorted({o["group"] for o in ops.values()})
    }
    over = sorted(
        qid
        for qid, o in ops.items()
        if headline_t  # --only sweeps without headline reps can't threshold
        and "sec_norm" in o
        and o["sec_norm"] > thresholds.get(o["group"], max(2 * global_max, floor))
    )
    flagged = [qid for qid in over if qid not in WAIVERS]
    waived = {qid: WAIVERS[qid] for qid in over if qid in WAIVERS}

    # Cross-round regression rule (round 12, VERDICT r11 #2 — documented in
    # BASELINE.md §Probe normalization rule). The old single-probe rule
    # (duckdb-normalized sec_norm > 1.5x prior) produced 15 phantom entries
    # in r11's first sweep: this VM family's DuckDB and Python paths drift
    # INDEPENDENTLY across generations (duckdb 25% faster while pickle
    # 20-40% slower on the same box), so no one scalar can normalize every
    # cost class. Operative rule: an op is regressed only if its RAW growth
    # exceeds 1.5x what EVERY stable probe's drift can explain —
    #   now_sec / prior_sec > 1.5 * max_p(clamp(probe_now_p/probe_prior_p))
    # over p ∈ {duckdb (columnar CPU), python_pickle (the single-thread
    # Python path that governs every collect()-bound op)}. spark_range_sum
    # is recorded but EXCLUDED from the rule: it jitters ±30% with JVM
    # state (CLAUDE.md), so its drift would routinely mask real regressions.
    # Drifts are clamped to [1/1.5, 1.5] — a probe moving further than that
    # is contention evidence (the gate's job), not a normalization license.
    # The 0.5 s floor stays on the duckdb-normalized time for continuity.
    # python_compute joins the stable set as priors start carrying it (the
    # r12 bootstrap: the intersection below skips probes the prior lacks)
    stable_probes = (
        "duckdb_lineitem_agg_sec",
        "python_pickle_sec",
        "python_compute_sec",
        "py4j_collect_sec",
    )
    probe_drifts = {
        p: min(1.5, max(1 / 1.5, best[p] / prior_probes[p]))
        for p in stable_probes
        if p in best and prior_probes.get(p)
    }
    max_drift = max(probe_drifts.values()) if probe_drifts else 1.0
    regressed = {
        qid: {
            "prior_sec": prior_raw[qid],
            "now_sec": o["sec"],
            "max_probe_drift": round(max_drift, 3),
        }
        for qid, o in ops.items()
        if "sec_norm" in o
        and qid in prior_raw
        and prior_raw[qid] > 0
        and o["sec_norm"] > 0.5
        and o["sec"] / prior_raw[qid] > 1.5 * max_drift
    }
    # the pre-r12 duckdb-only rule, kept for series continuity (NOT the
    # operative gate — see BASELINE.md for why it false-positives across
    # VM generations)
    regressed_duckdb_only = {
        qid: {"prior_norm": prior_norm[qid], "now_norm": o["sec_norm"]}
        for qid, o in ops.items()
        if "sec_norm" in o
        and qid in prior_norm
        and o["sec_norm"] > 0.5
        and o["sec_norm"] > 1.5 * prior_norm[qid]
    }
    # build-time outliers (lineage bugs like an uncached iterative input
    # re-executing its parent per round) hide from the collect metric.
    # The threshold is BOX-NORMALIZED like every other gate in this file
    # (round 9: an absolute 30 s tripped on a 1.37x-slow box for an op
    # whose box-neutral build is ~22 s and whose code hadn't changed —
    # the gate should fire on lineage bugs, not on probe-measured box
    # speed).
    build_flagged = sorted(
        qid for qid, o in ops.items() if o.get("build_s", 0.0) / ratio > 30.0
    )
    errored = sorted(qid for qid, o in ops.items() if "error" in o)

    # headline 2x-budget margin watch (VERDICT r7 #8): the driver's pass/
    # fail is bench.py raw time vs BASELINE.md's 2x column; this gate trips
    # EARLIER — any §2 headline label whose box-neutral time exceeds 90% of
    # its 2x budget is a margin flag, so a real future regression surfaces
    # in the sweep before the driver sees it. Uses sec_norm (r5-box-
    # equivalent) so a slow round box doesn't fake a margin breach. Only
    # meaningful at the baseline SF (budgets are sf0.1 numbers).
    from bench_margin import BASELINE as HEADLINE_BUDGET

    # Multiprobe margin (round 12, same principle as the regression rule —
    # BASELINE.md): a label only flags when it exceeds 90% of budget under
    # BOTH the duckdb normalization AND the pickle normalization. On this
    # VM family the duckdb probe alone reads 0.69-0.83 of r5 while the
    # Python path is r5-like, inflating every duckdb-normalized margin
    # 20-45% — the r12 contended sweep flagged q_asof at "103%" whose raw
    # time matched r11 exactly. The driver's own check is RAW vs the 2x
    # targets, so the single-divergent-probe flag was strictly noise.
    PICKLE_REF = 0.450  # r11 final sweep at box_ratio 1.003 (BASELINE.md)
    pickle_ratio = best.get("python_pickle_sec", PICKLE_REF) / PICKLE_REF
    headline_margin: dict[str, dict] = {}
    margin_flagged: list[str] = []
    if abs(sf - 0.1) < 1e-12 and not args.only:
        for label, qids in HEADLINE.items():
            if label not in HEADLINE_BUDGET:
                continue
            if not all("sec_norm" in ops.get(q, {}) for q in qids):
                continue
            t = sum(ops[q]["sec_norm"] for q in qids)
            t_raw = sum(ops[q]["sec"] for q in qids)
            budget = 2 * HEADLINE_BUDGET[label]
            pct = round(100 * t / budget, 1)
            pct_pickle = round(100 * (t_raw / pickle_ratio) / budget, 1)
            headline_margin[label] = {
                "sec_norm": round(t, 4),
                "budget_2x": budget,
                "pct_of_budget": pct,
                "pct_of_budget_pickle_norm": pct_pickle,
            }
            if pct > 90.0 and pct_pickle > 90.0:
                margin_flagged.append(label)
        for label in margin_flagged:
            print(
                f"MARGIN: {label} at {headline_margin[label]['pct_of_budget']}% "
                f"(duckdb-norm) / "
                f"{headline_margin[label]['pct_of_budget_pickle_norm']}% "
                f"(pickle-norm) of its 2x budget (>90% under both)",
                file=sys.stderr,
            )

    out = {
        "sf": sf,
        "runs": args.runs,
        "label": time.strftime("%Y-%m-%d %H:%M"),
        "sha": git["sha"],
        "dirty": git["dirty"],
        "protocol": "warm_best_of_N_collect_on_built_plan",
        "calibration": {
            "start": calib,
            "end": calib_end,
            "used": best,
            "probe_drift": probe_drift,
            "contended": contended,
        },
        "box_ratio_vs_r5": round(ratio, 4),
        "n_ops": len(ops),
        "ops": ops,
        "group_thresholds_2x_headline_max_with_hysteresis_norm": thresholds,
        "flagged": flagged,
        "waived": waived,
        "regression_rule": "raw_growth_gt_1.5x_max_stable_probe_drift"
        " (probes: duckdb+python_pickle, clamped [1/1.5,1.5]; spark probe"
        " excluded for ±30% JVM jitter; floor sec_norm>0.5 — BASELINE.md)",
        "probe_drifts_vs_prior": {k: round(v, 4) for k, v in probe_drifts.items()},
        "regressed_vs_prior_norm": regressed,
        "regressed_vs_prior_duckdb_only": regressed_duckdb_only,
        "regressed_prior": prior_label,
        "build_flagged": build_flagged,
        "headline_margin": headline_margin,
        "margin_flagged": margin_flagged,
        "errors": errored,
        "total_sec": round(sum(o.get("sec", 0.0) for o in ops.values()), 3),
        "total_sec_norm": round(sum(o.get("sec_norm", 0.0) for o in ops.values()), 3),
    }
    path = os.path.join(REPO, "BENCHFULL.json")
    if not args.only:
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=False)
        print(f"wrote {path}", file=sys.stderr)
    print(
        json.dumps(
            {
                k: out[k]
                for k in (
                    "sf",
                    "sha",
                    "dirty",
                    "n_ops",
                    "total_sec",
                    "total_sec_norm",
                    "box_ratio_vs_r5",
                    "flagged",
                    "regressed_vs_prior_norm",
                    "build_flagged",
                    "margin_flagged",
                    "errors",
                )
            }
        )
    )
    if margin_flagged:
        sys.exit(1)  # fail the sweep: a headline row is >90% of its budget


if __name__ == "__main__":
    main()
