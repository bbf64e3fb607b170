#!/usr/bin/env python
"""Scaling-efficiency measurement (BASELINE.md protocol; the sandbox proxy
for the north_rule's N vs 4N executor criterion).

Runs the FULL index build (E1→E10, cold index dir) over the pages_ci
fixture at two parallelism levels N and 4N (default local[2] vs local[8];
see LEVELS below for why not 8-vs-32 on this shared box) — same input,
same machine — via `spark-submit --py-files dist/....zip` subprocesses
(one JVM per run, nothing shared), plus the BM25 query p95 at each level.

    eff = (T_N / T_4N) / 4        target ≥ 0.8

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
# SCALING_FIXTURE: path to a pre-generated pages parquet file/dir (e.g.
# bench_append.ensure_range output) — skips the single-process generator
FIXTURE = os.environ.get(
    "SCALING_FIXTURE",
    os.path.join(REPO, "BENCH", ".fixtures", "pages_ci", "pages.parquet"))
N_DOCS = int(os.environ.get("SCALING_DOCS", "600000"))
RUNS = int(os.environ.get("SCALING_RUNS", "3"))
# N vs 4N parallelism levels. Default (2, 8): this sandbox is a SHARED
# 32-core box with sustained external tenant load (load avg 10-22 measured;
# see BENCH/BASELINE.md) — at local[32] the job cannot actually obtain 4x
# the cores of local[8], so the 8-vs-32 pair measures tenant noise, not the
# engine. 2-vs-8 keeps both levels within the free-core envelope. Override:
# SCALING_LEVELS="8,32".
LEVELS = tuple(int(x) for x in
               os.environ.get("SCALING_LEVELS", "2,8").split(","))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")


def ensure_fixture() -> None:
    sys.path.insert(0, REPO)
    if "SCALING_FIXTURE" in os.environ:
        assert os.path.exists(FIXTURE), FIXTURE
        return
    from elasticsearch_eslib_spark.fixtures import write_pages_parquet

    write_pages_parquet(os.path.dirname(FIXTURE), N_DOCS)


def build_dist() -> str:
    subprocess.run(["make", "-s", "dist"], cwd=REPO, check=True)
    return os.path.join(REPO, "dist", "elasticsearch_eslib_spark.zip")


def run_build(cores: int, zip_path: str) -> tuple[float, float, dict]:
    """Returns (inner build wall from the job's own metrics, outer wall
    incl. JVM/session startup, per-stage walls from the build manifest).
    Throughput uses the inner wall — a real 10^12-doc cluster run amortizes
    JVM startup to nothing; the outer wall is reported alongside for
    transparency. The per-stage walls make each pair self-diagnosing: when
    efficiency misses, they show WHICH stage failed to scale instead of
    leaving a single opaque total."""
    import shutil as _sh

    index_dir = tempfile.mkdtemp(prefix=f"scaling_idx_{cores}_")
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env.pop("SPARK_MASTER", None)
    t0 = time.time()
    cmd = [SPARK_SUBMIT,
           "--master", f"local[{cores}]",
           "--conf", f"spark.sql.shuffle.partitions={cores}",
           "--conf", "spark.driver.memory=24g",
           "--py-files", zip_path,
           os.path.join(REPO, "build_index.py"),
           "--input", FIXTURE, "--index", index_dir]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         cwd=REPO)
    outer = time.time() - t0
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
        raise RuntimeError(f"build failed at local[{cores}]")
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    stage_walls = {}
    try:
        with open(os.path.join(index_dir, "_manifest.json")) as fh:
            man = json.load(fh)
        for st, meta in man.get("stages", {}).items():
            w = meta.get("metrics", {}).get("wall_ms")
            if w is not None:
                stage_walls[st] = round(w / 1000.0, 1)
    except OSError:
        pass
    _sh.rmtree(index_dir, ignore_errors=True)
    return metrics["wall_sec"], outer, stage_walls


_P95_INDEX: list[str] = []


def run_query_p95(cores: int, zip_path: str, reps: int = 10) -> float:
    """p95 per-query latency (WAND, warm index) at this parallelism.

    The index is identical at any build parallelism (determinism test), so
    it is built once and served at each level from a fresh session.
    """
    from elasticsearch_eslib_spark.config import get_spark
    from elasticsearch_eslib_spark.fixtures import gen_queries
    from elasticsearch_eslib_spark.plans.build_index import build_index
    from elasticsearch_eslib_spark.plans.run_queries import run_queries

    spark = get_spark(f"scaling-q{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    if not _P95_INDEX:
        index_dir = tempfile.mkdtemp(prefix="scaling_q_idx_")
        build_index(spark, FIXTURE, index_dir)
        _P95_INDEX.append(index_dir)
    index_dir = _P95_INDEX[0]
    qdf = spark.createDataFrame(gen_queries())
    n_q = qdf.count()
    lat = []
    for _ in range(reps):
        t0 = time.time()
        run_queries(spark, index_dir, qdf, path="wand").count()
        lat.append((time.time() - t0) * 1000 / n_q)
    spark.stop()
    lat.sort()
    return lat[max(0, int(len(lat) * 0.95) - 1)]


def main() -> None:
    ensure_fixture()
    zip_path = build_dist()
    walls: dict[int, list[float]] = {c: [] for c in LEVELS}
    outers: dict[int, list[float]] = {c: [] for c in LEVELS}
    stagew: dict[int, list[dict]] = {c: [] for c in LEVELS}
    # INTERLEAVE the levels (N, 4N, N, 4N, ...) so slow drift on the box
    # (page-cache writeback, CPU frequency after sustained load, tenant
    # noise) biases both levels equally instead of whichever ran last;
    # sync + settle between runs levels dirty-page backpressure.
    for i in range(RUNS):
        for cores in LEVELS:
            subprocess.run(["sync"], check=False)
            try:  # level the page-cache field: both levels start cold
                with open("/proc/sys/vm/drop_caches", "w") as fh:
                    fh.write("3\n")
            except OSError:
                pass
            time.sleep(15)
            w, outer, sw = run_build(cores, zip_path)
            walls[cores].append(w)
            outers[cores].append(outer)
            stagew[cores].append(sw)
            print(f"local[{cores}] run {i + 1}/{RUNS}: build {w:.1f}s "
                  f"(process {outer:.1f}s) stages={sw}",
                  file=sys.stderr, flush=True)
    med = {c: statistics.median(ws) for c, ws in walls.items()}
    eff = (med[LEVELS[0]] / med[LEVELS[1]]) / (LEVELS[1] / LEVELS[0])
    p95 = {}
    if os.environ.get("SCALING_P95", "1") == "1":
        # descending: the shared p95 index gets built at the fastest level
        for cores in sorted(LEVELS, reverse=True):
            p95[str(cores)] = round(run_query_p95(cores, zip_path), 1)
            print(f"local[{cores}] query p95: {p95[str(cores)]} ms",
                  file=sys.stderr, flush=True)
    result = {
        "metric": f"index-build scaling efficiency local[{LEVELS[0]}] vs local[{LEVELS[1]}]",
        "levels": list(LEVELS),
        "n_docs": N_DOCS,
        "runs": {str(c): [round(w, 1) for w in walls[c]] for c in LEVELS},
        "process_walls": {str(c): [round(w, 1) for w in outers[c]] for c in LEVELS},
        "median_wall_sec": {str(c): round(med[c], 1) for c in LEVELS},
        "docs_per_sec": {str(c): round(N_DOCS / med[c], 1) for c in LEVELS},
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "load_avg_at_start": os.getloadavg()[1],
        "cpu_microbench_eff": _cpu_microbench_eff(),
        "bw_microbench_eff": _bw_microbench_eff(),
        "stage_walls": {str(c): stagew[c] for c in LEVELS},
        "stage_scaling_eff": {
            st: round((statistics.median([r.get(st, 0.0) for r in
                                          stagew[LEVELS[0]]]) /
                       max(statistics.median([r.get(st, 0.0) for r in
                                              stagew[LEVELS[1]]]), 1e-9)) /
                      (LEVELS[1] / LEVELS[0]), 3)
            for st in (stagew[LEVELS[0]][0] if stagew[LEVELS[0]] else {})
        },
    }
    if p95:
        result["query_p95_ms"] = p95
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH",
                           f"scaling_{LEVELS[0]}v{LEVELS[1]}_{N_DOCS}.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    # SCALING_REPORT=0 keeps the hand-curated BENCH/BASELINE.md (which adds
    # measurement-context prose) and records only the raw JSON above
    if os.environ.get("SCALING_REPORT", "1") == "1":
        _write_report(result, zip_path)


def _microbench_work(_):
    x = 0
    for i in range(4_000_000):
        x += i * i
    return x


def _cpu_microbench_eff() -> float:
    """Pure-CPU N-vs-4N envelope on this box right now: what efficiency a
    PERFECTLY parallel workload can demonstrate between the two levels
    (shared-tenant load + memory bandwidth cap it below 1.0)."""
    import multiprocessing as mp

    def run(procs, tasks_per=4):
        with mp.Pool(procs) as p:
            t0 = time.time()
            p.map(_microbench_work, range(procs * tasks_per))
            return time.time() - t0

    lo, hi = LEVELS
    run(lo)  # warm the pool-spawn path
    t_lo, t_hi = run(lo), run(hi)
    return round(t_lo / t_hi, 3)


def _bw_microbench_eff() -> float:
    """Shared-memory-BANDWIDTH N-vs-4N envelope (fixed total work, numpy
    stream copies): what a bytes-bound workload can demonstrate between
    the two levels on this box right now. Recorded next to the pure-ALU
    envelope because the two bound different fractions of the build (the
    round-4 finding: this single-socket VM's bandwidth saturates at ~2
    streaming processes — see bench_membw.py / BENCH/BASELINE.md)."""
    import multiprocessing as mp

    from bench_membw import _stream

    lo, hi = LEVELS

    def run(procs):
        with mp.Pool(procs) as p:
            t0 = time.time()
            p.map(_stream, range(16))
            return time.time() - t0

    run(lo)  # warm pool-spawn + allocator
    return round((run(lo) / run(hi)) / (hi / lo), 3)


def _write_report(result: dict, zip_path: str) -> None:
    """Render BENCH/BASELINE.md from EVERY recorded scaling pair
    (BENCH/scaling_*.json), newest measurement semantics: each pair keeps
    its own load/microbench context so the reader can judge which pair the
    box could honestly demonstrate."""
    import glob

    import pyspark

    pairs = []
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH",
                                              "scaling_*.json"))):
        with open(path) as fh:
            pairs.append(json.load(fh))
    lines = [
        "# BENCH/BASELINE — measured numbers (round 2)",
        "",
        "Protocol: BASELINE.md (repo root). Full index build E1→E10 over the",
        f"deterministic pages_ci fixture ({N_DOCS:,} docs, seed 42,",
        "FIXTURES.md), cold index dir per run, one spark-submit JVM per run:",
        "",
        "```",
        f"{SPARK_SUBMIT} --master local[N] "
        f"--conf spark.sql.shuffle.partitions=N --conf spark.driver.memory=24g "
        f"--py-files {os.path.relpath(zip_path, REPO)} build_index.py "
        f"--input BENCH/.fixtures/pages_ci/pages.parquet --index <tmp>",
        "```",
        "",
        f"Spark version: {pyspark.__version__}. Page cache warm (same input",
        "file re-read per run; noted per BASELINE.md §6).",
        "",
    ]
    for res in pairs:
        lv = res.get("levels") or [int(k) for k in res["median_wall_sec"]]
        nd = res.get("n_docs", N_DOCS)
        lines += [
            f"## Pair local[{lv[0]}] vs local[{lv[1]}] — {nd:,} docs",
            "",
            "| Level | runs (wall s) | median s | docs/s |",
            "|---|---|---|---|",
        ]
        for c in lv:
            runs = ", ".join(str(w) for w in res["runs"][str(c)])
            lines.append(f"| local[{c}] | {runs} | "
                         f"{res['median_wall_sec'][str(c)]} | "
                         f"{res['docs_per_sec'][str(c)]} |")
        lines += [
            "",
            f"**Scaling efficiency** = (T_{lv[0]} / T_{lv[1]}) / 4 = "
            f"**{res['scaling_efficiency']}** "
            f"(target ≥ 0.8 → {'PASS' if res['pass'] else 'FAIL'})",
            "",
        ]
        ctx = []
        if "load_avg_at_start" in res:
            ctx.append(f"box load avg at start {res['load_avg_at_start']:.1f}")
        if "cpu_microbench_eff" in res:
            ctx.append("pure-CPU microbench envelope between these levels "
                       f"{res['cpu_microbench_eff']} (what a PERFECTLY "
                       "parallel workload demonstrates on this box)")
        if ctx:
            lines += ["Context: " + "; ".join(ctx) + ".", ""]
        if "query_p95_ms" in res:
            lines += [
                "| Level | BM25 WAND p95 (ms/query, k=10, 12-query set ×10) |",
                "|---|---|",
            ]
            for c in lv:
                lines.append(f"| local[{c}] | {res['query_p95_ms'][str(c)]} |")
            lines.append("")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write("\n".join(lines))


if __name__ == "__main__":
    main()
