#!/usr/bin/env python
"""Bench harness (driver contract).

Runs the headline queries() entries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the end-to-end
KG build (the north-star metric: triples/sec), and prints ONE JSON
line:

    {"metric": "...", "value": <total headline seconds>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1,
     "kg": {rows, triples, sec, triples_per_sec},
     "scaling": {cores_n, cores_4n, tps_n, tps_4n, efficiency}}

The KG build runs in SUBPROCESSES (tools/kg_run.py), one JVM per
parallelism level, on the identical deterministic input — the sandbox
stand-in for the north_rule's "N and 4N executors" cluster sizes.

Env knobs:
    SPARK_GRAFT_SF_DIR   sf dir for the queries (default sf0.1)
    SPARK_GRAFT_CPUS     cores for the query phase (default 32)
    SPARK_GRAFT_KG_ROWS  KG input rows (default 2000000)
    SPARK_GRAFT_SCALING  "8,32" cores pair; "" skips the N-cores run
                         (the 4N run always happens — it IS the
                         headline KG number)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def run_queries(sf_dir: str, cores: int) -> dict[str, float]:
    from deja_view_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark(app_name="bench-queries", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    timings: dict[str, float] = {}
    # warm up Python UDF workers (first Arrow stage pays interpreter
    # spawn + imports on every core) before any timed query
    E.entry(spark).count()
    for name, fn in qs.items():
        t0 = time.time()
        # noop sink forces full evaluation without driver collection
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
    spark.stop()
    return timings


def run_kg(cores: int, rows: int) -> dict:
    """One KG build in a fresh JVM at the given parallelism."""
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "kg_run.py"),
            "--cores",
            str(cores),
            "--rows",
            str(rows),
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    m = re.search(r'\{"cores".*\}', out.stdout)
    if not m:
        raise RuntimeError(
            f"kg_run cores={cores} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
        )
    return json.loads(m.group(0))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 2M rows: large enough that the ~25-30s fixed orchestration term
    # stops dominating (scaling efficiency 0.30 at 1M -> 0.37 at 2M ->
    # 0.48 at 4M); 4M doubles bench wall time again for one more point,
    # so the default records the middle of the trend.
    kg_rows = int(os.environ.get("SPARK_GRAFT_KG_ROWS", "2000000"))
    scaling_env = os.environ.get("SPARK_GRAFT_SCALING", "8,32")

    sf_m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(sf_m.group(1)) if sf_m else 0.1

    timings = run_queries(sf_dir, cores)

    result: dict = {
        "metric": "kg_build_plus_queries",
        "unit": "sec",
        "sf": sf,
        "queries": timings,
    }

    # The sandbox host is oversubscribed (6-18% CPU steal observed
    # under load), so single runs swing +-50%. Each level runs
    # `repeats` times INTERLEAVED (N,4N,N,4N) and the best throughput
    # per level is compared — max filters host-contention noise while
    # keeping the two levels drawn from the same time window.
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    pair = [int(c) for c in scaling_env.split(",") if c.strip()]
    runs: dict[int, list[dict]] = {c: [] for c in (pair or [cores])}
    for _ in range(max(1, repeats)):
        for c in sorted(runs):
            runs[c].append(run_kg(c, kg_rows))
    best = {c: max(rs, key=lambda r: r["triples_per_sec"]) for c, rs in runs.items()}
    kg_big = best[max(runs)]
    result["kg"] = {
        "rows": kg_big["rows"],
        "triples": kg_big["triples"],
        "sec": kg_big["sec"],
        "triples_per_sec": kg_big["triples_per_sec"],
        "stages": kg_big["stages"],
    }
    if len(pair) == 2:
        kg_small = best[min(pair)]
        ratio = max(pair) / min(pair)
        eff = kg_big["triples_per_sec"] / (ratio * kg_small["triples_per_sec"])
        result["scaling"] = {
            "cores_n": min(pair),
            "cores_4n": max(pair),
            "tps_n": kg_small["triples_per_sec"],
            "tps_4n": kg_big["triples_per_sec"],
            "efficiency": round(eff, 3),
            "determinism_ok": kg_small["triples"] == kg_big["triples"],
            "all_runs": {
                str(c): [r["triples_per_sec"] for r in rs]
                for c, rs in runs.items()
            },
        }

    result["value"] = round(sum(timings.values()) + kg_big["sec"], 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
