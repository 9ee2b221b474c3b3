#!/usr/bin/env python
"""Per-round benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "wall_clock_total", "value": <sum sec>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": <float>}

Timing methodology: each query is materialized with a ``noop``-format
write (full pipeline executes on the executors; nothing funnels through
the driver, so the number measures the plan, not ``collect()``
serialization).  Each query runs ``BENCH_RUNS`` times (default 2) and the
minimum is reported — the first run pays one-time costs (parquet footer
reads, codegen), the min is the steady-state number a warm cluster sees.
``BENCH_STAT=median`` (round 10, VERDICT r9 #5) switches the reported
statistic to the median-of-runs — pair with ``BENCH_RUNS=3`` for the
end-of-round committed sweep so tail queries carry less single-window
hypervisor-steal risk (BASELINE.md noise provenance); the default stays
min-of-2 (the driver's own sweep cost is not ours to triple).
All diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "2"))
    stat = os.environ.get("BENCH_STAT", "min")
    if stat not in ("min", "median"):
        raise SystemExit(f"BENCH_STAT must be min|median, got {stat!r}")
    only = sys.argv[1:]  # optional query-name filter for local iteration

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # keep EVERY observation hook out of the timed path (VERDICT r5 #4):
    # ENVPROBE=0 disables record_env_once's fingerprint scan (which would
    # otherwise ride the first timed query's load_table) and maybe_probe's
    # per-query oracle replays.  The bench's OWN fingerprint below calls
    # env_fingerprint()/inproc_check() directly — those are not gated —
    # so the committed BENCH_r{N}.json evidence is unchanged.
    os.environ.setdefault("ENVPROBE", "0")
    import __spark_entry__ as entrymod
    from merkonvectordb_spark import get_spark

    spark = get_spark("bench")
    # warm the session: one trivial job for JVM startup, then one real
    # query (flagship at sf0.001) so parquet-reader init, whole-stage
    # codegen, and shuffle paths are JITted before the first TIMED query
    # — with a verification-priority registry order the first timed
    # entries change each round, and without this they absorb warm-up
    # cost that then reads as a per-query regression
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        entrymod.entry(spark).write.format("noop").mode("overwrite").save()
    except Exception as e:  # warm-up must never fail the bench
        print(f"  warmup entry() failed: {e}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        obs: list[float] = []
        for _ in range(max(1, runs)):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            obs.append(time.perf_counter() - t0)
        obs.sort()
        # median: lower-middle for even n — never averages two windows
        picked = obs[0] if stat == "min" else obs[(len(obs) - 1) // 2]
        timings[name] = round(picked, 4)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)
        # a few queries persist() intermediates they cannot unpersist
        # (lazy results); without this the sweep accumulates dead cache
        # in executor storage memory across 130+ queries.  clearCache
        # misses localCheckpoint blocks (30+ operators cut lineage with
        # them and return lazy frames) — free_persisted_blocks reaps
        # those too, else the sweep pins hundreds of dead block sets
        # and the tail queries measure GC pressure, not their plans.
        spark.catalog.clearCache()
        from merkonvectordb_spark import free_persisted_blocks

        free_persisted_blocks(spark)

    total = round(sum(timings.values()), 4)
    sf = _sf_from_dir(sf_dir)
    out = {
        "metric": "wall_clock_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))
    # Round-5 instrumentation: the r4 driver-only oracle failures can't
    # be reproduced locally, so the bench line — which the driver runs in
    # the SAME environment as its correctness gate and commits verbatim
    # as BENCH_r{N}.json — carries an environment fingerprint plus an
    # in-process Spark-vs-DuckDB check of the red queries at the
    # correctness SF.  See merkonvectordb_spark/probe.py.
    probe_line: dict = {"metric": "envprobe"}
    probe_fail: list[str] = []
    env_min: dict = {}
    if os.environ.get("BENCH_PROBE", "1") != "0":
        try:
            from merkonvectordb_spark import probe as _probe

            corr_dir = "/root/testdata/sf0.01"
            if os.path.isdir(corr_dir):
                fp = _probe.env_fingerprint(spark, corr_dir)
                probe_line["env"] = fp
                env_min = {
                    "duckdb": fp.get("duckdb"),
                    "tz": fp.get("local_tzname"),
                    "duck_ts": fp.get("duckdb_events_ts_type"),
                    "spark_ts": fp.get("spark_events_raw_ts_type"),
                    "ck_eq": list(fp.get("duckdb_events_ck") or [])
                    == list(fp.get("spark_events_ck") or []),
                }
                checks = _probe.inproc_check(spark, corr_dir)
                probe_line["probe"] = checks
                probe_fail = [
                    n
                    for n, r in checks.items()
                    if isinstance(r, dict)
                    and not r.get("hash_match", True)
                ]
        except Exception as e:  # observation only — never fail the bench
            probe_line["probe_err"] = repr(e)[:200]
        print(json.dumps(probe_line, default=str))
    # The full per-query line above can overflow a bounded tail buffer
    # (102 timings ≈ 3 KB — round 3's BENCH record truncated mid-line and
    # parsed as null).  Emit a compact line LAST — guaranteed to survive
    # any tail cut — carrying the headline numbers plus only the slowest
    # queries, so the record is always parseable.
    # Persist the FULL per-query map as a repo artifact (VERDICT r6
    # next-round #3): the driver's BENCH_r{N}.json keeps only the
    # top-10 slowest (tail truncation below), so round-over-round
    # regression diffs on the other ~174 queries need this file.  The
    # round number is the next after the last committed BENCH_r*.json
    # (overridable via SPARK_GRAFT_ROUND); the driver's end-of-round
    # commit picks the file up.  A FILTERED run (query names on argv —
    # the local iteration loop) must never clobber the full-sweep
    # artifact with a partial map.
    if only:
        print("  filtered run — BENCH_LOCAL artifact untouched", file=sys.stderr)
    else:
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            rnd = os.environ.get("SPARK_GRAFT_ROUND")
            if not rnd:
                import glob as _glob

                prev = [
                    int(m.group(1))
                    for p in _glob.glob(os.path.join(here, "BENCH_r*.json"))
                    if (m := re.search(r"BENCH_r(\d+)\.json$", p))
                ]
                rnd = str(max(prev, default=0) + 1)
            local_path = os.path.join(here, f"BENCH_LOCAL_r{int(rnd):02d}.json")
            with open(local_path, "w") as fh:
                json.dump(out, fh, sort_keys=True)
                fh.write("\n")
            print(f"  full per-query map -> {local_path}", file=sys.stderr)
        except Exception as e:  # artifact write must never fail the bench
            print(f"  BENCH_LOCAL write failed: {e}", file=sys.stderr)
    ts = sorted(timings.values())
    median = round(ts[len(ts) // 2], 4) if ts else 0.0
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    compact = {
        "metric": "wall_clock_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "median_sec": median,
        "queries": slowest,
    }
    if env_min:
        compact["env_min"] = env_min
        compact["probe_fail"] = probe_fail
    print(json.dumps(compact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
