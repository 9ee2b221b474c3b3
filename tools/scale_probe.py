"""Scaling probe: time representative queries across sf0.001/0.01/0.1
and report the log-log growth exponent (slope of time vs scale factor).

A query whose plan is corpus-linear should show slope ≤ ~1 once the
per-query constant (scheduler latency, plan build) stops dominating;
a slope ≫ 1 exposes a stage that grows super-linearly (the thing that
kills a 100 TB run).  Small-SF timings are constant-dominated, so the
exponent uses the two LARGEST scale factors; the smallest column is
shown for context.

Usage: python tools/scale_probe.py [query ...]   (default: headline set)
Writes a markdown table to stdout; exit code is always 0 (this is a
diagnostic, not a gate — the gate on plan shape is tools/plan_lint.py).

Every measured row is ALSO appended to the machine-readable ledger
``PROBES.jsonl`` at the repo root (round 10, VERDICT r9 #3): one JSON
object per (query, probe-run) with the per-sf walls, the top-decade
slope, the fixture paths, and the relevant env levers — so coverage
(``tools/probe_coverage.py``) is computed from records, not prose.
Set ``PROBE_LEDGER=0`` to suppress (e.g. throwaway experiments) or
``PROBE_LEDGER=/path.jsonl`` to redirect.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Override with SCALE_SFS="dir:sf,dir:sf,..." — e.g. generated larger
# fixtures from tools/gen_scale_fixture.py (VERDICT r6 next-round #4):
#   SCALE_SFS="/tmp/scalefix/sf0.1:0.1,/tmp/scalefix/sf1:1" \
#       python tools/scale_probe.py semantic_dedup ...
_env_sfs = os.environ.get("SCALE_SFS")
if _env_sfs:
    SFS = [
        (part.rsplit(":", 1)[0], float(part.rsplit(":", 1)[1]))
        for part in _env_sfs.split(",")
    ]
else:
    SFS = [
        ("/root/testdata/sf0.001", 0.001),
        ("/root/testdata/sf0.01", 0.01),
        ("/root/testdata/sf0.1", 0.1),
    ]

# one representative per major plan family
DEFAULT = [
    "tpch_q1",            # scan + partial agg
    "tpch_q9",            # multi-join
    "knn_topk",           # scan + heap top-k
    "knn_batch_ann",      # LSH bucket join
    "dedup_near",         # shingle/minhash/band/CC
    "dup_span_stats",     # gram window + islands
    "text_search_bm25",   # postings + broadcast stats
    "events_sessionize",  # per-user session windows
    "global_quantiles",   # range-partition order stats
    "seq_packing",        # distributed prefix sum
    "bloom_semi_join",    # runtime-filtered semi-join
    "events_value_trend", # moment-sum aggregation
]


def _ledger_append(
    name: str,
    times: list[float],
    slope: float | None,
    error: str | None = None,
) -> None:
    """One JSONL record per measured (query, probe run) — the raw
    material for tools/probe_coverage.py.  Timestamps are whole probe
    runs, so wall-noise context (BASELINE.md) travels with the row."""
    dest = os.environ.get("PROBE_LEDGER", "")
    if dest == "0":
        return
    path = dest or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PROBES.jsonl",
    )
    rec = {
        "query": name,
        "sfs": [sf for _, sf in SFS],
        "dirs": [d for d, _ in SFS],
        "walls_sec": [round(t, 3) for t in times],
        "slope_top_decade": round(slope, 3) if slope is not None else None,
        "band_cap": os.environ.get("SPARK_GRAFT_BAND_CAP") or None,
        "pair_bound": os.environ.get("SPARK_GRAFT_PAIR_BOUND") or None,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    if error is not None:
        rec["error"] = error
    with open(path, "a") as fh:
        fh.write(json.dumps(rec) + "\n")


def main() -> int:
    names = sys.argv[1:] or DEFAULT

    # Pair-guard for probe runs (VERDICT r8 #7): a quadratic pair
    # explosion at a probed scale (round 8: 204.9 M candidates at sf10
    # for 2,313 output rows) should raise PairExplosionError in seconds,
    # not burn hours.  The driver never sets this, so registered oracle
    # behavior is untouched; export SPARK_GRAFT_PAIR_BOUND=0 to disable.
    os.environ.setdefault("SPARK_GRAFT_PAIR_BOUND", str(100_000_000))

    import __spark_entry__ as entrymod
    from merkonvectordb_spark import get_spark

    spark = get_spark("scale_probe", shuffle_partitions=32)
    qs = entrymod.queries()
    # warm codegen/parquet paths
    qs["tpch_q1"](spark, SFS[-1][0]).write.format("noop").mode(
        "overwrite"
    ).save()

    rows = []
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        times = []
        failed = None
        for sf_dir, _sf in SFS:
            best = float("inf")
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                    # several operators persist() intermediates they
                    # cannot unpersist (lazy results); without this the
                    # probe accumulates dead cache blocks across
                    # (query, sf, run) cells and later cells measure
                    # eviction/GC pressure, not the plan (same reason
                    # bench.py clears per query)
                    spark.catalog.clearCache()
                    # clearCache misses localCheckpoint blocks; reap
                    # those too or later cells measure accumulated-
                    # block GC pressure (session.free_persisted_blocks)
                    from merkonvectordb_spark import free_persisted_blocks

                    free_persisted_blocks(spark)
            except Exception as exc:  # noqa: BLE001 — diagnostic sweep
                # One query's blow-up (OOM, maxResultSize, a guard
                # tripping at a new decade) must not abort the whole
                # sweep — round 10 lost a 40-minute batch to exactly
                # that.  Record the failure in the ledger (walls
                # measured so far, no slope, error noted) and move on.
                failed = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
                print(f"  {name} FAILED at {sf_dir}: {failed}", file=sys.stderr)
                for q in spark.streams.active:  # zombie micro-batches
                    q.stop()
                spark.catalog.clearCache()
                from merkonvectordb_spark import free_persisted_blocks

                free_persisted_blocks(spark)
                break
            times.append(best)
        if failed is not None:
            _ledger_append(name, times, None, error=failed)
            continue
        # exponent from the two LARGEST scale factors; undefined (and
        # previously an IndexError) when SCALE_SFS names a single dir
        slope = (
            math.log(times[-1] / times[-2])
            / math.log(SFS[-1][1] / SFS[-2][1])
            if len(SFS) >= 2
            else None
        )
        rows.append((name, times, slope))
        print(
            f"  {name}: "
            + " ".join(f"{t:.2f}s" for t in times)
            + (f"  slope={slope:.2f}" if slope is not None else ""),
            file=sys.stderr,
        )
        _ledger_append(name, times, slope)

    hdr = " | ".join(f"sf{sf:g}" for _, sf in SFS)
    slope_hdr = (
        f" slope(sf{SFS[-2][1]:g}→sf{SFS[-1][1]:g}) |" if len(SFS) >= 2 else ""
    )
    print(f"| query | {hdr} |{slope_hdr}")
    print("|---|" + "---|" * (len(SFS) + (1 if len(SFS) >= 2 else 0)))
    for name, times, slope in rows:
        cells = " | ".join(f"{t:.2f}s" for t in times)
        tail = f" {slope:.2f} |" if slope is not None else ""
        print(f"| {name} | {cells} |{tail}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
