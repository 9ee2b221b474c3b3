"""Driver-environment probe (round-5 instrumentation).

Rounds 2-4 left a class of oracle hash failures that pass locally under
every constructible session but fail in the external harness's container
(VERDICT r4 "What's wrong" #1).  The harness environment is not
inspectable from here, so this module makes the *driver's own runs*
report it back through two channels:

* ``ENVPROBE.jsonl`` (repo root) — appended during any run that calls
  ``load_table`` (t1 smoke, t2 correctness, bench): one environment
  fingerprint per process, plus — for the watchlisted queries at the
  correctness SF — an IN-PROCESS Spark-vs-DuckDB comparison with
  row-level diff samples.  If the in-process check matches while the
  driver's own gate reports a hash failure, the divergence is in the
  harness's comparison layer, not the engines.
* the bench JSON line (committed per-round as ``BENCH_r{N}.json``) —
  ``bench.py`` embeds the same fingerprint + in-process check summary,
  guaranteeing the evidence survives even if the working tree from the
  t2 run is discarded.

Everything here is wrapped so a probe failure can NEVER fail a query:
the probe observes, it does not participate.
"""

from __future__ import annotations

import json
import os
import time

PROBE_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ENVPROBE.jsonl")

# the r4/r5 driver-red queries (the HUGEINT-oracle family, fixed in r6
# by CASTing every integer aggregate to BIGINT) + the sessionize bisect
# variants: these get the expensive per-query in-process oracle
# comparison at the correctness SF (sf0.01); everything else only
# contributes to the one-shot environment fingerprint.  r6 adds the two
# r5-NEW reds that had no probe row last round (VERDICT r5 #5).
WATCHED = {
    "events_sessionize",
    "events_sessionize_v_nevents",
    "events_sessionize_v_cents",
    "events_sessionize_v_bounds",
    "skew_salted_join",
    "tpch_q12",
    "events_range_join",
    "events_time_window_agg",
    "events_gap_fill_locf",
    "streaming_window_agg",
    "streaming_sessionize_closed",
    "events_hierarchical_rollup",
    "streaming_sessionize_python",
    # round-6 session-2 additions: never driver-checked before round 7,
    # so a first-check red gets immediate both-fetch-path evidence
    "lang_temperature_mix",
    "quality_score_auc",
    "quality_linear_probe",
    "sampled_global_quantiles",
    "ann_ndcg_report",
    "events_cusum_changepoint",
    "events_last_touch_attribution",
    "events_first_touch_attribution",
    "user_rfm_segments",
    "events_ab_test_report",
    "quality_calibration_report",
    "events_ewma_anomalies",
}

_env_recorded: set[str] = set()
_probed: set[str] = set()


def _enabled() -> bool:
    """Global kill-switch: ENVPROBE=0 disables EVERY probe path —
    fingerprints, per-query checks, and file appends alike."""
    return os.environ.get("ENVPROBE", "1") != "0"


def _is_correctness_dir(sf_dir: str) -> bool:
    """The driver's oracle gate runs at sf0.01 — match the directory
    NAME exactly (basename), not a substring: '0.01' as a substring
    also matches paths like .../run-2026.01.12/sf10."""
    return os.path.basename(os.path.normpath(sf_dir)) == "sf0.01"


def _small_enough_to_scan(sf_dir: str) -> bool:
    """The fingerprint checksums scan events/lineitem in full; cap by
    file size so a production-scale directory never pays table scans
    for diagnostics."""
    try:
        ev = os.path.join(sf_dir, "events.parquet")
        return os.path.exists(ev) and os.path.getsize(ev) < 64 * 1024 * 1024
    except Exception:
        return False


def _append(line: dict) -> None:
    try:
        with open(PROBE_PATH, "a") as f:
            f.write(json.dumps(line, default=str) + "\n")
    except Exception:
        pass  # read-only tree in some harness stages — observation only


# single source of truth shared with tools/oracle_check.py — the probe's
# verdicts must be byte-identical to the gate stand-in's
from merkonvectordb_spark.canon import canon_rows as _canon_rows  # noqa: E402
from merkonvectordb_spark.canon import canon_rows_arrow as _canon_rows_arrow  # noqa: E402


def env_fingerprint(spark, sf_dir: str, heavy: bool | None = None) -> dict:
    """Environment + data fingerprint.  MUST run before load_table pins
    session confs so the *harness's own* values are captured.

    ``heavy`` gates the full-table checksum scans (DuckDB + Spark over
    events/lineitem); default: only when the directory is small enough
    that the scans are negligible."""
    import datetime as _dt

    if heavy is None:
        heavy = _small_enough_to_scan(sf_dir)
    fp: dict = {"kind": "env", "sf_dir": sf_dir, "wall": time.time()}
    try:
        fp["tz_env"] = os.environ.get("TZ")
        fp["local_tzname"] = str(_dt.datetime.now().astimezone().tzinfo)
    except Exception as e:
        fp["tz_err"] = repr(e)
    try:
        import duckdb

        fp["duckdb"] = duckdb.__version__
        con = duckdb.connect()
        try:
            fp["duckdb_tz"] = con.sql(
                "SELECT current_setting('TimeZone')"
            ).fetchone()[0]
        except Exception as e:
            fp["duckdb_tz"] = f"err:{e!r}"
        ev = os.path.join(sf_dir, "events.parquet")
        if os.path.exists(ev):
            fp["duckdb_events_ts_type"] = con.sql(
                f"SELECT typeof(ts) FROM read_parquet('{ev}') LIMIT 1"
            ).fetchone()[0]
            if heavy:
                fp["duckdb_events_ck"] = con.sql(
                    f"SELECT count(*), min(epoch_us(ts)), max(epoch_us(ts)),"
                    f" sum(epoch_us(ts) % 1000000) FROM read_parquet('{ev}')"
                ).fetchone()
        li = os.path.join(sf_dir, "lineitem.parquet")
        if heavy and os.path.exists(li):
            fp["duckdb_lineitem_ck"] = con.sql(
                f"SELECT count(*), sum(epoch_us(l_shipdate) % 86400000000)"
                f" FROM read_parquet('{li}')"
            ).fetchone()
        con.close()
    except Exception as e:
        fp["duckdb_err"] = repr(e)
    try:
        import pyarrow.parquet as pq

        col = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).schema.column(1)
        fp["events_ts_parquet"] = str(col.logical_type)
    except Exception as e:
        fp["parquet_err"] = repr(e)
    try:
        fp["spark_version"] = spark.version
        for c in (
            "spark.sql.session.timeZone",
            "spark.sql.parquet.inferTimestampNTZ.enabled",
            "spark.sql.legacy.parquet.nanosAsLong",
            "spark.sql.ansi.enabled",
            "spark.sql.datetime.java8API.enabled",
            "spark.sql.execution.arrow.pyspark.enabled",
            "spark.sql.shuffle.partitions",
            "spark.sql.parquet.int96RebaseModeInRead",
            "spark.sql.parquet.datetimeRebaseModeInRead",
        ):
            try:
                fp[c] = spark.conf.get(c)
            except Exception:
                fp[c] = "<unset>"
    except Exception as e:
        fp["spark_err"] = repr(e)
    try:
        ev_raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        fp["spark_events_raw_ts_type"] = str(ev_raw.schema["ts"].dataType)
    except Exception as e:
        fp["spark_raw_read_err"] = repr(e)[:200]
    try:
        from pyspark.sql import functions as F

        from merkonvectordb_spark.schema import load_table

        ev = load_table(spark, sf_dir, "events")  # the real query read path
        fp["spark_events_ts_type"] = str(ev.schema["ts"].dataType)
        if heavy:
            row = ev.select(
                F.count(F.lit(1)),
                F.min(F.unix_micros("ts")),
                F.max(F.unix_micros("ts")),
                F.sum(F.unix_micros("ts") % 1000000),
            ).first()
            fp["spark_events_ck"] = list(row)
    except Exception as e:
        fp["spark_read_err"] = repr(e)[:300]
    return fp


def record_env_once(spark, sf_dir: str) -> None:
    """Called at the top of ``load_table`` (before any conf pinning).
    One fingerprint line per (process, sf_dir); ENVPROBE=0 disables."""
    if not _enabled() or sf_dir in _env_recorded:
        return
    _env_recorded.add(sf_dir)  # even on failure: never retry per call
    try:
        _append(env_fingerprint(spark, sf_dir))
    except Exception:
        pass


def inproc_check(spark, sf_dir: str, names=None) -> dict:
    """Run each watched query AND its DuckDB oracle in THIS process over
    ``sf_dir``; return {name: result-dict}.  Mirrors the external gate's
    comparison (tools/oracle_check.py canonicalization)."""
    out: dict = {}
    try:
        import duckdb

        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        oracles = entrymod.oracle_sql()
        from merkonvectordb_spark.schema import TESTDATA_TABLES

        con = duckdb.connect()
        for t in TESTDATA_TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        for name in names or sorted(WATCHED):
            if name not in qs or name not in oracles:
                continue
            _probed.add(name)  # the wrapper hook must not re-run this
            r: dict = {}
            try:
                sdf = qs[name](spark, sf_dir)
                scols = sdf.columns
                srows = [tuple(x) for x in sdf.collect()]
                shash, slines = _canon_rows(scols, srows)
                rel = con.sql(oracles[name])
                ocols = rel.columns
                orows = rel.fetchall()
                ohash, olines = _canon_rows(ocols, orows)
                # BOTH oracle fetch paths, recorded even on match: the
                # external gate fetches via pandas/arrow (r5 root cause:
                # HUGEINT → float64/decimal128 there, native int via
                # fetchall), so a fetchall-only verdict can blind-spot
                # exactly the class that bit r4/r5 (VERDICT r5 #5).
                try:
                    oahash, _ = _canon_rows_arrow(con.sql(oracles[name]))
                except Exception as e:  # pragma: no cover - diagnostics
                    oahash = f"err:{e!r}"[:120]
                r["spark_rows"] = len(srows)
                r["duck_rows"] = len(orows)
                r["cols_match"] = sorted(scols) == sorted(ocols)
                r["hash_match"] = shash == ohash and r["cols_match"]
                r["spark_hash"] = shash
                r["duck_hash_fetchall"] = ohash
                r["duck_hash_arrow"] = oahash
                r["fetch_paths_agree"] = oahash == ohash
                r["spark_dtypes"] = dict(sdf.dtypes)
                r["duck_types"] = [
                    [d[0], str(d[1])] for d in (rel.description or [])
                ]
                # canonical-line samples even on match: if the driver's
                # gate still reports red while this says green, the
                # recorded lines name the byte-level difference
                r["sample_lines"] = [
                    s.replace("\x1f", "|")[:160] for s in slines[:2]
                ]
                if not r["hash_match"]:
                    sset, oset = set(slines), set(olines)
                    r["spark_only"] = [
                        s.replace("\x1f", "|")[:160]
                        for s in sorted(sset - oset)[:4]
                    ]
                    r["duck_only"] = [
                        s.replace("\x1f", "|")[:160]
                        for s in sorted(oset - sset)[:4]
                    ]
            except Exception as e:
                r["err"] = repr(e)[:300]
            out[name] = r
        con.close()
    except Exception as e:
        out["__err__"] = repr(e)[:300]
    return out


def maybe_probe(name: str, spark, sf_dir: str) -> None:
    """Per-query hook (registry wrapper): at the correctness SF, run the
    in-process comparison once per process for this query and append the
    result to ENVPROBE.jsonl."""
    if name in _probed or not _is_correctness_dir(sf_dir):
        return
    if not _enabled():
        return
    _probed.add(name)
    try:
        res = inproc_check(spark, sf_dir, names=[name])
        line = {"kind": "query", "name": name, "wall": time.time()}
        line.update(res.get(name, {}))
        _append(line)
    except Exception:
        pass
