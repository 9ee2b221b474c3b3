"""Summarize ENVPROBE.jsonl — the round-5 driver-environment probe log.

Usage:  python tools/envprobe_diff.py [path]

Groups the appended lines into environment fingerprints (kind=env) and
per-query in-process comparisons (kind=query), then:

* prints every fingerprint key whose value DIFFERS across any two
  recorded environments (the candidate cause of a driver-only oracle
  divergence — see VERDICT r4 "What's wrong" #1);
* prints each watched query's in-process verdicts per environment, so a
  query that matched IN-PROCESS during a driver run that its gate
  flagged red localizes the divergence to the harness's comparison
  layer rather than the engines.

Pure stdlib; read-only.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

IGNORE = {"wall", "sf_dir"}  # always differ; carry no signal


def main() -> int:
    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ENVPROBE.jsonl",
        )
    )
    envs: list[dict] = []
    queries: dict[str, list[dict]] = defaultdict(list)
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if not ln:
                continue
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                print(f"  (unparseable line skipped: {ln[:80]}…)")
                continue
            if d.get("kind") == "env":
                envs.append(d)
            elif d.get("kind") == "query":
                queries[d.get("name", "?")].append(d)

    print(f"{len(envs)} environment fingerprints, "
          f"{sum(map(len, queries.values()))} query probes for "
          f"{len(queries)} queries\n")

    # data checksums legitimately differ across SF dirs — compare only
    # within one directory's fingerprints
    by_sf: dict[str, list[dict]] = defaultdict(list)
    for e in envs:
        by_sf[os.path.basename(os.path.normpath(e.get("sf_dir", "?")))].append(e)
    for sf, group in sorted(by_sf.items()):
        keys = sorted({k for e in group for k in e} - IGNORE)
        diff_keys = [
            k
            for k in keys
            if len(
                {
                    json.dumps(e.get(k), default=str, sort_keys=True)
                    for e in group
                }
            )
            > 1
        ]
        print(
            f"== {sf}: fingerprint keys differing across its "
            f"{len(group)} environments =="
        )
        if not diff_keys:
            print("  (none — every recorded environment is identical)")
        for k in diff_keys:
            vals: dict[str, list[int]] = defaultdict(list)
            for i, e in enumerate(group):
                vals[repr(e.get(k))].append(i)
            print(f"  {k}:")
            for v, idxs in vals.items():
                print(f"    {v}  (env {idxs[:8]}{'…' if len(idxs) > 8 else ''})")
        print()

    if queries:
        print("== per-query in-process verdicts ==")
        for name in sorted(queries):
            for d in queries[name]:
                verdict = (
                    "ERR " + str(d.get("err"))[:80]
                    if "err" in d
                    else ("match" if d.get("hash_match") else "MISMATCH")
                )
                extra = ""
                if d.get("spark_only") or d.get("duck_only"):
                    extra = (
                        f"  spark_only={d.get('spark_only')}"
                        f"  duck_only={d.get('duck_only')}"
                    )
                print(
                    f"  {name:34s} wall={d.get('wall', 0):.0f} "
                    f"rows={d.get('spark_rows')}/{d.get('duck_rows')} "
                    f"{verdict}{extra}"
                )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
