#!/usr/bin/env python
"""Probe-coverage table: every registered query × its best-known scale
slope (VERDICT r9 #3 — "so round 11+ stops rediscovering the frontier").

Sources, in precedence order:

1. ``PROBES.jsonl`` — the machine ledger ``tools/scale_probe.py`` has
   appended to since round 10.  The freshest record at the WIDEST top
   decade wins; records with an answer-shaping lever engaged (band
   cap, or a pair bound other than scale_probe's standard fail-loud
   backstop) are reported with the lever noted (they measure the
   mitigated plan, not default semantics).
2. ``_PROSE_SLOPES`` below — the hand-carried history of rounds 5-9,
   when probe results lived only in SCALING.md prose/tables.  Each
   entry cites its round and fixture decade so a stale number is
   visibly stale rather than silently authoritative.

Queries in neither source print ``unprobed`` — the explicit work list.

Usage: python tools/probe_coverage.py [--markdown]
Exit code 0 always (diagnostic, not a gate).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Best-known slopes recorded in SCALING.md rounds 5-9 (before the
# machine ledger existed).  Value: (slope, "sfA→sfB", "rN", note).
# 33-word default fixture unless noted; see SCALING.md for the walls.
_PROSE_SLOPES: dict[str, tuple[float, str, str, str]] = {
    # --- sf3→sf10 decade (rounds 8-9) ---
    "tpch_q9": (0.37, "sf3→sf10", "r8", "constant-dominated"),
    "events_sessionize": (0.30, "sf3→sf10", "r8", ""),
    "knn_batch_ann": (0.60, "sf3→sf10", "r8", ""),
    "global_quantiles": (0.81, "sf3→sf10", "r8", ""),
    "text_search_bm25": (0.98, "sf3→sf10", "r8", ""),
    "dedup_near": (1.08, "sf3→sf10", "r8", "0.89 on 20k-word vocab (r9)"),
    "semantic_dedup": (1.46, "sf3→sf10", "r8", "uncapped verification twin; capped form is the production path"),
    "semantic_dedup_capped": (0.57, "sf3→sf10", "r9", ""),
    "dup_span_stats": (0.67, "sf3→sf10", "r8", ""),
    "dup_span_removal": (1.11, "sf3→sf10", "r9", "per-stage ≤1.0; composite at host noise floor"),
    "decontaminate": (0.81, "sf3→sf10", "r8", ""),
    "fuzzy_vocab_join": (0.96, "sf3→sf10", "r8", ""),
    "dedup_incremental": (1.17, "sf3→sf10", "r8", "0.87 on 20k-word vocab (r9)"),
    "streaming_sessionize_python": (1.08, "sf3→sf10", "r9", ""),
    "knn_batch_ivfpq": (1.05, "sf3→sf10", "r8", "search-only 0.20 (r9, train factored out)"),
    "lineitem_quantiles": (1.1, "sf3→sf10", "r9", "window order-stats form"),
    "events_outliers_p99": (0.35, "sf3→sf10", "r9", "ranged order-stats form"),
    "quality_quantile_filter": (0.86, "sf3→sf10", "r9", ""),
    "minhash_calibration": (1.20, "sf3→sf10", "r9", "output-bound; 0.81 on 20k-word"),
    "split_leakage_quarantine": (1.77, "sf3→sf10", "r9", "rep-verify on slope-2.0 candidates; 0.82 on 20k-word"),
    "split_leakage_audit": (1.05, "sf3→sf10", "r9", "0.81 on 20k-word"),
    "events_range_join": (0.23, "sf3→sf10", "r9", ""),
    "lineitem_cube": (0.54, "sf3→sf10", "r9", ""),
    "events_pivot": (0.10, "sf3→sf10", "r9", ""),
    "curriculum_deciles": (0.90, "sf3→sf10", "r9", ""),
    "versioned_table_diff": (0.89, "sf3→sf10", "r9", ""),
    "skew_salted_join": (0.14, "sf3→sf10", "r9", ""),
    "tpch_q21": (1.13, "sf3→sf10", "r9", "sub-40s wall, noise band"),
    "tpch_q17": (0.89, "sf3→sf10", "r9", ""),
    "tpch_q20": (-0.19, "sf3→sf10", "r9", ""),
    "hybrid_search_rrf": (0.80, "sf3→sf10", "r9", ""),
    "router_knn_batch": (0.16, "sf3→sf10", "r9", ""),
    "doc_keywords_tfidf": (1.12, "sf3→sf10", "r9", "sub-40s wall, noise band"),
    "cross_source_overlap": (0.93, "sf3→sf10", "r9", ""),
    "kmv_join_cardinality": (0.83, "sf3→sf10", "r9", ""),
    "heavy_hitters": (1.05, "sf3→sf10", "r9", "sub-40s wall, noise band"),
    "streaming_cms_freq": (0.45, "sf3→sf10", "r9", ""),
    "doc_chunking": (0.86, "sf3→sf10", "r9", ""),
    # --- sf1→sf3 decade (rounds 7-8) ---
    "tpch_q1": (0.20, "sf1→sf3", "r7", ""),
    "graph_pagerank": (1.04, "sf1→sf3", "r7", "|E| shuffle per round — corpus-linear"),
    "seq_packing": (0.93, "sf1→sf3", "r7", ""),
    "knn_batch": (0.69, "sf1→sf3", "r7", ""),
    "knn_batch_ivf": (0.48, "sf1→sf3", "r8", "build + search"),
    "hll_distinct": (0.22, "sf1→sf3", "r7", ""),
    "gopher_rules_report": (0.86, "sf1→sf3", "r7", ""),
    "events_funnel": (0.39, "sf1→sf3", "r7", ""),
    "events_retention_cohorts": (0.23, "sf1→sf3", "r7", ""),
    "streaming_window_agg": (-0.26, "sf1→sf3", "r7", ""),
    "bpe_train_merges": (0.85, "sf1→sf3", "r7", ""),
    "quality_score_auc": (0.68, "sf1→sf3", "r7", ""),
    "dedup_simhash": (2.39, "sf1→sf3", "r7", "33-word hamming≤7 answers are inherently quadratic; max_pairs guard + documented"),
    "dedup_ngram": (0.85, "sf1→sf3", "r7", "collapsed form"),
    "doc_mixture_sample": (0.30, "sf1→sf3", "r7", ""),
    "k_anonymity_audit": (0.11, "sf1→sf3", "r7", ""),
    "mmr_rerank": (0.60, "sf1→sf3", "r8", ""),
    "late_interaction_maxsim": (0.92, "sf1→sf3", "r8", ""),
    "quality_calibration_report": (1.07, "sf1→sf3", "r8", ""),
    "streaming_stream_join": (0.47, "sf1→sf3", "r8", "uniform users; zipf-0.7 arm 1.66 with output slope 1.38 — output-bound, documented"),
    "dedup_quality_survivors": (1.00, "sf1→sf3", "r8", ""),
    "knn_batch_ivf_kmeans": (0.45, "sf1→sf3", "r8", ""),
    "streaming_sketch_distinct": (0.49, "sf1→sf3", "r8", ""),
    "hard_negatives": (0.68, "sf1→sf3", "r8", ""),
    "streaming_psi_drift": (0.54, "sf1→sf3", "r8", ""),
    "streaming_dedup": (0.98, "sf1→sf3", "r8", ""),
    "dedup_embed": (0.53, "sf1→sf3", "r8", "post dense-cluster fix"),
    # --- sf0.1→sf1 decade (round 7) ---
    "user_rfm_segments": (-0.13, "sf0.1→sf1", "r7", ""),
    "knn_batch_ivf_persisted": (-0.06, "sf0.1→sf1", "r7", ""),
    "knn_batch_ivf_appended": (0.29, "sf0.1→sf1", "r7", "index build + time-travel I/O floor"),
    # --- sf0.01→sf0.1 decade (rounds 5-6; weak signal, constant-dominated) ---
    "knn_topk": (0.01, "sf0.01→sf0.1", "r5", ""),
    "knn_batch_prenorm": (0.20, "sf0.01→sf0.1", "r5", ""),
    "training_shards": (0.16, "sf0.01→sf0.1", "r5", ""),
    "bloom_semi_join": (0.36, "sf0.01→sf0.1", "r5", ""),
    "events_value_trend": (0.11, "sf0.01→sf0.1", "r5", ""),
    "quality_weighted_sample": (0.20, "sf0.01→sf0.1", "r6", ""),
    "embedding_pca_anisotropy": (-0.08, "sf0.01→sf0.1", "r6", ""),
    "bigram_lm_score": (0.14, "sf0.01→sf0.1", "r6", ""),
    "events_psi_drift": (0.23, "sf0.01→sf0.1", "r6", ""),
    "sliding_distinct_users": (0.01, "sf0.01→sf0.1", "r6", ""),
    "token_zipf_fit": (0.32, "sf0.01→sf0.1", "r6", ""),
    "knn_batch_pq": (0.10, "sf0.01→sf0.1", "r6", ""),
    "cms_freq_estimate": (0.24, "sf0.01→sf0.1", "r6", ""),
    "lineitem_profile": (0.25, "sf0.01→sf0.1", "r6", ""),
    "sampled_global_quantiles": (0.39, "sf0.01→sf0.1", "r6", ""),
    "lang_temperature_mix": (0.10, "sf0.01→sf0.1", "r6", ""),
    "events_cusum_changepoint": (-0.01, "sf0.01→sf0.1", "r6", ""),
    "events_last_touch_attribution": (0.17, "sf0.01→sf0.1", "r6", ""),
    "events_ab_test_report": (0.03, "sf0.01→sf0.1", "r6", ""),
    "ann_ndcg_report": (-0.25, "sf0.01→sf0.1", "r6", ""),
    "quality_linear_probe": (0.12, "sf0.01→sf0.1", "r6", ""),
}


def _top_sf(sfs: list[float]) -> float:
    return sfs[-1] if sfs else 0.0


def ledger_best(path: str) -> dict[str, dict]:
    """Best ledger record per query: prefer highest top-sf, then most
    recent.  Lever-engaged records only win over default-path records
    at the same or higher top-sf (they measure the mitigated plan)."""
    best: dict[str, dict] = {}
    if not os.path.exists(path):
        return best
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if rec.get("slope_top_decade") is None:
                continue
            cur = best.get(rec["query"])
            if cur is None or _top_sf(rec["sfs"]) > _top_sf(cur["sfs"]) or (
                _top_sf(rec["sfs"]) == _top_sf(cur["sfs"])
                and rec.get("ts", "") >= cur.get("ts", "")
            ):
                best[rec["query"]] = rec
    return best


def main() -> int:
    import __spark_entry__ as entry

    names = list(entry.queries())
    led = ledger_best(os.path.join(REPO, "PROBES.jsonl"))
    rows = []
    n_unprobed = 0
    for name in names:
        rec = led.get(name)
        if rec is not None:
            sfs = rec["sfs"]
            lever = []
            if rec.get("band_cap"):
                lever.append(f"band_cap={rec['band_cap']}")
            # pair_bound=100000000 is scale_probe's standard fail-loud
            # backstop (never shapes an answer that produced a slope —
            # it can only raise); note only a NON-standard bound
            if rec.get("pair_bound") and rec["pair_bound"] != "100000000":
                lever.append(f"pair_bound={rec['pair_bound']}")
            decade = (
                f"sf{sfs[-2]:g}→sf{sfs[-1]:g}" if len(sfs) >= 2 else "?"
            )
            rows.append(
                (name, f"{rec['slope_top_decade']:.2f}", decade,
                 "ledger", " ".join(lever))
            )
        elif name in _PROSE_SLOPES:
            slope, decade, rnd, note = _PROSE_SLOPES[name]
            rows.append((name, f"{slope:.2f}", decade, rnd, note))
        else:
            rows.append((name, "unprobed", "—", "—", ""))
            n_unprobed += 1
    print("| query | slope | decade | source | note |")
    print("|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(r) + " |")
    print(
        f"\n{len(names)} registered; {len(names) - n_unprobed} probed, "
        f"{n_unprobed} unprobed",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
