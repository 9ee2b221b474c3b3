"""Training-data pipeline operators: deterministic dataset splitting
and token-window document chunking.

Both are pure JVM-side expression compositions (no Python UDFs) whose
outputs are content-addressed — a row's split assignment and a doc's
chunk boundaries depend only on the data, never on partitioning, task
order, or a random seed's partition placement.  That is the property a
100 TB training pipeline actually needs: re-running the job, adding
executors, or re-partitioning the input must not move examples between
train and validation (``sample()``'s Bernoulli draw is seeded per
partition and does exactly that).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from merkonvectordb_spark.functions.hashing import md5_hash60

# md5-derived 60-bit uniform hash — same construct as operators.sketch,
# expressible identically in DuckDB for oracle parity.
def _hash60(col: Column) -> Column:
    return md5_hash60(col)


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, int],
    salt: str = "",
) -> DataFrame:
    """Assign every row to a named split by hashing its key.

    ``splits`` maps name → integer weight (e.g. ``{"train": 90,
    "val": 5, "test": 5}``); a row lands in the split owning its hash
    bucket ``h % total_weight``.  Deterministic, partition-independent,
    and stable across reruns — and because the assignment is a pure
    function of the key, a document's chunks/augmentations hash to the
    same split as their parent when keyed consistently.  ``salt``
    re-deals the assignment without touching the data.

    Adds a ``split`` column; no shuffle (a projection over the scan).
    """
    total = sum(splits.values())
    if total <= 0 or any(w < 0 for w in splits.values()):
        raise ValueError("split weights must be non-negative with a positive sum")
    bucket = F.pmod(_hash60(F.concat(F.col(key_col).cast("string"), F.lit(salt))), F.lit(total))
    expr = None
    lo = 0
    for name, w in splits.items():
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn("split", expr)


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode documents into overlapping token windows (context-window
    chunking for LLM training): whitespace tokens, chunks of ``window``
    tokens every ``stride`` (overlap = window − stride).

    Shape: tokenize once, generate chunk starts with ``sequence`` (a
    row generator, not a per-element lambda — HOF array *builders* are
    CodegenFallback, see functions/text.py), explode, then ``slice`` +
    ``concat_ws`` rebuild each chunk.  Cost is rows × tokens/stride —
    linear, no shuffle; every downstream op sees one row per chunk.
    """
    if window <= 0 or stride <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    out = (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .withColumn("__toks", toks)
        .withColumn(
            "__start",
            # last start = the first stride multiple whose window reaches
            # the document end; going further emits tail chunks that are
            # pure suffixes of the previous chunk (duplicated tokens)
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.when(
                        F.size("__toks") <= window, F.lit(0)
                    ).otherwise(
                        F.floor(
                            (F.size("__toks") - window + stride - 1)
                            / stride
                        ).cast("int")
                        * stride
                    ),
                    F.lit(stride),
                )
            ),
        )
    )
    return (
        out.select(
            *df.columns,
            (F.col("__start") / stride).cast("bigint").alias("chunk_idx"),
            F.least(
                F.lit(window), F.size("__toks") - F.col("__start")
            ).alias("chunk_tokens"),
            F.concat_ws(
                " ", F.slice("__toks", F.col("__start") + 1, window)
            ).alias("chunk_text"),
        )
    )


def global_exclusive_prefix_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "run_start",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive running total of ``value_col`` in the total order given
    by ``order_cols`` — WITHOUT the single-reducer global window that
    ``sum() OVER (ORDER BY ...)`` plans (one task holding 100 TB).

    Distributed two-pass shape (same as ``operators.stats``):

    1. range-partition + sort on ``order_cols`` — global order becomes
       (partition, local position); the within-partition running sum is
       a linear streamed pass (``mapInPandas`` over already-sorted rows,
       no window, no second shuffle);
    2. per-partition value totals go to the driver (P numbers, not
       data), prefix-summed into partition offsets, and re-applied as a
       literal projection.

    Result is independent of where the sampled range boundaries land —
    any split of a total order yields the same exclusive prefix sum —
    so the output is deterministic and re-run-stable.

    Preconditions: ``order_cols`` must be a total order (unique key) and
    ``value_col`` non-null; both hold for (doc, chunk) token streams.
    """
    import pandas as pd

    spark = df.sparkSession
    par = num_partitions or spark.sparkContext.defaultParallelism
    cols = list(order_cols)
    part = (
        df.repartitionByRange(par, *[F.asc(c) for c in cols])
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    schema = StructType(
        list(part.schema.fields) + [StructField("__lcum", LongType())]
    )

    def _cum(batches):
        run = 0
        for pdf in batches:
            pdf = pdf.copy()
            c = pdf[value_col].astype("int64").cumsum() + run
            pdf["__lcum"] = c
            if len(pdf):
                run = int(c.iloc[-1])
            yield pdf

    # one partition-local scan produces the running sums; localCheckpoint
    # (eager) because both the offset collect and the caller consume it:
    # it materializes once like persist, but the blocks free when the
    # frame is garbage-collected instead of pinning the cache registry
    # for the session's lifetime (this runs once per bulk upsert / per
    # packed split)
    ranked = part.mapInPandas(_cum, schema).localCheckpoint(eager=True)
    totals = {
        r["__pid"]: r["s"] or 0
        for r in ranked.groupBy("__pid")
        .agg(F.sum(F.col(value_col).cast("bigint")).alias("s"))
        .collect()
    }
    offset_of: dict[int, int] = {}
    running = 0
    for pid in sorted(totals):
        offset_of[pid] = running
        running += int(totals[pid])
    # Attach the P partition offsets with a BROADCAST JOIN on __pid, not
    # a when(pid==0,off0).when(pid==1,...) Column chain: a linear arm
    # per shuffle partition makes plan build/codegen time grow with P
    # (the repo's documented hundred-arm Column-tree trap) — at a
    # 1000-executor cluster P is in the thousands.  The offsets frame is
    # P rows of driver metadata either way; the join keeps the PLAN
    # size O(1) in P.
    offsets = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offset_of.items()],
        "__pid INT, __poff BIGINT",
    )
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out_col,
            (
                F.col("__poff")
                + F.col("__lcum")
                - F.col(value_col).cast("bigint")
            ).cast("bigint"),
        )
        .drop("__pid", "__lcum", "__poff")
    )


def grouped_exclusive_prefix_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "run_start",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group exclusive running totals in ONE corpus shuffle — the
    grouped form of ``global_exclusive_prefix_sum``.

    Calling the global form once per group re-shuffles the corpus
    |groups| times (``prepare_training_shards`` did exactly that, once
    per train/val/test split).  Here the range partitioning is on
    (group, order) together, the streamed within-partition pass resets
    its running counter at group boundaries (carrying it across Arrow
    chunks of the same group), and the per-(partition, group) totals are
    prefix-summed per group with a tiny window (P·G rows, partitioned by
    group — never single-partition) and re-attached via a broadcast
    join.  Determinism argument is unchanged: each group's rows form a
    total order, and an exclusive prefix sum is independent of where
    range boundaries land.
    """
    import pandas as pd

    spark = df.sparkSession
    par = num_partitions or spark.sparkContext.defaultParallelism
    gcols = list(group_cols)
    cols = list(order_cols)
    if not gcols:
        return global_exclusive_prefix_sum(
            df, cols, value_col, out_col, num_partitions
        )
    part = (
        df.repartitionByRange(par, *[F.asc(c) for c in gcols + cols])
        .sortWithinPartitions(*gcols, *cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    schema = StructType(
        list(part.schema.fields) + [StructField("__lcum", LongType())]
    )

    def _keys_eq(a, b) -> bool:
        # NULL group values surface as None/NaN in pandas, and NaN !=
        # NaN — treat null==null as equal (a NULL group is a group)
        return all(
            (pd.isna(x) and pd.isna(y)) or x == y for x, y in zip(a, b)
        )

    def _cum(batches):
        prev_key = None
        prev_run = 0
        for pdf in batches:
            pdf = pdf.copy()
            if not len(pdf):
                pdf["__lcum"] = pd.Series([], dtype="int64")
                yield pdf
                continue
            v = pdf[value_col].astype("int64")
            # dropna=False: a NULL group key is a group like any other;
            # the default silently drops those rows from the cumsum,
            # leaving NaN in an int64 output column
            c = v.groupby(
                [pdf[g] for g in gcols], sort=False, dropna=False
            ).cumsum()
            first = tuple(pdf[g].iloc[0] for g in gcols)
            if prev_key is not None and _keys_eq(first, prev_key):
                # the chunk opens mid-group: its leading (contiguous,
                # sorted) run of `first` rows continues the carried
                # total.  Per-column masks, not Series-of-tuples ==
                # tuple (pandas treats a tuple scalar as array-like in
                # some versions); NaN keys match via isna.
                mask = None
                for g, val in zip(gcols, first):
                    m = pdf[g].isna() if pd.isna(val) else (pdf[g] == val)
                    mask = m if mask is None else (mask & m)
                c = c + mask.astype("int64") * prev_run
            pdf["__lcum"] = c
            prev_key = tuple(pdf[g].iloc[-1] for g in gcols)
            prev_run = int(c.iloc[-1])
            yield pdf

    ranked = part.mapInPandas(_cum, schema).localCheckpoint(eager=True)
    totals = ranked.groupBy("__pid", *gcols).agg(
        F.sum(F.col(value_col).cast("bigint")).alias("__ptot")
    )
    w = (
        Window.partitionBy(*gcols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__poff", F.coalesce(F.sum("__ptot").over(w), F.lit(0))
    ).select("__pid", *gcols, "__poff")
    # eqNullSafe on the group columns: a plain equi-join would silently
    # drop every NULL-keyed group's rows (NULL never equals NULL in a
    # join), while groupBy/Window above DO keep the NULL group
    rj = ranked.alias("__r")
    oj = F.broadcast(offsets.alias("__o"))
    cond = F.col("__r.__pid") == F.col("__o.__pid")
    for g in gcols:
        cond = cond & F.col(f"__r.{g}").eqNullSafe(F.col(f"__o.{g}"))
    return (
        rj.join(oj, cond)
        .select("__r.*", F.col("__o.__poff"))
        .withColumn(
            out_col,
            (
                F.col("__poff")
                + F.col("__lcum")
                - F.col(value_col).cast("bigint")
            ).cast("bigint"),
        )
        .drop("__pid", "__lcum", "__poff")
    )


def pack_sequences(
    df: DataFrame,
    order_cols: Sequence[str],
    tokens_col: str,
    budget: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Concat-and-split sequence packing (GPT-style pretraining): lay the
    chunks out as one global token stream in ``order_cols`` order and cut
    a training sequence every ``budget`` tokens.  Documents may straddle
    a cut — that is the semantics that wastes zero pad tokens.

    Adds ``seq_id`` (which training sequence this chunk starts in),
    ``seq_offset`` (token position within it), and ``straddles``
    (whether the chunk crosses the next cut).  Content-addressed via the
    deterministic prefix sum: reruns, resizes, and repartitioning cannot
    move a chunk between sequences.

    ``group_cols`` packs each group as its own independent token stream
    (seq_id restarts at 0 per group) in ONE corpus shuffle — the form
    ``prepare_training_shards`` uses to pack all splits at once instead
    of re-shuffling the corpus per split.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    out = grouped_exclusive_prefix_sum(
        df, group_cols, order_cols, tokens_col, out_col="__gstart"
    )
    start = F.col("__gstart")
    toks = F.col(tokens_col).cast("bigint")
    return (
        out.withColumn("seq_id", F.floor(start / budget))
        .withColumn("seq_offset", start % budget)
        .withColumn(
            "straddles",
            F.floor((start + toks - F.lit(1)) / budget) > F.col("seq_id"),
        )
        .drop("__gstart")
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its key's
    hash bucket (out of 1e6) falls under the stratum's rate.

    The properties ``sample()`` cannot give a 100 TB curation pipeline:
    partition-invariant (the keep/drop decision is a pure function of
    the key, so adding executors or re-running cannot change the
    sample), consistent (the same key is kept in every derived table
    keyed the same way), and auditable (the rate is exact arithmetic,
    not a per-partition Bernoulli draw).  ``salt`` draws an independent
    sample.  Pure projection+filter — no shuffle, fully pushed past the
    scan's column pruning.
    """
    denom = 1_000_000
    for name, r in list(rates.items()) + [("<default>", default_rate)]:
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {name!r} must be in [0, 1]")
    expr: Column | None = None
    for name, r in rates.items():
        cond = F.col(strata_col) == name
        thr = int(round(r * denom))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    thr_col = (
        expr.otherwise(int(round(default_rate * denom)))
        if expr is not None
        else F.lit(int(round(default_rate * denom)))
    )
    bucket = F.pmod(
        _hash60(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        F.lit(denom),
    )
    return df.where(bucket < thr_col)


def hash_sample_k(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    k: int,
    salt: str = "",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, deterministically:
    rows rank within their stratum by ``(hash60(key‖salt), key)`` and
    ranks > k drop.  The fixed-COUNT twin of ``stratified_sample``'s
    fixed-RATE keep ("exactly 10k eval docs per language" vs "keep 3% of
    this source") — same guarantees: partition-invariant, re-run-stable,
    salt re-deals, and growing the corpus only ever *replaces* sampled
    rows (a kept key stays kept unless enough smaller hashes arrive).

    Scale shape: rank ≤ k over a per-stratum window plans as
    WindowGroupLimit with a PARTIAL pass below the exchange (Spark
    ≥3.5), so each map task forwards at most k rows per stratum it sees
    — the shuffle carries ≤ k·P rows per stratum, never the stratum.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    h = _hash60(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    # filter on the RAW row_number attribute (the bigint cast would mask
    # the rank-limit pattern from InferWindowGroupLimit); widen after
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .withColumn(rank_col, F.col("__rk").cast("bigint"))
        .drop("__rk")
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    tokens_col: str,
    weights: dict[str, int],
    budget_tokens: int,
    salt: str = "",
) -> DataFrame:
    """Downsample each stratum toward a token-budget mixture: stratum
    ``s`` with integer weight ``w_s`` targets ``budget · w_s / Σw``
    tokens, so its keep-rate is ``min(1, target_s / tokens_s)`` where
    ``tokens_s`` is the stratum's actual token mass.

    The rate is never materialized as a float: a row survives iff

        bucket(key) · Σw · tokens_s  <  budget · w_s · 10^6

    — exact wide-integer arithmetic (DECIMAL(38,0) here, HUGEINT in the
    DuckDB oracle; BIGINT would overflow once Σw · tokens_s passes
    ~9·10^12), so the surviving set is bit-exactly reproducible in any
    engine, and when a stratum is under its target (rate ≥ 1) the
    inequality holds for every bucket and the stratum passes through
    whole.  Two scans: a per-stratum token aggregation (tiny result,
    broadcast back) and the filter pass; the filter itself is a
    projection — no shuffle of the data.

    This is the "mix web/code/wiki at 70/20/10 into a 1T-token run"
    operator; sampling is consistent per key, so reruns and resizes
    select the same documents.
    """
    if budget_tokens < 0 or any(w < 0 for w in weights.values()):
        raise ValueError("budget and weights must be non-negative")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must have a positive sum")
    denom = 1_000_000
    mass = df.groupBy(F.col(strata_col).alias("__s")).agg(
        F.sum(F.col(tokens_col).cast("bigint")).alias("__mass")
    )
    w_expr: Column | None = None
    for name, w in weights.items():
        cond = F.col(strata_col) == name
        w_expr = F.when(cond, w) if w_expr is None else w_expr.when(cond, w)
    weight = (
        w_expr.otherwise(0) if w_expr is not None else F.lit(0)
    ).cast("bigint")
    bucket = F.pmod(
        _hash60(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        F.lit(denom),
    )
    joined = df.join(
        F.broadcast(mass), F.col(strata_col) == F.col("__s"), "left"
    )
    wide = "decimal(38,0)"
    keep = (
        bucket.cast(wide)
        * F.lit(total_w).cast(wide)
        * F.coalesce(F.col("__mass"), F.lit(0)).cast(wide)
    ) < (
        F.lit(budget_tokens).cast(wide)
        * weight.cast(wide)
        * F.lit(denom).cast(wide)
    )
    return joined.where(keep).drop("__s", "__mass")


def temperature_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    tokens_col: str,
    budget_tokens: int,
    salt: str = "",
) -> DataFrame:
    """Temperature-scaled mixture sampling at T=2: stratum ``s`` with
    token mass ``m_s`` targets a share proportional to ``m_s^(1/T)``
    — the standard multilingual-pretraining re-balancer (smaller
    languages are UP-weighted relative to their raw mass; raw
    proportional sampling is the T=1 degenerate case ``mixture_sample``
    already covers with explicit weights).

    Unlike ``mixture_sample`` the weights are DATA-DERIVED inside the
    plan: ``w_s = floor(sqrt(m_s))``.  ``isqrt`` is exact cross-engine
    for ``m_s < 2^53`` — IEEE double sqrt is correctly rounded, so
    ``floor(sqrt(BIGINT))`` agrees bit-for-bit between Spark and any
    oracle engine.  The survival test then reuses the wide-integer
    mixture inequality (DECIMAL(38,0); BIGINT would overflow once
    Σw·m_s passes ~9·10^12):

        bucket(key) · Σw · m_s  <  budget · w_s · 10^6

    so the surviving set is bit-exactly reproducible, and a stratum
    under its target (rate ≥ 1) passes through whole.  A stratum whose
    target exceeds its mass simply keeps everything — the excess budget
    is NOT re-distributed (single-pass, no waterfilling loop); the
    caller sees the shortfall in the kept-token counts.

    NULL strata are DROPPED (ADVICE r6): a NULL ``strata_col`` misses
    the equi-join on ``__s`` (NULL never equals NULL in SQL), the
    coalesced mass/weight become 0, and ``0 < 0`` is false — exactly
    what the inner-join oracle computes, but it is caller-facing row
    loss, so it is contract, not accident.  Route NULLs to a sentinel
    stratum (e.g. ``coalesce(lang, '__unknown')``) upstream if they
    must participate in the budget.

    Scale shape: one per-stratum aggregation (|strata|-row result,
    broadcast back) + a 1-row total joined the same way; the filter is
    a pure projection over the corpus — no data shuffle.
    """
    if budget_tokens < 0:
        raise ValueError("budget must be non-negative")
    denom = 1_000_000
    mass = df.groupBy(F.col(strata_col).alias("__s")).agg(
        F.sum(F.col(tokens_col).cast("bigint")).alias("__mass")
    )
    weighted = mass.withColumn(
        "__w", F.floor(F.sqrt(F.col("__mass").cast("double"))).cast("bigint")
    )
    totals = weighted.agg(F.sum("__w").alias("__wsum"))
    bucket = F.pmod(
        _hash60(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        F.lit(denom),
    )
    joined = df.join(
        F.broadcast(weighted), F.col(strata_col) == F.col("__s"), "left"
    ).crossJoin(F.broadcast(totals))
    wide = "decimal(38,0)"
    keep = (
        bucket.cast(wide)
        * F.coalesce(F.col("__wsum"), F.lit(0)).cast(wide)
        * F.coalesce(F.col("__mass"), F.lit(0)).cast(wide)
    ) < (
        F.lit(budget_tokens).cast(wide)
        * F.coalesce(F.col("__w"), F.lit(0)).cast(wide)
        * F.lit(denom).cast(wide)
    )
    return joined.where(keep).drop("__s", "__mass", "__w", "__wsum")


def prepare_training_shards(
    docs: DataFrame,
    quality_min: float = 0.5,
    splits: dict[str, int] | None = None,
    window: int = 64,
    stride: int = 48,
    budget: int = 256,
    seqs_per_shard: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """The end-to-end corpus→shards pipeline a pretraining run actually
    executes, composed from this package's operators:

    1. quality gate (scan-local score ≥ ``quality_min``);
    2. exact-dedup survivors (min-id per content fingerprint);
    3. deterministic train/val/test assignment (content-addressed hash —
       a document's chunks inherit its split by construction);
    4. context-window chunking (``window`` tokens every ``stride``);
    5. concat-and-split packing into ``budget``-token sequences, PER
       SPLIT (sequence numbering restarts per split — val sequences
       can't straddle into train);
    6. shard assignment: ``shard_id = seq_id // seqs_per_shard`` — the
       file-granularity a dataloader consumes.

    Every stage is deterministic and content-addressed: reruns,
    repartitioning, and cluster resizes reproduce byte-identical shard
    assignments, which is what makes checkpoint-resume across pipeline
    re-executions safe.

    Scale shape: stages 1-4 are scan-local projections/filters plus one
    fingerprint window; packing is the range-partitioned two-pass
    GROUPED prefix sum — all splits in one corpus shuffle (the former
    per-split loop re-shuffled the corpus |splits| times).
    """
    from merkonvectordb_spark.functions.text import quality_score
    from merkonvectordb_spark.operators.dedup import keep_survivors

    if seqs_per_shard <= 0:
        raise ValueError("seqs_per_shard must be positive")
    splits = splits or {"train": 90, "val": 5, "test": 5}
    gated = docs.where(quality_score(F.col(text_col)) >= F.lit(quality_min))
    surv = keep_survivors(gated, text_col, id_col)
    assigned = hash_split(surv, id_col, splits, salt=salt)
    # ALL splits pack in ONE corpus shuffle: the grouped prefix sum
    # range-partitions on (split, doc, chunk) together and restarts each
    # split's token stream at 0 — identical output to packing each split
    # separately, minus |splits|-1 corpus re-shuffles (the old per-split
    # loop's cost; at 100 TB each re-shuffle is the dominant term)
    chunks = chunk_tokens(
        assigned.select(id_col, "split", text_col), text_col, window, stride
    ).drop(text_col)
    packed = pack_sequences(
        chunks,
        (id_col, "chunk_idx"),
        "chunk_tokens",
        budget=budget,
        group_cols=("split",),
    )
    return packed.withColumn(
        "shard_id", (F.col("seq_id") / seqs_per_shard).cast("bigint")
    )


def weighted_sample_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Exactly ``min(k, n)`` rows sampled WITHOUT replacement with
    probability proportional to ``weight_col`` — the Efraimidis &
    Spirakis (2006) A-ES exponential race, derandomized: each row's
    uniform draw comes from the shared 60-bit content hash, its race
    key is ``ln(u)/w`` (the log of ``u^(1/w)``), and the global top-k
    by key wins.  "Sample 100k docs, quality-weighted" — the curation
    step between scoring and training-set assembly.

    Same determinism contract as ``hash_sample_k``: partition-invariant,
    re-run-stable, ``salt`` re-deals.  Rows with NULL or non-positive
    weight never sample (a zero-weight row has race key -inf).

    Weights must be an INTEGRAL column (the house integer-units rule —
    scale scores once, e.g. ``floor(quality·10⁶ + 0.5)``): a fractional
    weight column raises rather than silently truncating to 0 in the
    bigint cast, which would filter out every row with weight < 1 and
    return a short/empty "sample" with no error.

    Determinism across engines: ``u = (h + 0.5) / 2^60`` is exact IEEE
    arithmetic on identical inputs; ``ln(u)`` is the one libm call, so
    it is micro-rounded to BIGINT per row (the PMI/Zipf precedent)
    before the final exact double division by the integer weight.

    Scale shape: the race key is scan-local (no shuffle); the global
    top-k plans as TakeOrderedAndProject (per-partition heaps, driver
    merges P·k rows); the rank window then runs on the k-row frame.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    wtype = df.schema[weight_col].dataType
    if not isinstance(wtype, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"weight_col {weight_col!r} is {wtype.simpleString()}; weights "
            "must be integral — scale fractional scores to integer units "
            "first (e.g. floor(quality * 1e6 + 0.5)), otherwise the "
            "bigint cast would truncate sub-1 weights to 0 and silently "
            "drop those rows"
        )
    h = _hash60(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    lnu = F.floor(F.log(u) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    w = F.col(weight_col).cast("bigint")
    race = lnu.cast("double") / w.cast("double")
    top = (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("__race", race)
        .orderBy(F.desc("__race"), F.col(key_col).asc())
        .limit(k)
    )
    rk = Window.orderBy(F.desc("__race"), F.col(key_col).asc())
    return (
        top.withColumn(rank_col, F.row_number().over(rk).cast("bigint"))
        .drop("__race")
    )
