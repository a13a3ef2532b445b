"""Deterministic corpus sampling for training-data pipelines.

df.sample() is nondeterministic across retries/partitionings (seed is
per-partition), which breaks reproducible corpus construction. These
operators key the sampling decision on a CONTENT-derived hash of the id,
so the same document always lands on the same side of the cut — across
runs, engines (md5 is portable), cluster sizes, and input orderings.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: resolution of the sampling wheel: fractions quantize to 1/1000
SAMPLE_BUCKETS = 1000


def _bucket(id_col: str) -> Column:
    """Stable bucket in [0, SAMPLE_BUCKETS) from md5 of the id — the
    first 8 hex chars as an integer, mod the wheel size."""
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return F.conv(h, 16, 10).cast("bigint") % SAMPLE_BUCKETS


def hash_sample(df: DataFrame, fraction: float,
                id_col: str = "doc_id") -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows keyed on md5(id).

    Filter-only: no shuffle, pushes past column pruning, and the kept
    set is invariant to partitioning and cluster size.
    """
    return df.where(_bucket(id_col) < int(round(fraction * SAMPLE_BUCKETS)))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str, id_col: str = "doc_id",
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    downsample en, keep all low-resource languages).

    ``fractions`` maps stratum value → keep fraction; strata not listed
    keep ``default_fraction``. The per-stratum threshold compiles to a
    CASE chain over literals — still a pure filter, no shuffle, no join.
    """
    thr = F.lit(int(round(default_fraction * SAMPLE_BUCKETS)))
    for val, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == val,
                     F.lit(int(round(frac * SAMPLE_BUCKETS)))).otherwise(thr)
    return df.where(_bucket(id_col) < thr)


def split_assign(df: DataFrame, splits: dict[str, float],
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic train/val/test split assignment: every row gains a
    ``split`` column naming its partition, keyed on md5(id) so the same
    document lands in the same split across runs, engines, cluster
    sizes, and input orderings — the property that keeps eval sets
    uncontaminated when the corpus is re-processed.

    ``splits`` maps split name → fraction; fractions must sum to 1
    (validated — a silent gap would drop rows into an unnamed limbo).
    Splits carve consecutive bucket ranges of the 1/1000 wheel in the
    dict's insertion order, so ``{"train": .8, "val": .1, "test": .1}``
    gives train buckets [0,800), val [800,900), test [900,1000).
    Residual buckets from fraction rounding fold into the LAST split.

    Pure column expression (a CASE chain over literals): no shuffle, no
    join, survives column pruning — adding a split label to 100 TB
    costs one scan it was already paying.
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"split_assign: fractions must sum to 1.0, got {total!r} "
            f"from {splits!r}")
    if not splits:
        raise ValueError("split_assign: at least one split required")
    bucket = _bucket(id_col)
    case = None
    cum = 0.0
    names = list(splits.items())
    for name, frac in names[:-1]:
        cum += frac
        cond = bucket < int(round(cum * SAMPLE_BUCKETS))
        case = (F.when(cond, F.lit(name)) if case is None
                else case.when(cond, F.lit(name)))
    last = F.lit(names[-1][0])
    return df.withColumn(
        "split", last if case is None else case.otherwise(last))


def sequence_pack(
    df: DataFrame,
    seq_len: int,
    *,
    n_shards: int = 32,
    tokens_col: Column | str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk packing of documents into fixed-length training
    sequences (the GPT-style pretraining layout: concatenate the corpus
    in a deterministic order, then cut every ``seq_len`` tokens).

    A single global concatenation order would force one running-sum
    window over the whole corpus — a single-task sort at scale. Instead
    the corpus is split into ``n_shards`` deterministic shards (md5 of
    the id, so shard membership is partition- and engine-independent)
    and each shard is packed independently: the window partitions on the
    shard key, so packing parallelism = n_shards regardless of corpus
    size. Sequence ids are (shard, seq_in_shard) pairs.

    Returns one row per document: its shard, token count, starting
    token offset within the shard's concatenation, and the first/last
    sequence index it lands in (a document longer than ``seq_len``
    spans several sequences; ``n_seqs`` counts them).
    """
    from pyspark.sql.window import Window

    from .text import words

    tok = (F.size(words("text")) if tokens_col is None
           else (F.col(tokens_col) if isinstance(tokens_col, str)
                 else tokens_col))
    shard = _bucket(id_col) % n_shards
    w = (
        Window.partitionBy("shard")
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.select(F.col(id_col), shard.cast("int").alias("shard"),
                  tok.cast("long").alias("n_tokens"))
        # zero-token docs contribute nothing to the stream; drop them
        # before the window so offsets are well-defined
        .where(F.col("n_tokens") > 0)
        .withColumn("tok_offset",
                    (F.sum("n_tokens").over(w) - F.col("n_tokens"))
                    .cast("long"))
    )
    return out.select(
        id_col, "shard", "n_tokens", "tok_offset",
        F.floor(F.col("tok_offset") / seq_len).cast("long").alias("seq_first"),
        F.floor((F.col("tok_offset") + F.col("n_tokens") - 1) / seq_len)
        .cast("long").alias("seq_last"),
        (F.floor((F.col("tok_offset") + F.col("n_tokens") - 1) / seq_len)
         - F.floor(F.col("tok_offset") / seq_len) + 1)
        .cast("long").alias("n_seqs"),
    )


def token_budget_sample(
    df: DataFrame,
    budget: int | dict[str, int],
    strata_col: str = "source",
    *,
    tokens_col: Column | str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Data-mixture construction under a token budget: per stratum
    (source/domain), keep documents in a deterministic pseudo-random
    order until the stratum's token budget is filled. Returns every row
    with (n_tokens, cum_tokens, kept) — ``where('kept')`` is the
    mixture.

    The scan order is md5(id) (portable, partition-independent), so the
    kept set is reproducible across runs and engines. A document is
    kept if the budget was not yet exhausted when its turn came
    (cum - n < budget): the boundary document is included, overshooting
    by at most one document — the usual mixture convention.

    One shuffle: the running-sum window on the stratum key. Integer
    sums stay exact. ``budget`` may be one number or a per-stratum
    dict (unlisted strata get budget 0).
    """
    from pyspark.sql.window import Window

    from .text import words

    tok = (F.size(words("text")) if tokens_col is None
           else (F.col(tokens_col) if isinstance(tokens_col, str)
                 else tokens_col))
    if isinstance(budget, dict):
        b = F.lit(0)
        for val, amount in sorted(budget.items()):
            b = F.when(F.col(strata_col) == val, F.lit(int(amount))).otherwise(b)
    else:
        b = F.lit(int(budget))
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(
        F.col(id_col), F.col(strata_col),
        tok.cast("long").alias("n_tokens"),
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
    return out.withColumn("kept", (F.col("cum_tokens") - F.col("n_tokens")) < b)


def _hashed_ngram_stream(df: DataFrame, text_col: str, id_col: str,
                         n_buckets: int,
                         carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-occurrence hashed-feature stream (id, b): word unigrams +
    bigrams hashed into ``n_buckets`` via the portable md5-prefix
    integer (same trick as simhash — identical in any engine).
    Documents with no tokens contribute no rows. ``carry_cols`` thread
    per-document payload columns (functionally dependent on the id)
    through the explode."""
    from .text import words

    carry = [F.col(c) for c in carry_cols]
    w = F.col("__w")
    bigrams = F.when(
        F.size(w) >= 2,
        F.zip_with(F.slice(w, F.lit(1), F.size(w) - 1),
                   F.slice(w, F.lit(2), F.size(w) - 1),
                   lambda a, b: F.concat_ws(" ", a, b)),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), *carry, words(text_col).alias("__w"))
        .select(F.col(id_col), *carry,
                F.explode(F.concat(w, bigrams)).alias("f"))
        .select(F.col(id_col), *carry,
                (F.conv(F.substring(F.md5("f"), 1, 8), 16, 10)
                 .cast("long") % n_buckets).alias("b"))
    )


def dsir_importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 4096,
    target_cond: Column | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw-corpus
    document by the log-likelihood ratio of its hashed n-gram features
    under the TARGET distribution vs the RAW distribution — the
    standard recipe for skimming a web crawl for target-like documents
    (resample/top-k on the weight downstream; pair with hash_sample
    for Gumbel-free deterministic resampling).

    Features are hashed word unigrams+bigrams in ``n_buckets`` buckets;
    both distributions are add-one smoothed over the bucket space.
    Returns one row per raw document with at least one token:
    (id, n_feats, dsir_sum, dsir_avg) — dsir_avg is the length-
    normalized weight (DSIR's importance estimate up to the constant
    per-feature prior), decimal strings like lm_score.

    Scale posture: the corpus is exploded ONCE into per-doc bucket
    counts (combinable (id, b) aggregation, checkpointed) feeding both
    the raw distribution and the scoring pass; the target pays its own
    single explode. The log-ratio table is at most ``n_buckets`` rows —
    broadcast by construction, never a shuffle on the corpus side — and
    per-doc scoring is one map-side broadcast join plus one doc-keyed
    decimal sum. Determinism: per-bucket log-ratios are rounded to a
    1e-6 grid and carried as DECIMAL(18,6); the per-doc sum is exact
    decimal arithmetic, independent of partitioning and fold order.

    ``target_cond``: when the target is a row FILTER of the corpus
    (the standard "target-language subset" recipe), pass the predicate
    here instead of a separate ``target`` frame — the target bucket
    counts then ride the per-doc aggregation the raw distribution
    already pays (one boolean carried through the single explode),
    removing the target's own explode+shuffle pass entirely. At 100 TB
    that is a full corpus-subset scan saved per model build; the
    counts are identical by construction (same occurrence multiset,
    summed under the same predicate). ``target`` is ignored when
    ``target_cond`` is given.
    """
    if target_cond is not None:
        per_doc = (
            _hashed_ngram_stream(
                corpus.withColumn("__tgt", target_cond.cast("boolean")),
                text_col, id_col, n_buckets, carry_cols=("__tgt",))
            .groupBy(id_col, "__tgt", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint()
        )
        tgt = (per_doc.where(F.col("__tgt"))
               .groupBy("b").agg(F.sum("c").alias("ct")))
        per_doc = per_doc.drop("__tgt")
    else:
        per_doc = (
            _hashed_ngram_stream(corpus, text_col, id_col, n_buckets)
            .groupBy(id_col, "b").agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint()
        )
        tgt = (_hashed_ngram_stream(target, text_col, id_col, n_buckets)
               .groupBy("b").agg(F.count(F.lit(1)).alias("ct")))
    raw = per_doc.groupBy("b").agg(F.sum("c").alias("cr"))
    totals = raw.crossJoin(tgt.agg(F.sum("ct").alias("__tt"))) \
        .agg(F.sum("cr").alias("__tr"), F.first("__tt").alias("__tt"))
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1)
                      / (F.col("__tt") + F.lit(n_buckets)))
                - F.log((F.col("cr") + 1)
                        / (F.col("__tr") + F.lit(n_buckets))), 6)
            .cast("decimal(18,6)").alias("lp"))
    )
    scored = (
        per_doc.join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(F.sum("c").cast("long").alias("n_feats"),
             F.sum(F.col("lp") * F.col("c")).alias("s"))
    )
    return scored.select(
        F.col(id_col), "n_feats",
        F.col("s").cast("decimal(28,6)").cast("string").alias("dsir_sum"),
        (F.col("s") / F.col("n_feats")).cast("decimal(18,6)")
        .cast("string").alias("dsir_avg"),
    )


def dsir_model(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 4096,
    target_cond: Column | None = None,
) -> tuple[list[tuple[int, object]], object]:
    """The train half of DSIR factored out for online application:
    returns ([(bucket, log_ratio_decimal)...], floor_decimal) — at most
    ``n_buckets`` rows collected (the model, not the data; same bounded-
    collect contract as IVF centroids / PQ codebooks). ``floor`` is the
    smoothed log-ratio of a bucket unseen in BOTH distributions, for
    scoring feeds that stray outside the training corpus.

    ``target_cond`` (see ``dsir_importance_weights``): a corpus row
    predicate that replaces the separate ``target`` frame — ONE
    explode+aggregation computes both distributions (target counts =
    conditional sums on the same occurrence stream), halving the
    training passes."""
    from decimal import Decimal

    if target_cond is not None:
        # checkpoint the (<= n_buckets row) aggregate: raw, tgt AND the
        # totals cross-join all read it, and Catalyst does not share
        # common subplans across join branches — without the barrier
        # the corpus explode would run once per reference
        both = (_hashed_ngram_stream(
                    corpus.withColumn("__tgt", target_cond.cast("boolean")),
                    text_col, id_col, n_buckets, carry_cols=("__tgt",))
                .groupBy("b")
                .agg(F.count(F.lit(1)).alias("cr"),
                     F.count(F.when(F.col("__tgt"), 1)).alias("ct0"))
                .localCheckpoint())
        raw = both.select("b", "cr")
        # NULL when the bucket never occurs in the target — matches the
        # left join's absent-row coalesce below
        tgt = (both.where(F.col("ct0") > 0)
               .select("b", F.col("ct0").alias("ct")))
    else:
        per_occ = _hashed_ngram_stream(corpus, text_col, id_col, n_buckets)
        raw = per_occ.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
        tgt = (_hashed_ngram_stream(target, text_col, id_col, n_buckets)
               .groupBy("b").agg(F.count(F.lit(1)).alias("ct")))
    totals = raw.crossJoin(tgt.agg(F.sum("ct").alias("__tt"))) \
        .agg(F.sum("cr").alias("__tr"), F.first("__tt").alias("__tt"))
    lr_rows = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1)
                      / (F.col("__tt") + F.lit(n_buckets)))
                - F.log((F.col("cr") + 1)
                        / (F.col("__tr") + F.lit(n_buckets))), 6)
            .cast("decimal(18,6)").alias("lp"),
            F.round(
                F.log(F.lit(1.0) / (F.col("__tt") + F.lit(n_buckets)))
                - F.log(F.lit(1.0) / (F.col("__tr") + F.lit(n_buckets))), 6)
            .cast("decimal(18,6)").alias("floor"))
        .collect()
    )
    floor = lr_rows[0]["floor"] if lr_rows else Decimal("0.000000")
    return [(int(r["b"]), r["lp"]) for r in lr_rows], floor


def dsir_apply(
    df: DataFrame,
    model: list[tuple[int, object]],
    floor,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 4096,
) -> DataFrame:
    """The apply half of DSIR: score documents ROW-WISE against a fixed
    log-ratio model, so the pipeline has NO aggregation, NO shuffle, NO
    state, and is therefore STREAMING-SAFE (train the filter offline on
    the corpus snapshot, screen the ingest feed online). Exactly equals
    :func:`dsir_importance_weights` on the same input: both sum the
    same multiset of 1e-6-grid values, and integer/decimal addition is
    order-independent.

    The per-doc sum runs in an Arrow-batched pandas UDF against the
    broadcast dense micro-unit table (int64 per bucket — exact), with
    the membership hash memoized per distinct feature like
    ``bloom_probe``; the exact sum is formatted as a 1e-6-scale decimal
    string and parsed back to DECIMAL(28,6) Spark-side so the final
    sum/avg columns go through the IDENTICAL decimal casts as the batch
    op. (A pure-JVM higher-order fold was tried first: interpreted
    per-element md5 + array probes measured ~7x slower than the batch
    pipeline at sf1; Arrow + memoization is the same trade
    ``bloom_probe`` makes.)"""
    from decimal import Decimal

    import numpy as np

    from .text import words

    def _micros(d) -> int:
        return int(Decimal(d).scaleb(6))   # exact: scale-6 decimals

    # DENSE int64 micro-units indexed by bucket, floor-filled — decimals
    # on a 1e-6 grid are exact integers scaled by 10^6
    dense = np.full(n_buckets, _micros(floor), dtype=np.int64)
    for b, lp in model:
        dense[b] = _micros(lp)
    bc = df.sparkSession.sparkContext.broadcast(dense)
    nb = int(n_buckets)

    @F.pandas_udf("string")
    def sum_micros(col: pd.Series) -> pd.Series:
        import hashlib

        lut = bc.value
        if len(col) == 0:
            return pd.Series([], dtype=object)
        # flatten the whole Arrow batch, factorize (C-level hash table),
        # hash each DISTINCT feature exactly once, then vectorized
        # gather + segmented sum — a per-occurrence Python loop measured
        # ~10 µs/feature (dict memo included); this shape is ~5 µs per
        # DISTINCT feature plus numpy time
        lens = np.fromiter((len(a) for a in col), dtype=np.int64,
                           count=len(col))
        flat = np.concatenate([np.asarray(a, dtype=object) for a in col])
        codes, uniques = pd.factorize(flat, sort=False)
        um = np.empty(len(uniques), dtype=np.int64)
        for i, u in enumerate(uniques):
            um[i] = lut[int(hashlib.md5(
                u.encode()).hexdigest()[:8], 16) % nb]
        offsets = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        # every row has >= 1 feature (caller filters empty docs), so
        # reduceat's equal-offset quirk cannot trigger
        sums = np.add.reduceat(um[codes], offsets)
        out = []
        for s in sums.tolist():
            a = abs(s)
            out.append(f"{'-' if s < 0 else ''}{a // 1_000_000}"
                       f".{a % 1_000_000:06d}")
        return pd.Series(out)

    w = F.col("__w")
    bigrams = F.when(
        F.size(w) >= 2,
        F.zip_with(F.slice(w, F.lit(1), F.size(w) - 1),
                   F.slice(w, F.lit(2), F.size(w) - 1),
                   lambda a, b: F.concat_ws(" ", a, b)),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(w, bigrams)
    staged = (df.select(F.col(id_col), words(text_col).alias("__w"))
                .where(F.size("__w") >= 1)
                .select(F.col(id_col), feats.alias("__f")))
    return staged.select(
        F.col(id_col),
        F.size("__f").cast("long").alias("n_feats"),
        sum_micros(F.col("__f")).cast("decimal(28,6)").alias("__s"),
    ).select(
        F.col(id_col), "n_feats",
        F.col("__s").cast("decimal(28,6)").cast("string").alias("dsir_sum"),
        (F.col("__s") / F.col("n_feats")).cast("decimal(18,6)")
        .cast("string").alias("dsir_avg"),
    )
