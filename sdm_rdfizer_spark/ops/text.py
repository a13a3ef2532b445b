"""Text-analysis operators for large-scale training-data pipelines.

These go beyond the reference's RML surface (SURVEY §2 lists none of
these) — they are the document-pipeline operators a 100 TB corpus job
needs: token counting, quality scoring, language ID, fingerprinting.
Everything is built-in Column expressions (JVM-side, codegen-friendly);
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._exprs import lit_array

# A small, fixed stopword inventory per language — enough for a
# ratio-feature and an n-gram-free language-ID heuristic.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "pour"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "auf"],
    "es": ["el", "la", "y", "los", "de", "que", "un", "una", "es", "para"],
}

# BPE-ish tokenization: word pieces OR single non-space punctuation.
TOKEN_REGEX = r"\w+|[^\w\s]"


def words(col: Column | str) -> Column:
    """Whitespace-split word array (empty array for blank text).

    ``array_remove(..., "")`` rather than a ``filter`` lambda: they drop
    exactly the same elements (split emits "" only around the seams, and
    never NULL), but higher-order functions force the WHOLE enclosing
    expression tree onto Catalyst's interpreted evaluator, while
    array_remove stays inside whole-stage codegen — and words() sits
    under every corpus-wide text operator in the engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.trim(c), r"\s+"), "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace word count + BPE-ish regex token count per document."""
    return df.select(
        "*",
        F.size(words(text_col)).alias("n_words"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0)).alias("n_tokens"),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features.

    A cheap quality prior in the spirit of C4/Gopher-style heuristics:
    documents with pathological punctuation density or near-zero stopword
    ratio are usually boilerplate or non-linguistic.
    """
    w = words(text_col)
    n_words = F.size(w)
    n_chars = F.length(F.col(text_col))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), 0))
    sw = lit_array(STOPWORDS["en"], "STRING")
    n_stop = F.size(F.filter(F.transform(w, F.lower), lambda x: F.array_contains(sw, x)))
    avg_word_len = F.when(n_words > 0, F.round((n_chars - n_words + 1) / n_words, 4)).otherwise(F.lit(0.0))
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_words.alias("q_words"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("q_punct_ratio"),
        F.round(n_stop / F.greatest(n_words, F.lit(1)), 6).alias("q_stopword_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID over a fixed 4-language inventory.

    Scores each language by stopword hits in the document and picks the
    argmax (ties broken by language-code order); documents with zero hits
    get 'und'. A full n-gram model would use the same plan shape with a
    broadcast n-gram table.
    """
    w = F.transform(words(text_col), F.lower)

    def _hits(lang: str):
        sw = lit_array(STOPWORDS[lang], "STRING")
        # NB: the lambda must be unary — PySpark binds a second parameter
        # to the element index.
        return F.size(F.filter(w, lambda x: F.array_contains(sw, x)))

    scores = []
    for lang in sorted(STOPWORDS):
        scores.append(F.struct(_hits(lang).alias("hits"), F.lit(lang).alias("lang")))
    # argmax by (hits, reversed-lang) — array_max picks lexicographically
    # greatest struct; to break hit-ties toward the alphabetically first
    # language we compare on (hits, negated-lang-rank).
    ranked = []
    for i, sc in enumerate(scores):
        ranked.append(F.struct(sc["hits"].alias("hits"), F.lit(-i).alias("rank"), sc["lang"].alias("lang")))
    best = F.array_max(F.array(*ranked))
    return df.select(
        "*",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].alias("lang_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 over the normalized text
    (lowercased, whitespace collapsed). Identical-content detection that
    survives whitespace/case jitter."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select("*", F.md5(norm).alias("fp_md5"))


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent values in a SORTED array — i.e. the
    highest frequency of any element — as one aggregate() fold, fully
    JVM-side."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(acc["prev"].isNotNull() & (x == acc["prev"]),
                     acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_dup_word_frac: float = 0.9,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """Gopher/C4-style repetition quality stats per document:
    (doc_id, n_words, dup_word_frac, top_word_frac, top_bigram_frac,
    flagged).

    dup_word_frac = 1 - distinct/total words; top_word_frac and
    top_bigram_frac are the most frequent word's / word-bigram's share.
    ``flagged`` marks documents over the thresholds (repetitive junk a
    training pipeline drops). Everything is a per-row higher-order-
    function fold over the word array — no explode, no shuffle, so the
    operator scans 100 TB at full column-pruned speed.
    """
    w = F.transform(words(text_col), F.lower)
    n = F.size(w)
    sw = F.array_sort(w)
    # zip_with over shifted slices is linear per doc; transform +
    # element_at(i) would re-scan the array per element (quadratic)
    m = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(w, 1, m), F.slice(w, 2, m),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    nb = F.size(bigrams)
    stats = df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.when(n > 0, F.round(
            1 - F.size(F.array_distinct(w)) / n, 6)).otherwise(0.0)
        .alias("dup_word_frac"),
        F.when(n > 0, F.round(_max_run(sw) / n, 6)).otherwise(0.0)
        .alias("top_word_frac"),
        F.when(nb > 0, F.round(
            _max_run(F.array_sort(bigrams)) / nb, 6)).otherwise(0.0)
        .alias("top_bigram_frac"),
    )
    return stats.withColumn(
        "flagged",
        (F.col("dup_word_frac") > max_dup_word_frac)
        | (F.col("top_bigram_frac") > max_top_bigram_frac),
    )


# PII patterns valid in BOTH Java regex (Spark) and RE2 (portable
# oracles). Replacement order matters: specific before generic so the
# phone pattern can't eat an SSN or IP first.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    ("phone", r"\+?\b\d[\d .()-]{6,}\d\b", "<PHONE>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact common PII shapes (emails, SSN-style ids, IPv4 addresses,
    phone-like digit runs) with typed placeholder tokens, plus a per-kind
    match count column (``pii_<kind>``).

    Pure Column expressions — a chain of regexp_replace stays inside
    whole-stage codegen, so scrubbing a 100 TB corpus is scan-bound.
    Each kind is counted on the text AFTER the earlier (more specific)
    kinds were replaced, so counts don't overlap: an SSN is not also a
    phone (placeholder tokens contain no digits and are never
    re-matched).
    """
    out_cols = ["*"]
    scrubbed = F.col(text_col)
    for kind, pat, tok in PII_PATTERNS:
        out_cols.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0))
            .alias(f"pii_{kind}"))
        scrubbed = F.regexp_replace(scrubbed, pat, tok)
    return df.select(*out_cols, scrubbed.alias("text_scrubbed"))


#: Gopher-rule defaults (Rae et al. 2021 §A1.1 shapes, tuned mild): a
#: document must look like running prose to survive.
GOPHER_THRESHOLDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_punct_ratio": 0.2,
    "min_stopword_hits": 2,
    "max_dup_word_frac": 0.9,
    "max_top_bigram_frac": 0.18,
}


def quality_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", **overrides) -> DataFrame:
    """Gopher-style composite keep/drop decision per document.

    Combines the individual quality signals (length bounds, mean word
    length, punctuation density, stopword presence, word/bigram
    repetition) into one verdict: (id, n_words, keep, reasons) where
    ``reasons`` lists every violated rule in a fixed order — pipelines
    log the reasons histogram to see WHY the corpus shrank.

    Single pass of pure Column expressions: HOF folds over the word
    array, no explode, no shuffle, column pruning reaches the scan.
    """
    t = {**GOPHER_THRESHOLDS, **overrides}
    w = F.transform(words(text_col), F.lower)
    n = F.size(w)
    char_sum = F.aggregate(w, F.lit(0), lambda a, x: a + F.length(x))
    mean_wl = F.when(n > 0, F.round(char_sum / n, 4)).otherwise(F.lit(0.0))
    n_chars = F.length(F.col(text_col))
    punct_ratio = F.round(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), 0))
        / F.greatest(n_chars, F.lit(1)), 6)
    sw = lit_array(STOPWORDS["en"], "STRING")
    stop_hits = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    dup_word_frac = F.when(
        n > 0, F.round(1 - F.size(F.array_distinct(w)) / n, 6)).otherwise(0.0)
    m = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(F.slice(w, 1, m), F.slice(w, 2, m),
                         lambda a, b: F.concat_ws(" ", a, b))
    nb = F.size(bigrams)
    top_bigram_frac = F.when(
        nb > 0, F.round(_max_run(F.array_sort(bigrams)) / nb, 6)).otherwise(0.0)

    rules = [
        ("too_few_words", n < t["min_words"]),
        ("too_many_words", n > t["max_words"]),
        ("short_words", (n > 0) & (mean_wl < t["min_mean_word_len"])),
        ("long_words", mean_wl > t["max_mean_word_len"]),
        ("punct_heavy", punct_ratio > t["max_punct_ratio"]),
        ("low_stopwords", stop_hits < t["min_stopword_hits"]),
        ("dup_words", dup_word_frac > t["max_dup_word_frac"]),
        ("rep_bigrams", top_bigram_frac > t["max_top_bigram_frac"]),
    ]
    reasons = F.filter(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in rules]),
        lambda x: x.isNotNull())
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        (F.size(reasons) == 0).alias("keep"),
        reasons.alias("reasons"),
    )


def vocabulary(df: DataFrame, text_col: str = "text",
               id_col: str | None = "doc_id", *,
               min_count: int = 1, lowercase: bool = True) -> DataFrame:
    """Corpus vocabulary: (token, n_docs, n_occurrences) for every
    whitespace token appearing at least ``min_count`` times — the
    counting pass a tokenizer/BPE training job starts from.

    Plan shape: explode → two-level hash aggregation. Level 1 groups by
    (token, doc): because one document's tokens always sit in one
    partition, the map-side partial aggregation collapses term
    frequencies BEFORE the shuffle — shuffle volume is per-doc
    vocabulary, not corpus token count. Level 2 groups by token to sum
    tf and count docs. The min_count filter runs post-aggregate
    (HAVING), pruning the long tail before any downstream join.
    """
    w = words(text_col)
    if lowercase:
        w = F.transform(w, F.lower)
    if id_col is None:
        # no id: a synthetic one must be pinned BEFORE the explode —
        # monotonically_increasing_id in the same select would be
        # re-evaluated per exploded row (nondeterministic expr under
        # Generate), silently making n_docs == n_occurrences
        base = df.select(F.monotonically_increasing_id().alias("__doc"),
                         w.alias("__w")).localCheckpoint(eager=False)
        tok = base.select("__doc", F.explode("__w").alias("token"))
    else:
        tok = df.select(F.col(id_col).alias("__doc"),
                        F.explode(w).alias("token"))
    tf = tok.groupBy("token", "__doc").agg(F.count("*").alias("tf"))
    return (
        tf.groupBy("token")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("tf").cast("long").alias("n_occurrences"))
        .where(F.col("n_occurrences") >= min_count)
    )


def tfidf_topk(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", *,
               k: int = 5, lowercase: bool = True) -> DataFrame:
    """Per-document top-k keywords by TF-IDF.

    Returns (id, term, tf, df, tfidf, rnk) for each document's k
    highest-scoring terms, tfidf = tf * ln(N / df), ties broken by term
    (deterministic output).

    Plan shape — all shuffles on natural keys, no driver state:
      1. groupBy(id, term): term frequencies. Map-side partial
         aggregation collapses in-doc repeats before the shuffle.
      2. groupBy(term): document frequencies. Partial aggregation makes
         the shuffle one row per (term, input partition); the result is
         vocabulary-sized.
      3. tf ⋈ dfreq on term. NOT a window over term: a count window
         partitioned by term would buffer every row of a hot term (a
         stopword present in billions of docs) in ONE task — the join
         streams rows through instead, AQE broadcasts the (small)
         vocabulary side when it fits and splits skewed partitions when
         it doesn't.
      4. row_number window partitioned by id: the top-k cut (Spark
         pushes a partial WindowGroupLimit below the shuffle, so ≤k
         rows per doc per partition move).
    The corpus size N is a single scalar aggregate cross-joined back as
    a broadcast literal — no collect of anything wider than one number.
    """
    from pyspark.sql import Window

    w = words(text_col)
    if lowercase:
        w = F.transform(w, F.lower)
    tok = df.select(F.col(id_col), F.explode(w).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.select(F.count("*").cast("double").alias("__n"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf",
                    F.round(F.col("tf") * F.log(F.col("__n") / F.col("df")), 6))
    )
    rnk = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term")))
    return (
        scored.withColumn("rnk", rnk)
        .where(F.col("rnk") <= k)
        .select(F.col(id_col), "term",
                F.col("tf").cast("long").alias("tf"),
                F.col("df").cast("long").alias("df"),
                "tfidf", F.col("rnk").cast("long").alias("rnk"))
    )


def chunk_documents(df: DataFrame, chunk_size: int, overlap: int = 0,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into fixed-size character chunks with optional
    overlap (the RAG / context-window preprocessing step).

    Chunk starts advance by ``chunk_size - overlap``; every chunk is
    ``chunk_size`` chars except possibly the final one. The whole thing
    is a narrow plan — sequence → explode → substring, no shuffle, no
    UDF — so chunking parallelism equals scan parallelism and the
    fan-out per row is bounded by ceil(len / step). Blank documents
    produce no chunks.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    n = F.length(F.col(text_col))
    starts = F.sequence(F.lit(0), n - 1, F.lit(step))
    ex = (
        df.where(n > 0)
        .select(F.col(id_col), F.col(text_col).alias("__t"),
                F.posexplode(starts).alias("chunk_id", "chunk_start"))
    )
    chunk = F.substring(F.col("__t"), F.col("chunk_start") + 1, chunk_size)
    return ex.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.length(chunk).cast("long").alias("chunk_len"),
        chunk.alias("chunk_text"),
    )


def corpus_stats(df: DataFrame, text_col: str = "text",
                 by: tuple[str, ...] = ("source", "lang")) -> DataFrame:
    """Per-group corpus report: doc/word/char counts and length stats.

    The reporting pass every corpus job ends with. One hash aggregation;
    every aggregate (count/sum/min/max/avg over integer lengths) is
    map-side combinable, so shuffle volume is one row per group per
    input partition regardless of corpus size. avg stays exact (long
    sum / long count) before the final round.
    """
    n_chars = F.length(F.col(text_col))
    n_words = F.size(words(text_col))
    return df.groupBy(*[F.col(c) for c in by]).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(n_words).cast("long").alias("n_words"),
        F.sum(n_chars).cast("long").alias("n_chars"),
        F.min(n_chars).cast("long").alias("min_chars"),
        F.max(n_chars).cast("long").alias("max_chars"),
        F.round(F.sum(n_chars) / F.count("*"), 6).alias("avg_chars"),
    )


def _char_bigrams(text: Column) -> Column:
    """Character-bigram array of a string (empty for length < 2)."""
    chars = F.split(text, "")
    m = F.greatest(F.size(chars) - 1, F.lit(0))
    return F.zip_with(F.slice(chars, 1, m), F.slice(chars, 2, m),
                      lambda a, b: F.concat(a, b))


def lm_score(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Language-model quality score (CCNet-style perplexity filtering,
    with a corpus-trained character-bigram model standing in for the
    external KenLM): docs whose character sequences are improbable under
    the corpus's own statistics — mojibake, binary spill, gibberish —
    score low and get filtered.

    The corpus is exploded into bigrams ONCE and collapsed to per-doc
    bigram counts (one combinable (doc, bigram) aggregation — char
    bigrams repeat heavily within a doc, so this frame is several times
    smaller than the occurrence stream). That checkpointed frame then
    feeds BOTH phases:
      1. TRAIN: groupBy(bigram) sum of the per-doc counts → add-one-
         smoothed log-probability. The model is alphabet² rows — tiny —
         and is broadcast for scoring.
      2. SCORE: broadcast-join the model to the per-doc counts and
         aggregate sum(count · logp) per doc — one decimal multiply-add
         per DISTINCT (doc, bigram) pair, not per occurrence.
    (The naive train-then-score shape explodes the corpus twice and
    aggregates per occurrence — measured 1.6× slower at sf1.)

    Determinism across engines: each bigram's log-prob is rounded to a
    1e-6 grid and carried as DECIMAL(18,6); per-doc sums are exact
    decimal arithmetic, so the result is independent of partitioning
    and float-summation order (a raw double sum would drift in the last
    bits between Spark and any oracle). Returns (id, n_bigrams,
    sum_logprob [decimal string], avg_logprob [decimal string]);
    unseen bigrams take the smoothing floor.
    """
    bg = _char_bigrams(F.col(text_col))
    ex = df.select(F.col(id_col), bg.alias("__bgs")).select(
        F.col(id_col), F.explode("__bgs").alias("bg"))
    per_doc = (ex.groupBy(id_col, "bg").agg(F.count("*").alias("c"))
               .localCheckpoint())

    counts = per_doc.groupBy("bg").agg(F.sum("c").alias("c"))
    totals = counts.agg(
        F.sum("c").alias("__t"), F.count("*").alias("__v"))
    model = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bg",
            F.round(F.log((F.col("c") + 1) / (F.col("__t") + F.col("__v"))), 6)
            .cast("decimal(18,6)").alias("logp"))
    )
    floor = (
        totals.select(
            F.round(F.log(F.lit(1.0) / (F.col("__t") + F.col("__v"))), 6)
            .cast("decimal(18,6)").alias("__floor"))
    )
    scored = (
        per_doc.join(F.broadcast(model), "bg", "left")
        .crossJoin(F.broadcast(floor))
        .select(F.col(id_col), "c",
                F.coalesce("logp", "__floor").alias("lp"))
        .groupBy(id_col)
        .agg(F.sum("c").cast("long").alias("n_bigrams"),
             F.sum(F.col("lp") * F.col("c")).alias("s"))
    )
    return scored.select(
        F.col(id_col), "n_bigrams",
        F.col("s").cast("decimal(28,6)").cast("string").alias("sum_logprob"),
        (F.col("s") / F.col("n_bigrams")).cast("decimal(18,6)")
        .cast("string").alias("avg_logprob"),
    )


def length_percentiles(df: DataFrame, text_col: str = "text",
                       by: tuple[str, ...] = ("source",)) -> DataFrame:
    """Per-group exact length percentiles (p50/p90/p99 chars) — the
    distribution report behind truncation/chunk-size decisions.

    Exact interpolated percentiles (SQL percentile_cont semantics): the
    per-group sort is the cost, so groups shard the work; for
    monster-cardinality groups at extreme scale switch to
    approx_percentile and accept the error bound.
    """
    n = F.length(F.col(text_col)).cast("double")
    pct = F.percentile(n, F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        df.groupBy(*[F.col(c) for c in by])
        .agg(pct.alias("__p"),
             F.count("*").cast("long").alias("n_docs"))
        .select(*by,
                "n_docs",
                F.round(F.col("__p")[0], 6).alias("p50_chars"),
                F.round(F.col("__p")[1], 6).alias("p90_chars"),
                F.round(F.col("__p")[2], 6).alias("p99_chars"))
    )


def ccnet_buckets(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """CCNet-style perplexity bucketing: score every document with the
    corpus char-bigram LM, then split the corpus into head / middle /
    tail terciles of avg log-probability (head = most fluent). The
    standard pre-sampling quality stratification — downstream pipelines
    keep head+middle or re-weight by bucket.

    The tercile cuts are ONE tiny global aggregate (two doubles)
    broadcast back over the scored frame; rounded to a 1e-6 grid so
    the bucket assignment is reproducible across engines. Everything
    else inherits lm_score's plan (single corpus explode, exact-decimal
    scores).
    """
    # doc-grain frame, tiny; checkpointed because BOTH the tercile
    # aggregate and the final projection read it — without this the
    # whole score pipeline (model join + agg) runs twice
    scored = lm_score(df, text_col=text_col, id_col=id_col).localCheckpoint()
    alp = F.col("avg_logprob").cast("decimal(18,6)").cast("double")
    cuts = scored.agg(
        F.round(F.percentile(alp, F.lit(1.0 / 3)), 6).alias("c1"),
        F.round(F.percentile(alp, F.lit(2.0 / 3)), 6).alias("c2"),
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            id_col, "n_bigrams", "sum_logprob", "avg_logprob",
            F.when(alp <= F.col("c1"), F.lit("tail"))
            .when(alp <= F.col("c2"), F.lit("middle"))
            .otherwise(F.lit("head")).alias("bucket"),
        )
    )


def corpus_datacard(df: DataFrame, text_col: str = "text",
                    source_col: str = "source") -> DataFrame:
    """Per-source data card: the release report combining document /
    word / char counts, exact length percentiles, distinct-token
    vocabulary size, and the dominant language tag. One row per source.

    Three grouped aggregations joined on the (small) source key:
    counts+percentiles share one pass; vocabulary needs its own
    explode→distinct pass (per-source token space); the language mode
    is a count + argmax. All shuffles key on source (or (source, token)
    with map-side combine); the joined frames are source-cardinality —
    broadcast-sized by construction.
    """
    n = F.length(F.col(text_col)).cast("double")
    pct = F.percentile(n, F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    base = (
        df.groupBy(source_col)
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum(F.size(words(text_col))).cast("long").alias("n_words"),
             F.sum(F.length(F.col(text_col))).cast("long").alias("n_chars"),
             pct.alias("__p"))
        .select(source_col, "n_docs", "n_words", "n_chars",
                F.round(F.col("__p")[0], 6).alias("p50_chars"),
                F.round(F.col("__p")[1], 6).alias("p90_chars"),
                F.round(F.col("__p")[2], 6).alias("p99_chars"))
    )
    vocab = (
        df.select(F.col(source_col),
                  F.explode(F.array_distinct(
                      F.transform(words(text_col), F.lower))).alias("tok"))
        .groupBy(source_col)
        .agg(F.count_distinct("tok").cast("long").alias("vocab_size"))
    )
    lang_counts = (
        df.groupBy(source_col, "lang").agg(F.count("*").alias("c"))
        .groupBy(source_col)
        .agg(F.max(F.struct(F.col("c"), F.col("lang"))).alias("__m"))
        .select(source_col, F.col("__m.lang").alias("top_lang"))
    )
    return (
        base.join(F.broadcast(vocab), source_col)
        .join(F.broadcast(lang_counts), source_col)
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    kgram: int = 4,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): hash every ``kgram``-token window, then in each sliding
    window of ``window`` consecutive hashes select the minimum (rightmost
    on ties); the distinct selected positions are the fingerprint set.
    Winnowing guarantees at least one fingerprint per ``window + kgram - 1``
    tokens, so any sufficiently long shared run between two documents
    shares a fingerprint — the local-sampling property plain modulo
    selection lacks.

    Returns one row per document with >= 1 k-gram:
    (id, n_kgrams, n_fingerprints, fp_min, fp_xor) — fp_xor is the
    XOR-fold of the distinct selected hashes (order-independent, so it
    is a stable per-doc digest for equality joins), fp_min the smallest.
    Documents shorter than ``kgram`` tokens never appear.

    Scale posture: ENTIRELY in-row (one scan, zero shuffles, zero
    joins) — hashes, window minima, tie-breaks, and the XOR digest are
    array expressions over the staged token array; cost per doc is
    O(tokens * window) with window a small constant. The portable
    md5-prefix integer hash keeps any engine bit-identical.
    """
    k, w = int(kgram), int(window)
    staged = df.select(F.col(id_col), words(text_col).alias("__w")) \
               .where(F.size("__w") >= k)
    n_kg = F.size("__w") - k + 1
    hashes = F.transform(
        F.sequence(F.lit(0), n_kg - 1),
        lambda i: F.conv(F.substring(
            F.md5(F.array_join(F.slice("__w", i + 1, k), " ")),
            1, 8), 16, 10).cast("long"))
    staged = staged.select(F.col(id_col), hashes.alias("__h"))
    n = F.size("__h")
    # per window j: the RIGHTMOST position of the window minimum
    # (position = j + (len - position of min in the reversed slice))
    sel = F.transform(
        F.sequence(F.lit(0), F.greatest(n - w, F.lit(0))),
        lambda j: j + F.size(F.slice("__h", j + 1, w))
        - F.array_position(
            F.reverse(F.slice("__h", j + 1, w)),
            F.array_min(F.slice("__h", j + 1, w))).cast("int"))
    staged = staged.select(
        F.col(id_col), "__h",
        F.array_distinct(sel).alias("__sel"))
    picked = F.transform("__sel", lambda p: F.element_at("__h", p + 1))
    return staged.select(
        F.col(id_col),
        F.size("__h").cast("long").alias("n_kgrams"),
        F.size("__sel").cast("long").alias("n_fingerprints"),
        F.array_min(picked).cast("long").alias("fp_min"),
        F.aggregate(picked, F.lit(0).cast("long"),
                    lambda acc, x: acc.bitwiseXOR(x)).alias("fp_xor"),
    )
