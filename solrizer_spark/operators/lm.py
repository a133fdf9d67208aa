"""Bigram language-model fluency scoring — the CCNet-style "does this
read like language?" quality signal (engine-original; pairs with
``text_stats.quality_score``'s surface heuristics).

CCNet filters on KenLM log-perplexity. This engine deliberately swaps
the geometric for the arithmetic mean: ``ln`` is NOT bit-reproducible
across engines (JVM ``Math.log`` disagrees with libm on ~7% of
inputs — measured), so a log-based score could never hash-match an
oracle or be byte-stable across cluster JVMs. Mean transition
probability + OOV rate rank documents nearly the same way and stay
in exact rational arithmetic: every probability is an integer ratio
(exactly rounded double), and per-document sums fold in token order
(``array_sort`` → left fold), so the result is bit-identical under
any partitioning and in DuckDB.

Scale design: the model is a TABLE, not a broadcast — training is one
map-side-combinable bigram count over the corpus plus a prefix-sum
window over the counts table (vocabulary-sized, not corpus-sized);
scoring is one shuffle join (bigram-exploded corpus ⋈ model) + one
per-doc aggregate. At 10^12 docs persist the model to a table and
bucket both sides on (w1, w2); nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: probability charged to a transition the model has never seen
DEFAULT_OOV_P = 1e-6


def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, w1, w2) — whitespace-token bigrams with position.

    (Round 6 note: a min-parallelism repartition guard here was
    measured 2× SLOWER at bench scale — the lm queries call _bigrams
    several times per plan and the extra text shuffles cost more than
    the single-task tokenize they spread. Deliberately left as-is.)"""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )
    return df.select(id_col, F.posexplode(pairs).alias("pos", "bg")).select(
        id_col,
        "pos",
        F.col("bg.w1").alias("w1"),
        F.col("bg.w2").alias("w2"),
    )


def train_bigram_model(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Corpus bigram transition table ``(w1, w2, p)`` with
    ``p = count(w1 w2) / count(w1 ·)`` — an exact integer ratio.
    Transitions seen fewer than ``min_count`` times are dropped (they
    score as OOV), which also bounds the model's long tail."""
    counts = _bigrams(df, text_col, id_col).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c2")
    )
    prefix = Window.partitionBy("w1")
    return (
        counts.withColumn("c1", F.sum("c2").over(prefix))
        .where(F.col("c2") >= min_count)
        .select("w1", "w2", (F.col("c2") / F.col("c1")).alias("p"))
    )


def _fold_scores(scored, df: DataFrame, id_col: str) -> DataFrame:
    """Shared per-doc fold for both scorers — THE bit-parity-critical
    code (position-sorted left fold, never ``F.avg``), kept in exactly
    one place so the two scorers cannot drift. Appends null-rate rows
    for docs with no bigram."""
    folded = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("oov").alias("n_oov"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "p"))),
                lambda s: s["p"],
            ),
            F.lit(0.0),
            lambda acc, p: acc + p,
        ).alias("sum_p"),
    )
    out = folded.select(
        id_col,
        "n_bigrams",
        (F.col("n_oov") / F.col("n_bigrams")).alias("oov_rate"),
        (F.col("sum_p") / F.col("n_bigrams")).alias("mean_p"),
    )
    empties = df.select(id_col).join(out.select(id_col), id_col, "left_anti")
    return out.unionByName(
        empties.select(
            id_col,
            F.lit(0).cast("long").alias("n_bigrams"),
            F.lit(None).cast("double").alias("oov_rate"),
            F.lit(None).cast("double").alias("mean_p"),
        )
    )


def lm_score(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_p: float = DEFAULT_OOV_P,
) -> DataFrame:
    """Per-document fluency: ``(id, n_bigrams, oov_rate, mean_p)``.

    ``mean_p`` sums probabilities in token order (sort by position,
    left fold) before dividing — NOT ``F.avg`` — so the double result
    is independent of partitioning and matches the oracle bit-for-bit.
    Documents with fewer than 2 tokens score ``n_bigrams=0`` with null
    rates."""
    scored = (
        _bigrams(df, text_col, id_col)
        .join(model, ["w1", "w2"], "left")
        .select(
            id_col,
            "pos",
            F.col("p").isNull().cast("long").alias("oov"),
            F.coalesce(F.col("p"), F.lit(float(oov_p))).alias("p"),
        )
    )
    return _fold_scores(scored, df, id_col)


def train_unigram_model(
    df: DataFrame,
    text_col: str = "text",
    max_vocab_rows: int | None = None,
) -> DataFrame:
    """Corpus unigram table ``(w, p)`` with ``p = count(w)/total`` —
    the backoff distribution for :func:`lm_score_backoff`. Exact
    integer ratio; one map-side-combinable count (the scalar total
    rides a window over the counts table, vocabulary-sized — and that
    assumption is ENFORCED: a row count over the same unpartitioned
    window, zero extra pass, feeds a ``raise_error`` guard so a
    pathological corpus whose "vocabulary" approaches corpus size
    fails loudly instead of silently funnelling it through the
    single-partition exchange). ``max_vocab_rows=None`` uses the
    shared :data:`solrizer_spark.functions.bpe.MAX_VOCAB_ROWS`."""
    from solrizer_spark.functions.bpe import MAX_VOCAB_ROWS

    bound = MAX_VOCAB_ROWS if max_vocab_rows is None else max_vocab_rows
    counts = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = Window.partitionBy()  # single global partition of the
    # vocabulary-sized counts table, not the corpus
    p = F.col("c") / F.sum("c").over(total)
    vrows = F.count(F.lit(1)).over(total)
    p = F.when(vrows <= bound, p).otherwise(
        F.raise_error(
            F.concat(
                F.lit("train_unigram_model: counts table has "),
                vrows.cast("string"),
                F.lit(
                    f" rows > max_vocab_rows={bound}; this is not a "
                    "vocabulary — refusing the global total window"
                ),
            )
        ).cast("double")
    )
    return counts.select("w", p.alias("p"))


def lm_score_backoff(
    df: DataFrame,
    bigram_model: DataFrame,
    unigram_model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    interp: tuple[int, int] = (7, 10),
    oov_p: float = DEFAULT_OOV_P,
) -> DataFrame:
    """Interpolated-backoff fluency: per transition,
    ``p = λ·p_bigram + (1−λ)·p_unigram(w2)`` with ``λ = interp[0]/
    interp[1]`` (a rational, so the doubles stay engine-exact); an
    unseen bigram contributes 0 to the first term, an unseen *word*
    falls to ``oov_p``. Smoother than :func:`lm_score`'s hard OOV
    floor — a rare-but-real word scores its unigram mass instead of
    1e-6. Same shuffle shape plus one extra join on ``w2``; same
    order-pinned fold, same bit-parity contract."""
    lam_n, lam_d = interp
    if not (0 <= lam_n <= lam_d) or lam_d <= 0:
        raise ValueError(f"interp must be a fraction in [0,1], got {interp}")
    lam = lam_n / lam_d
    scored = (
        _bigrams(df, text_col, id_col)
        .join(bigram_model, ["w1", "w2"], "left")
        .join(
            unigram_model.select(
                F.col("w").alias("w2"), F.col("p").alias("__p1")
            ),
            "w2",
            "left",
        )
        .select(
            id_col,
            "pos",
            (F.col("p").isNull() & F.col("__p1").isNull())
            .cast("long")
            .alias("oov"),
            (
                F.lit(lam) * F.coalesce(F.col("p"), F.lit(0.0))
                + F.lit(1 - lam) * F.coalesce(F.col("__p1"), F.lit(float(oov_p)))
            ).alias("p"),
        )
    )
    return _fold_scores(scored, df, id_col)
