"""Deterministic corpus sampling / mixing.

Training-data pipelines mix sources at controlled rates ("20% of the
German pages, 5% of everything else"). Random ``sample()`` is
seed-dependent and unreproducible across engines and reruns;
hash-based sampling is a pure function of the row key, so reruns,
resumes, and audits see the same sample (and a SQL oracle can verify
it exactly via the md5-parity hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solrizer_spark.operators.dedup import md5_hash60


def hash_bucket(key: Column | str, buckets: int, salt: str = "") -> Column:
    """Stable bucket 0..buckets-1 from a key column: md5-derived
    60-bit int mod ``buckets`` (DuckDB-parity:
    ``('0x'||substr(md5(key||salt),1,15))::UBIGINT % buckets``)."""
    col = F.col(key) if isinstance(key, str) else key
    return md5_hash60(F.concat(col.cast("string"), F.lit(salt))) % buckets


def hash_bucket_100(key: Column | str, salt: str = "") -> Column:
    """Stable bucket 0-99 (the percent-rate convention used by the
    sampling operators)."""
    return hash_bucket(key, 100, salt).cast("int")


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash."""
    return df.where(hash_bucket_100(key_col, salt) < int(round(fraction * 100)))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (the ``sampleBy`` analog,
    reproducible and oracle-checkable): rows keep if their key bucket
    falls under their stratum's rate."""
    rate = F.lit(int(round(default_fraction * 100)))
    for value, frac in sorted(fractions.items()):
        rate = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * 100)))
        ).otherwise(rate)
    return df.where(hash_bucket_100(key_col, salt) < rate)


def temperature_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    temperature: float = 0.7,
    salt: str = "",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Temperature-weighted source rebalancing (the multilingual-LM
    mixing rule): keep source *s* at rate ``(c_s/c_min)^(T-1)`` so the
    sampled corpus has source proportions ∝ ``c_s^T`` — ``T=1`` keeps
    everything (natural distribution), ``T→0`` equalizes sources, with
    the smallest source always kept whole. Deterministic (key-hash
    thresholding, rerun/resume-stable, SQL-oracle-checkable), two
    passes: a count aggregate whose result is a per-source dim (rows =
    #sources, so the single-partition window over it and the broadcast
    join back are both trivially cheap at any corpus size).

    Rows whose source or key is NULL are excluded from BOTH the count
    dim and the output (an unlabeled row has no defined mixing rate —
    filter or label upstream); null sources in particular must not
    participate as a "smallest source" and skew every other rate."""
    if not 0.0 <= temperature <= 1.0:
        raise ValueError(f"temperature must be in [0, 1], got {temperature}")
    from pyspark.sql import Window

    base = df.where(F.col(source_col).isNotNull() & F.col(key_col).isNotNull())
    counts = base.groupBy(source_col).agg(F.count(F.lit(1)).alias("_c"))
    w = Window.partitionBy()  # over the tiny per-source dim only
    rates = (
        counts.withColumn("_cmin", F.min("_c").over(w))
        .withColumn(
            "_cut",
            F.floor(
                F.least(
                    F.lit(1.0),
                    F.pow(F.col("_c") / F.col("_cmin"), F.lit(temperature - 1.0)),
                )
                * buckets
            ).cast("long"),
        )
        .select(source_col, "_cut")
    )
    return (
        base.join(F.broadcast(rates), source_col)
        .where(hash_bucket(key_col, buckets, salt) < F.col("_cut"))
        .drop("_cut")
    )


def token_budget_mix(
    df: DataFrame,
    budget_tokens: int,
    source_col: str,
    key_col: str,
    token_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    buckets: int = 1_000_000,
    exact: bool = False,
) -> DataFrame:
    """Sample each source down to a TOKEN budget ("mix to 10B tokens:
    60% web, 30% code, 10% books") — the unit LLM data recipes are
    written in; :func:`temperature_mix` rebalances by DOC counts,
    which drifts arbitrarily when per-source document lengths differ.

    ``weights`` maps source → mixture weight (normalized over the
    sources present; sources absent from the dict get 0 and are
    dropped); ``None`` splits the budget ∝ each source's natural
    token mass (a pure global downscale). A source with fewer tokens
    than its target is kept whole — the shortfall is reported, not
    silently rebalanced (rebalancing would change OTHER sources'
    rates based on one source's exhaustion, making rates
    non-compositional across increments).

    Two modes, both deterministic and SQL-oracle-checkable:

    * ``exact=False`` (default, the 10^12 shape): keep rate
      ``min(1, target_s / tokens_s)`` by key-hash threshold — one
      per-source token-sum aggregate (a #sources-row dim), a
      broadcast join back, a map-side filter; zero sorts. Sampled
      token mass is target_s in expectation with O(1/√n_s) relative
      error — at a 10^10-token source that error is ~10^-5, far
      tighter than any recipe cares about.
    * ``exact=True``: within each source, order docs by
      ``(key-hash, key)`` and keep while the RUNNING token sum stays
      under target (the first boundary-crossing doc is included, so
      the target is always reached when the source can cover it).
      A per-source cumulative window — one shuffle on the source key
      and a per-partition external sort; use when the budget must be
      hit exactly (e.g. a fixed eval slice), not for bulk mixing.

    Output: the sampled rows plus ``_target_tokens`` (the source's
    integer token target) for audit joins."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    from pyspark.sql import Window

    base = df.where(F.col(source_col).isNotNull() & F.col(key_col).isNotNull())
    sums = base.groupBy(source_col).agg(
        F.sum(F.col(token_col).cast("long")).alias("_stok")
    )
    if weights is not None:
        total_w = sum(w for w in weights.values() if w > 0)
        if total_w <= 0:
            raise ValueError("weights must contain a positive entry")
        wexpr = F.lit(None).cast("double")
        for s, w in sorted(weights.items()):
            wexpr = F.when(F.col(source_col) == s, F.lit(w / total_w)).otherwise(wexpr)
        sums = sums.withColumn("_w", wexpr).where(F.col("_w").isNotNull())
    else:
        wtot = Window.partitionBy()  # over the tiny per-source dim only
        sums = sums.withColumn(
            "_w", F.col("_stok") / F.sum("_stok").over(wtot)
        )
    targets = sums.select(
        source_col,
        "_stok",
        F.floor(F.col("_w") * budget_tokens).cast("long").alias("_target_tokens"),
    )
    if not exact:
        rates = targets.select(
            source_col,
            "_target_tokens",
            F.floor(
                F.least(F.lit(1.0), F.col("_target_tokens") / F.col("_stok"))
                * buckets
            ).cast("long").alias("_cut"),
        )
        return (
            base.join(F.broadcast(rates), source_col)
            .where(hash_bucket(key_col, buckets, salt) < F.col("_cut"))
            .drop("_cut")
        )
    w = Window.partitionBy(source_col).orderBy(
        hash_bucket(key_col, buckets, salt), F.col(key_col)
    )
    running = F.sum(F.col(token_col).cast("long")).over(w)
    return (
        base.join(
            F.broadcast(targets.select(source_col, "_target_tokens")), source_col
        )
        .withColumn("_cum", running)
        .where(F.col("_cum") - F.col(token_col).cast("long") < F.col("_target_tokens"))
        .drop("_cum")
    )


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order: list[Column],
    k: int,
) -> DataFrame:
    """Best-k rows per group (curation: "keep the k highest-quality
    docs per language/domain"). A rank window per group — shuffles
    once on the group key, per-partition external sort, no global
    sort. ``order`` must be a total order (include a unique id as the
    last key) for deterministic, rerun-stable output."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= k)
        .withColumnRenamed("_rank", "group_rank")
    )


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap: int = 64,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Split long documents into overlapping fixed-size token chunks —
    the pretokenization step of a training pipeline (one context-
    window-sized sample per chunk, ``overlap`` tokens of left context
    carried into each subsequent chunk).

    Pure map-side: tokenize once, build all chunk structs with one
    ``transform`` over a ``sequence``, then ``posexplode``. No
    shuffle, so it composes into scan-time pipelines at any corpus
    size; output rows ≈ input tokens / (chunk_tokens − overlap).

    Emits ``chunk_index`` (0-based), ``chunk`` (space-joined token
    slice) and ``chunk_n_tokens``. Documents with ≤ ``chunk_tokens``
    tokens yield exactly one chunk (the whole text); null text yields
    no rows.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + step - 1) / step).cast("int") + F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * step + 1, chunk_tokens), " "),
    )
    keep = keep_cols if keep_cols is not None else [c for c in df.columns if c != text_col]
    out = df.where(F.col(text_col).isNotNull()).select(
        *keep, F.posexplode(chunks).alias("chunk_index", "chunk")
    )
    return out.withColumn("chunk_n_tokens", F.size(F.split(F.col("chunk"), " ")))


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order: list[Column],
    token_col: str,
    capacity: int,
) -> DataFrame:
    """Streaming sequence packing: assign each doc to a training bin of
    ~``capacity`` tokens, walking the group in ``order`` and cutting a
    new bin whenever the running token total crosses a capacity
    boundary — bin b holds the docs whose PRECEDING cumulative token
    count lies in ``[b*capacity, (b+1)*capacity)``. Deterministic,
    one window shuffle per group, and exactly reproducible in SQL
    (``sum() OVER (... ROWS UNBOUNDED PRECEDING)``), unlike greedy
    first-fit packers whose bins depend on partition boundaries.
    Emits ``bin_id`` and ``bin_offset`` (token offset inside the bin's
    preceding stream)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    preceding = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return df.withColumn("bin_id", (preceding / capacity).cast("long")).withColumn(
        "bin_offset", (preceding % capacity).cast("long")
    )


#: DSIR word-feature regex — lowercase letter runs, identical in Spark
#: (`regexp_extract_all`) and DuckDB; see q_importance_resample's oracle
DSIR_WORD_RE = "[a-z]+"


def hashed_word_features(text: Column | str, buckets: int) -> Column:
    """Hashed word features for importance resampling (DSIR, Xie et
    al. 2023, arXiv:2302.03169 — hashed n-gram features §2.2): every
    lowercase word maps to a bucket via the md5-parity 60-bit hash,
    keeping multiplicity (DSIR weights count feature OCCURRENCES, not
    the distinct set). Pure Column expression, zero Python."""
    col = F.col(text) if isinstance(text, str) else text
    words = F.regexp_extract_all(F.lower(col), F.lit(DSIR_WORD_RE), F.lit(0))
    return F.transform(words, lambda w: (md5_hash60(w) % buckets).cast("int"))


def dsir_log_ratio_table(
    df: DataFrame,
    text_col: str,
    target_cond: Column,
    buckets: int = 512,
    scale: int = 1_000_000,
) -> list[tuple[int, int]]:
    """Importance log-ratios per hashed feature, integer fixed-point.

    DSIR's importance weight for a document is
    ``Σ_f c_f(doc) · log(p_target(f) / p_raw(f))`` with add-1-smoothed
    hashed-feature distributions. The per-feature log-ratio table is
    FEATURE-DIM-sized (``buckets`` rows — a constant, never
    corpus-shaped), so it is computed driver-side from two bounded
    aggregations and quantized to ``round(log_ratio · scale)`` as
    int64 — document weights then come out of exact integer
    arithmetic, reproducible bit-for-bit in any SQL engine (the same
    dodge as operators/lm.py's rational arithmetic; float ``ln`` is
    evaluated ONCE here, never per-row or per-engine).

    Scale: the corpus-sized work is one explode + groupBy(feature)
    count with map-side combine; the collect is ≤ ``buckets`` rows.
    """
    from solrizer_spark.operators.repartition import ensure_min_parallelism

    # the per-word regexp + md5 feature map is CPU-heavy; a small
    # corpus in one parquet split would run it single-threaded
    # (no-op when the scan already has >= cores splits)
    feats = ensure_min_parallelism(df).select(
        target_cond.alias("_is_target"),
        F.explode(hashed_word_features(text_col, buckets)).alias("f"),
    )
    counts = (
        feats.groupBy("f")
        .agg(
            F.count(F.lit(1)).alias("_raw"),
            F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("_tgt"),
        )
        .collect()
    )
    raw = {r["f"]: r["_raw"] for r in counts}
    tgt = {r["f"]: int(r["_tgt"]) for r in counts}
    return quantized_log_ratios(raw, tgt, buckets, scale)


def quantized_log_ratios(
    raw: dict[int, int], tgt: dict[int, int], buckets: int, scale: int = 1_000_000
) -> list[tuple[int, int]]:
    """Pure kernel of :func:`dsir_log_ratio_table`:
    ``qlog_f = round(log((tgt_f+1)/Σ(tgt+1) / ((raw_f+1)/Σ(raw+1))) ·
    scale)`` — add-1 smoothing over ``buckets`` features, int64
    output (hypothesis-pinned: identical distributions → all-zero,
    raising a feature's target count never lowers its log-ratio)."""
    import math

    raw_total = sum(raw.values()) + buckets
    tgt_total = sum(tgt.values()) + buckets
    out = []
    for f in range(buckets):
        p_t = (tgt.get(f, 0) + 1) / tgt_total
        p_r = (raw.get(f, 0) + 1) / raw_total
        out.append((f, round(math.log(p_t / p_r) * scale)))
    return out


def dsir_importance_weights(
    df: DataFrame,
    ratio_rows: list[tuple[int, int]],
    text_col: str,
    id_col: str,
    buckets: int = 512,
    top_k: int | None = None,
) -> DataFrame:
    """Per-document DSIR importance weights + deterministic top-k
    selection flag.

    ``weight = Σ_f c_f(doc) · qlog_f`` (exact int64: quantized
    log-ratios from :func:`dsir_log_ratio_table`), computed by
    exploding the doc's hashed features against the BROADCAST ratio
    dim and summing per doc — one corpus-sized shuffle keyed by the
    doc id, map-side combinable. ``selected`` marks the ``top_k``
    highest-weight docs (ties broken by ascending id): the
    deterministic analog of DSIR's Gumbel-top-k resampling, chosen so
    a SQL oracle reproduces the sample exactly; swap in
    ``weight + gumbel(hash(id))`` for the statistical variant.

    The selection is TakeOrdered (per-partition top-k, k rows to the
    driver) + a broadcast semi-join flag — NOT a global rank window,
    which would single-partition-sort the corpus-sized weight table
    at 10^12 docs. ``top_k`` must be broadcast-sized (≲10^6)."""
    from solrizer_spark.operators.repartition import ensure_min_parallelism
    from solrizer_spark.session import local_df

    ratios = local_df(
        df.sparkSession, ratio_rows, "f int, qlog long"
    )
    # same CPU-heavy feature map as dsir_log_ratio_table — parallelize
    # small single-split scans (no-op at scale)
    feats = ensure_min_parallelism(df).select(
        F.col(id_col), F.explode(hashed_word_features(text_col, buckets)).alias("f")
    )
    weights = (
        feats.join(F.broadcast(ratios), "f")
        .groupBy(id_col)
        .agg(F.sum("qlog").alias("weight"))
    )
    # docs with zero features never appear in the explode: re-join so
    # they surface with weight 0 (DuckDB's LEFT JOIN mirrors this)
    out = (
        df.select(id_col)
        .join(weights, id_col, "left")
        .withColumn("weight", F.coalesce(F.col("weight"), F.lit(0)).cast("long"))
    )
    if top_k is not None:
        winners = (
            out.orderBy(F.col("weight").desc(), F.col(id_col).asc())
            .limit(top_k)  # TakeOrdered: no global sort exchange
            .select(F.col(id_col).alias("_sel_id"))
        )
        out = out.join(
            F.broadcast(winners), out[id_col] == F.col("_sel_id"), "left"
        ).select(
            id_col, "weight", F.col("_sel_id").isNotNull().alias("selected")
        )
    return out


def score_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 3,
    group_col: str | None = None,
    key_col: str = "doc_id",
    sample_fraction: float = 1.0,
    salt: str = "ppl",
    out_col: str = "score_bucket",
) -> DataFrame:
    """CCNet-style quantile bucketing (Wenzek et al. 2020): split the
    corpus into ``n_buckets`` quality tiers (0 = best) by per-group
    score quantiles — the head/middle/tail split CCNet applies to
    per-language LM perplexity before choosing which tier to train on.

    Thresholds are RANK-SELECTED, never interpolated: the boundary
    score is the real score at rank ``ceil(n·i/b)`` of the
    (score desc, key) total order, so there is no float-interpolation
    arithmetic to keep in cross-engine parity, and ties at a boundary
    land deterministically in the better tier (``score ≥ t_i``).

    Scale shape (CCNet's own): thresholds come from a deterministic
    ``sample_fraction`` hash-sample — the only rank window runs over
    that bounded sample, per group — and assignment is a broadcast
    dim join + map-side comparisons over the full corpus. At 10^12
    docs pass e.g. ``sample_fraction=1e-4``; the default 1.0 is exact
    and fine up to the size where a per-group sort hurts. Rows with a
    NULL score get a NULL bucket (unscorable ≠ worst)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be ≥ 2, got {n_buckets}")
    from pyspark.sql import Window

    base = df.where(F.col(score_col).isNotNull())
    sample = (
        hash_sample(base, key_col, sample_fraction, salt)
        if sample_fraction < 1.0
        else base
    )
    grp = [group_col] if group_col else []
    w = Window.partitionBy(*grp).orderBy(
        F.col(score_col).desc(), F.col(key_col)
    )
    cw = Window.partitionBy(*grp)
    ranked = (
        sample.select(*grp, score_col, key_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(cw))
    )
    th = ranked.groupBy(*grp).agg(
        *[
            F.min(
                F.when(
                    F.col("_rn") == F.ceil(F.col("_n") * i / n_buckets),
                    F.col(score_col),
                )
            ).alias(f"_t{i}")
            for i in range(1, n_buckets)
        ]
    )
    if grp:
        joined = df.join(F.broadcast(th), grp, "left")
    else:
        # dummy equi-key: a 1-row dim as BroadcastHashJoin, not BNLJ
        joined = df.withColumn("_one", F.lit(1)).join(
            F.broadcast(th.withColumn("_one", F.lit(1))), "_one"
        ).drop("_one")
    tier = None
    for i in range(1, n_buckets):
        below = (F.col(score_col) < F.col(f"_t{i}")).cast("int")
        tier = below if tier is None else tier + below
    bucket = F.when(F.col(score_col).isNotNull(), tier).otherwise(
        F.lit(None).cast("int")
    )
    return joined.withColumn(out_col, bucket).drop(
        *[f"_t{i}" for i in range(1, n_buckets)]
    )
