"""Round-5 regressions: advisor findings + verdict items.

* ``ensure_min_parallelism`` must never execute upstream stages (the
  round-4 form probed ``df.rdd``, which under AQE finalizes the
  adaptive plan and eagerly RUNS every upstream shuffle stage).
* ``local_df`` must survive a one-shot iterator through its fallback.
* The "vocabulary-sized" global windows in ``build_vocab`` /
  ``train_unigram_model`` must fail loudly on a corpus whose token
  table is not vocabulary-shaped.
* ``learn_bpe``/``save_merges`` refuse ambiguous merge lists.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------
# ensure_min_parallelism: static estimate, no eager execution
# --------------------------------------------------------------------

def test_min_parallelism_never_executes_plan(spark):
    """A poisoned UDF downstream of a shuffle must NOT fire when the
    guard inspects the frame — the round-4 df.rdd probe ran it."""
    from solrizer_spark.operators.repartition import ensure_min_parallelism

    @F.udf("long")
    def boom(x):
        raise RuntimeError("guard executed the plan")

    df = (
        spark.range(100)
        .groupBy((F.col("id") % 10).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(boom(F.col("n")).alias("b"))
    )
    out = ensure_min_parallelism(df, floor=64)  # must not raise
    assert out is df  # shuffle-backed plan passes through untouched


def test_min_parallelism_repartitions_single_file_scan(spark, tmp_path):
    from solrizer_spark.operators.repartition import ensure_min_parallelism

    p = str(tmp_path / "one")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = ensure_min_parallelism(df, floor=4)
    assert out is not df
    assert out.rdd.getNumPartitions() == 4
    # already-parallel case: floor below the estimate passes through
    assert ensure_min_parallelism(df, floor=1) is df


def test_scan_split_estimate_counts_splits(spark, tmp_path):
    from solrizer_spark.operators.repartition import _scan_split_estimate

    p = str(tmp_path / "four")
    spark.range(1000).repartition(4).write.parquet(p)
    df = spark.read.parquet(p)
    est = _scan_split_estimate(df)
    assert est == 4
    # non-scan plan (local relation) → unknown
    assert _scan_split_estimate(spark.range(5)) is None


# --------------------------------------------------------------------
# local_df: one-shot iterable survives the fallback path
# --------------------------------------------------------------------

def test_local_df_accepts_generator(spark):
    from solrizer_spark.session import local_df

    rows = ((i, f"w{i}") for i in range(5))
    out = local_df(spark, rows, "id long, w string").collect()
    assert [(r.id, r.w) for r in out] == [(i, f"w{i}") for i in range(5)]


def test_local_df_generator_not_lost_on_fallback(spark, monkeypatch):
    """Force the pandas path to fail AFTER consuming rows: the
    fallback must still see all rows (round-4 silently built an
    empty frame)."""
    import pandas as pd

    from solrizer_spark import session as sess

    real = spark.createDataFrame

    def picky(data, schema=None, **kw):
        if isinstance(data, pd.DataFrame):
            raise ValueError("synthetic pandas-path failure")
        return real(data, schema, **kw)

    monkeypatch.setattr(spark, "createDataFrame", picky)
    rows = ((i,) for i in range(4))
    out = sess.local_df(spark, rows, "id long").collect()
    assert sorted(r.id for r in out) == [0, 1, 2, 3]


# --------------------------------------------------------------------
# vocabulary-sized window guards
# --------------------------------------------------------------------

def _garbage_docs(spark, n_docs=20, toks_per_doc=30):
    """Every token unique → 'vocabulary' == corpus token count."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(toks_per_doc)),
                lambda j: F.concat(
                    F.lit("g"), F.col("id").cast("string"), F.lit("x"),
                    j.cast("string"),
                ),
            ),
        ).alias("text"),
    )


def test_build_vocab_guard_trips_on_garbage_corpus(spark):
    from solrizer_spark.functions.bpe import bpe_train, build_vocab

    docs = _garbage_docs(spark)
    merges = bpe_train(docs, "text", num_merges=4, top_k=100)
    bad = build_vocab(docs, merges, "text", max_vocab_rows=10)
    with pytest.raises(Exception, match="not a vocabulary"):
        bad.collect()
    ok = build_vocab(docs, merges, "text", max_vocab_rows=10_000_000)
    assert ok.count() > 3


def test_unigram_guard_trips_on_garbage_corpus(spark):
    from solrizer_spark.operators.lm import train_unigram_model

    docs = _garbage_docs(spark)
    with pytest.raises(Exception, match="not a vocabulary"):
        train_unigram_model(docs, max_vocab_rows=10).collect()
    ok = train_unigram_model(docs, max_vocab_rows=10_000_000)
    assert abs(sum(r.p for r in ok.collect()) - 1.0) < 1e-9


def test_unigram_guard_preserves_probabilities(spark):
    """The guard column must not change p for a sane vocabulary."""
    from solrizer_spark.operators.lm import train_unigram_model

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    got = {
        r.w: r.p for r in train_unigram_model(docs, max_vocab_rows=100).collect()
    }
    assert got == {"a": 2 / 5, "b": 2 / 5, "c": 1 / 5}


# --------------------------------------------------------------------
# BPE merge-product uniqueness
# --------------------------------------------------------------------

def test_save_merges_rejects_ambiguous_list(spark, tmp_path):
    from solrizer_spark.functions.bpe import save_merges

    with pytest.raises(AssertionError, match="duplicate products"):
        save_merges(spark, [("ab", "c"), ("a", "bc")], str(tmp_path / "m"))


def test_learned_merges_have_unique_products(spark):
    from solrizer_spark.functions.bpe import learn_bpe

    merges = learn_bpe([("abcabc", 50), ("abc", 30), ("bc", 20)], 10)
    products = [a + b for a, b in merges]
    assert len(set(products)) == len(products)


# --------------------------------------------------------------------
# kmeans_fit iteration hygiene: input evaluated once, not per round
# --------------------------------------------------------------------

def test_kmeans_fit_persists_input_across_rounds(spark, tmp_path):
    """An expensive upstream plan must be evaluated ONCE (the persist
    materialization), not once per Lloyd round. The probe UDF appends
    one byte per row evaluation; O_APPEND single-byte writes are
    atomic across local[N] worker threads."""
    import os

    from solrizer_spark.operators.similarity import kmeans_fit

    probe = str(tmp_path / "evals")

    @F.udf("array<double>")
    def expensive_vec(i):
        fd = os.open(probe, os.O_WRONLY | os.O_CREAT | os.O_APPEND)
        os.write(fd, b".")
        os.close(fd)
        return [float(i % 3), float((i + 1) % 3), 1.0]

    n_rows, n_iter = 40, 3
    df = spark.range(n_rows).select(
        F.col("id").alias("vec_id"), expensive_vec("id").alias("embedding")
    )
    cents = kmeans_fit(df, k=3, n_iter=n_iter)
    assert len(cents) == 3
    evals = os.path.getsize(probe)
    # unpersisted, Lloyd's would re-run the UDF every round:
    # n_rows * (1 + n_iter). Persisted: exactly one pass.
    assert evals == n_rows, f"input evaluated {evals / n_rows:.1f}x"
    # and the persist must not leak past the fit
    assert not df.storageLevel.useMemory and not df.storageLevel.useDisk


def test_kmeans_fit_respects_caller_persist(spark):
    """A caller-persisted input must stay persisted after fit."""
    from solrizer_spark.operators.similarity import kmeans_fit

    df = spark.range(30).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 2).cast("double"),
            F.lit(1.0),
        ).alias("embedding"),
    ).persist()
    try:
        kmeans_fit(df, k=2, n_iter=2)
        assert df.storageLevel.useMemory or df.storageLevel.useDisk
    finally:
        df.unpersist()


# --------------------------------------------------------------------
# Exact substring (duplicate-span) dedup
# --------------------------------------------------------------------

def _ss_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "x y c d e f g z"),
            (3, "unique tokens only here ok"),
            (4, None),
            (5, "short"),
            (6, "a b c d e f g h"),
        ],
        "doc_id int, text string",
    )


def test_duplicate_spans_finds_shared_windows(spark):
    from solrizer_spark.operators.dedup import duplicate_spans

    rows = {
        (r["doc_id"], r["span_start"]): r
        for r in duplicate_spans(_ss_corpus(spark), span_tokens=4).collect()
    }
    # "c d e f" occurs in docs 1 (start 3), 2 (start 3), 6 (start 3)
    assert rows[(1, 3)]["n_occurrences"] == 3
    assert rows[(1, 3)]["span_hash"] == rows[(2, 3)]["span_hash"]
    # keeper is the global (id, start) minimum
    assert rows[(1, 3)]["is_keeper"] and not rows[(2, 3)]["is_keeper"]
    assert not rows[(6, 3)]["is_keeper"]
    # doc 3's windows are unique -> absent; doc 5 is shorter than the
    # window -> no spans at all
    assert not any(d == 3 or d == 5 for d, _ in rows)


def test_remove_duplicate_spans_keep_first(spark):
    from solrizer_spark.operators.dedup import remove_duplicate_spans

    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(_ss_corpus(spark), span_tokens=4).collect()
    }
    assert len(out) == 6  # every input row comes back
    # doc 1 is the keeper of every one of its spans -> untouched
    assert out[1]["cleaned_text"] == "a b c d e f g h"
    # doc 2 loses the 5 tokens covered by its two flagged windows
    assert out[2]["cleaned_text"] == "x y z"
    assert out[2]["n_tokens_kept"] == 3 and out[2]["n_tokens_dropped"] == 5
    # the verbatim copy is fully boilerplate -> empty, not null
    assert out[6]["cleaned_text"] == "" and out[6]["n_tokens_dropped"] == 8
    # null text passes through null with zero counters
    assert out[4]["cleaned_text"] is None and out[4]["n_tokens_kept"] == 0
    # untouched docs
    assert out[3]["cleaned_text"] == "unique tokens only here ok"
    assert out[5]["cleaned_text"] == "short"


def test_remove_duplicate_spans_keep_none(spark):
    from solrizer_spark.operators.dedup import remove_duplicate_spans

    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            _ss_corpus(spark), span_tokens=4, keep="none"
        ).collect()
    }
    # the C4-style rule removes the keeper's copy too
    assert out[1]["cleaned_text"] == "" and out[1]["n_tokens_dropped"] == 8
    assert out[2]["cleaned_text"] == "x y z"
    with pytest.raises(ValueError):
        remove_duplicate_spans(_ss_corpus(spark), keep="best")


def test_remove_duplicate_spans_overlap_coalesces(spark):
    """Overlapping flagged windows must not double-count dropped
    tokens (covered positions are distinct-ed per doc)."""
    from solrizer_spark.operators.dedup import remove_duplicate_spans

    df = spark.createDataFrame(
        [(1, "p q r s t u"), (2, "p q r s t u")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, span_tokens=3, keep="none").collect()
    }
    # 4 overlapping duplicated windows cover all 6 tokens exactly once
    assert out[1]["n_tokens_dropped"] == 6 and out[1]["n_tokens_kept"] == 0


class TestPartitionsForBytes:
    def test_small_input_one_wave(self):
        from solrizer_spark.operators.repartition import partitions_for_bytes
        # 56 MB bench corpus on 32 cores → exactly one task per core
        assert partitions_for_bytes(56 * 1024**2, 32) == 32

    def test_large_input_bytes_ruled(self):
        from solrizer_spark.operators.repartition import partitions_for_bytes
        # 100 TB → ~1.6M partitions of 64 MB, not a core-count multiple
        n = partitions_for_bytes(100 * 1024**4, 1000)
        assert n == 100 * 1024**4 // (64 * 1024**2)

    def test_cap_applies(self):
        from solrizer_spark.operators.repartition import partitions_for_bytes
        assert partitions_for_bytes(10 * 1024**3, 8, max_partitions=64) == 64

    def test_zero_bytes_floors_at_cpus(self):
        from solrizer_spark.operators.repartition import partitions_for_bytes
        assert partitions_for_bytes(0, 16) == 16


class TestSemanticDedup:
    def test_scaled_copies_flagged_originals_kept(self, spark):
        import pyspark.sql.functions as F
        from solrizer_spark.operators.similarity import kmeans_fit, semantic_dedup
        from solrizer_spark.session import local_df

        import __spark_entry__ as em
        emb = em._table(spark, "/root/testdata/sf0.001", "embeddings").select(
            "vec_id", "embedding"
        )
        copies = emb.where(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform(F.col("embedding"), lambda x: x * F.lit(1.001)).alias(
                "embedding"
            ),
        )
        union = emb.unionByName(copies)
        cents = kmeans_fit(emb, k=2, n_iter=2)
        out = semantic_dedup(union, cents, tau=0.99).persist()
        n_copies = copies.count()
        # every injected copy (higher id, cosine 1.0 to its source in
        # the same cell) is flagged; no original is
        assert out.where("semantic_dup AND vec_id >= 100000").count() == n_copies
        assert out.where("semantic_dup AND vec_id < 100000").count() == 0
        assert out.count() == union.count()
        out.unpersist()

    def test_max_cell_cap_bounds_flags(self, spark):
        import pyspark.sql.functions as F
        from solrizer_spark.operators.similarity import kmeans_fit, semantic_dedup

        import __spark_entry__ as em
        emb = em._table(spark, "/root/testdata/sf0.001", "embeddings").select(
            "vec_id", "embedding"
        )
        copies = emb.select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform(F.col("embedding"), lambda x: x * F.lit(1.001)).alias(
                "embedding"
            ),
        )
        union = emb.unionByName(copies)
        cents = kmeans_fit(emb, k=2, n_iter=2)
        uncapped = semantic_dedup(union, cents, tau=0.99)
        capped = semantic_dedup(union, cents, tau=0.99, max_cell=4)
        # the cap keeps ≤4 join participants per cell (lowest ids), so
        # at most 2 cells × C(4,2) pair checks can flag anything — far
        # fewer flags than the uncapped run, but never MORE
        n_unc = uncapped.where("semantic_dup").count()
        n_cap = capped.where("semantic_dup").count()
        assert n_cap <= n_unc
        assert n_cap <= 2 * 3  # ≤ cells × (max_cell - 1) possible dups
        assert capped.count() == union.count()  # caps recall, not rows


class TestDSIR:
    def test_target_tilt_and_determinism(self, spark):
        import pyspark.sql.functions as F
        from solrizer_spark.operators.sampling import (
            dsir_importance_weights,
            dsir_log_ratio_table,
        )

        import __spark_entry__ as em
        docs = em._table(spark, "/root/testdata/sf0.01", "documents").select(
            "doc_id", "text", "lang"
        )
        ratios = dsir_log_ratio_table(
            docs, "text", F.col("lang") == "en", buckets=256
        )
        assert len(ratios) == 256
        assert all(isinstance(q, int) for _, q in ratios)
        out = dsir_importance_weights(
            docs, ratios, "text", "doc_id", buckets=256, top_k=50
        ).persist()
        assert out.where("selected").count() == 50
        # English docs (the target) must carry higher mean weight
        means = {
            r["lang"]: r["m"]
            for r in out.join(docs.select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(F.avg("weight").alias("m"))
            .collect()
        }
        assert means["en"] > means["zh"]
        assert means["en"] > means["fr"]
        # rerun is bit-identical (pure function of the ratio table)
        again = dsir_importance_weights(
            docs, ratios, "text", "doc_id", buckets=256, top_k=50
        )
        assert out.exceptAll(again).count() == 0
        out.unpersist()

    def test_zero_feature_doc_gets_zero_weight(self, spark):
        from solrizer_spark.operators.sampling import dsir_importance_weights
        from solrizer_spark.session import local_df

        docs = local_df(
            spark,
            [(1, "hello world"), (2, "12345 !!!")],  # doc 2: no [a-z]+ runs
            "doc_id long, text string",
        )
        out = dsir_importance_weights(
            docs, [(0, 7), (1, -3)], "text", "doc_id", buckets=2
        )
        rows = {r["doc_id"]: r["weight"] for r in out.collect()}
        assert rows[2] == 0
        assert set(rows) == {1, 2}


class TestScanInputBytes:
    def test_parquet_scan_bytes_and_unknown(self, spark, tmp_path):
        import os

        from solrizer_spark.operators.repartition import _scan_input_bytes

        p = str(tmp_path / "t")
        spark.range(10000).write.parquet(p)
        df = spark.read.parquet(p)
        est = _scan_input_bytes(df)
        actual = sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )
        assert est == actual
        # a shuffle above the scan still reports the scan's bytes
        # (inputFiles walks to the underlying file relation)
        assert _scan_input_bytes(df.groupBy("id").count()) == actual
        # no file relation at all (local range) -> unknown, never a job
        assert _scan_input_bytes(spark.range(5)) is None


class TestMultibandLSH:
    def test_bands1_matches_legacy_and_bands_widen_candidates(self, spark):
        import pyspark.sql.functions as F
        from solrizer_spark.operators.similarity import lsh_topk

        import __spark_entry__ as em
        emb = em._table(spark, "/root/testdata/sf0.001", "embeddings").select(
            "vec_id", "embedding"
        )
        q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
        one = lsh_topk(emb, q, k=5).collect()
        one_again = lsh_topk(emb, q, k=5, bands=1).collect()
        assert [(r.vec_id, r.cos_sim) for r in one] == [
            (r.vec_id, r.cos_sim) for r in one_again
        ]
        # multiband probes a superset of candidates: its top-k scores
        # dominate the single-band top-k pairwise
        four = lsh_topk(emb, q, k=5, bands=4).collect()
        assert len(four) >= len(one)
        for r1, r4 in zip(one, four):
            assert r4.cos_sim >= r1.cos_sim
