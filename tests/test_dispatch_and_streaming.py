"""Per-model dispatch and incremental streaming tests."""

import os
import tempfile

from pyspark.sql import functions as F


def test_model_dispatch_unions_branches(spark, corpus_dir):
    from solrizer_spark.plans.pipeline import run_model_chains

    pages = spark.read.parquet(os.path.join(corpus_dir, "pages"))
    chains = {
        "html": ["content_model", "discoverability", "dates", "facets",
                 "aggregate_fields", "doc"],
        "plain": ["content_model", "dates", "facets", "aggregate_fields", "doc"],
        "__default__": ["content_model", "dates", "facets", "doc"],
    }
    out = run_model_chains(pages, chains).cache()
    assert out.count() == pages.count()  # no rows lost in the union
    # html branch ran discoverability; plain branch did not (nulls)
    assert out.where((F.col("route") == "html") & F.col("is_published").isNull()).count() == 0
    assert out.where((F.col("route") == "plain") & F.col("is_published").isNotNull()).count() == 0
    # default branch (tagged/failed) still has the doc column
    assert out.where(F.col("route") == "tagged").select("doc").first().doc is not None
    out.unpersist()


def test_stream_extract_incremental(spark, corpus_dir, tmp_path):
    """AvailableNow streaming processes only new files per pass and
    matches the batch chain output byte-for-byte."""
    from solrizer_spark.corpus.generator import write_corpus
    from solrizer_spark.streaming.incremental import stream_extract

    src = str(tmp_path / "incoming")
    out = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # first arrival: 60 pages
    first = tempfile.mkdtemp()
    write_corpus(first, n_pages=60, seed=42)
    os.rename(os.path.join(first, "pages", "part-00000.parquet"), os.path.join(src, "a.parquet"))

    stream_extract(spark, src, out, ckpt, n_buckets=8)
    n1 = spark.read.parquet(out).count()
    assert n1 == 60

    # second arrival: 40 more pages (different seed → different urls)
    second = tempfile.mkdtemp()
    write_corpus(second, n_pages=40, seed=7)
    os.rename(os.path.join(second, "pages", "part-00000.parquet"), os.path.join(src, "b.parquet"))

    stream_extract(spark, src, out, ckpt, n_buckets=8)
    docs = spark.read.parquet(out)
    assert docs.count() == 100  # only the 40 new rows appended

    # parity with the batch chain on the same input
    from solrizer_spark.plans.pipeline import run_chain

    batch = run_chain(spark.read.parquet(src)).select("url", "extracted_text", "doc")
    stream_sel = docs.select("url", "extracted_text", "doc")
    assert batch.exceptAll(stream_sel).count() == 0
    assert stream_sel.exceptAll(batch).count() == 0


def test_pluggable_faceter_registry(spark, corpus_dir):
    """Custom faceters (solrizer_faceters entry-point analog,
    facets.py:38-49) append {name}__facet columns."""
    from pyspark.sql import functions as F

    from solrizer_spark.plans.pipeline import FACETERS, run_chain

    FACETERS["decade"] = lambda df: F.concat(
        (F.year("warc_ts") - F.year("warc_ts") % 10).cast("string"), F.lit("s")
    )
    try:
        pages = spark.read.parquet(os.path.join(corpus_dir, "pages"))
        # registered faceters are selected per chain via conf (the
        # solrizer_faceters entry points register classes; the per-model
        # config picks which run)
        out = run_chain(
            pages, conf={"faceters": ["language", "ocr", "domain", "decade"]}
        )
        row = out.select("language__facet", "decade__facet").first()
        assert row["decade__facet"].endswith("0s")
    finally:
        del FACETERS["decade"]


def test_child_docs_stage(spark, corpus_dir):
    """Nested child documents from kept blocks (content_model.py:324-336
    analog): one struct per kept block, parent url as _root_."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from solrizer_spark.plans.pipeline import run_chain

    pages = spark.read.parquet(os.path.join(corpus_dir, "pages"))
    chain = ["extract", "content_model", "child_docs", "doc" ]
    out = run_chain(pages, ["extract", "content_model", "child_docs"],
                    {"include_blocks": True})
    row = out.where(F.col("blocks_kept") > 1).select("url", "pages").first()
    assert len(row.pages) > 1
    assert all(p._root_ == row.url for p in row.pages)
    assert row.pages[0].id.endswith("#block-" + str(row.pages[0].page_index__int))
    # fast path (no blocks) must fail loudly, not silently omit
    with _pytest.raises(ValueError, match="include_blocks"):
        run_chain(pages, ["extract", "child_docs"])


def test_configurable_aggregate_fields(spark, corpus_dir):
    from pyspark.sql import functions as F

    from solrizer_spark.plans.pipeline import run_chain

    pages = spark.read.parquet(os.path.join(corpus_dir, "pages"))
    conf = {"aggregate_fields": {"agg_text": ["extracted_text", "missing_col?"],
                                 "agg_all": ["url", "route"]}}
    out = run_chain(pages, ["extract", "aggregate_fields"], conf)
    row = out.where(F.col("extracted_text").isNotNull()).select("agg_text", "agg_all").first()
    assert len(row.agg_text) == 1  # optional missing col skipped
    assert len(row.agg_all) == 2
    # required missing column fails fast
    import pytest as _pytest
    with _pytest.raises(ValueError, match="requires column"):
        run_chain(pages, ["extract", "aggregate_fields"],
                  {"aggregate_fields": {"agg_x": ["nope"]}})


def test_stream_dedup_across_batches(spark, tmp_path):
    """Stateful url dedup must hold ACROSS AvailableNow invocations:
    a recrawled url arriving in a later batch is dropped via the
    checkpointed state store (within the watermark window)."""
    import tempfile

    from solrizer_spark.corpus.generator import write_corpus
    from solrizer_spark.streaming.incremental import stream_extract_dedup

    src = str(tmp_path / "incoming")
    out = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    first = tempfile.mkdtemp()
    write_corpus(first, n_pages=50, seed=42)
    os.rename(os.path.join(first, "pages", "part-00000.parquet"),
              os.path.join(src, "a.parquet"))
    stream_extract_dedup(spark, src, out, ckpt, n_buckets=8)
    assert spark.read.parquet(out).count() == 50

    # second arrival: the SAME 50 pages (recrawl) + 30 new ones
    second = tempfile.mkdtemp()
    write_corpus(second, n_pages=50, seed=42)  # identical urls
    os.rename(os.path.join(second, "pages", "part-00000.parquet"),
              os.path.join(src, "b.parquet"))
    third = tempfile.mkdtemp()
    write_corpus(third, n_pages=30, seed=9)
    os.rename(os.path.join(third, "pages", "part-00000.parquet"),
              os.path.join(src, "c.parquet"))

    stream_extract_dedup(spark, src, out, ckpt, n_buckets=8)
    docs = spark.read.parquet(out)
    # expected = distinct urls across all arrivals (seed corpora can
    # genuinely share a url — the dedup must collapse those too)
    expected = spark.read.parquet(src).select("url").distinct().count()
    assert expected < 130  # sanity: the 50 recrawls really are dups
    assert docs.count() == expected
    assert docs.select("url").distinct().count() == expected


def test_stream_stateful_domain_counts(spark, tmp_path):
    """applyInPandasWithState cumulative counter: totals accumulate
    across two AvailableNow runs through the checkpointed state."""
    import tempfile

    from pyspark.sql import functions as F

    from solrizer_spark.corpus.generator import write_corpus
    from solrizer_spark.streaming.incremental import stream_domain_counts

    src = str(tmp_path / "incoming")
    out = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def totals():
        return {
            r.domain: r.t
            for r in spark.read.parquet(out)
            .groupBy("domain").agg(F.max("total_docs").alias("t")).collect()
        }

    first = tempfile.mkdtemp()
    write_corpus(first, n_pages=40, seed=42)
    os.rename(os.path.join(first, "pages", "part-00000.parquet"),
              os.path.join(src, "a.parquet"))
    stream_domain_counts(spark, src, out, ckpt)
    t1 = totals()
    assert sum(t1.values()) == 40

    second = tempfile.mkdtemp()
    write_corpus(second, n_pages=40, seed=42)  # same domains again
    os.rename(os.path.join(second, "pages", "part-00000.parquet"),
              os.path.join(src, "b.parquet"))
    stream_domain_counts(spark, src, out, ckpt)
    t2 = totals()
    # cumulative: every domain's total doubled via checkpointed state
    assert t2 == {d: 2 * n for d, n in t1.items()}


def test_stream_dedup_against_base(spark, tmp_path):
    """Streaming increment vs static base: dups dropped per micro-
    batch; a second AvailableNow invocation processes only new files
    (checkpointed progress) and appends only new survivors."""
    from solrizer_spark.streaming.incremental import stream_dedup_against_base

    body = ("the quick brown fox jumps over the lazy dog and then sleeps "
            "in the warm afternoon sun for a while longer")
    base_path = str(tmp_path / "base")
    spark.createDataFrame(
        [("https://base.org/1", body)], ["url", "extracted_text"]
    ).write.parquet(base_path)

    inc = str(tmp_path / "inc")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("https://n.org/a", body),                       # exact dup
         ("https://n.org/b", "fresh streaming content with wholly new "
                             "vocabulary unlike the base corpus rows")],
        ["url", "extracted_text"],
    ).write.parquet(inc)
    stream_dedup_against_base(spark, inc, base_path, out, ckpt)
    kept = {r["url"] for r in spark.read.parquet(out).collect()}
    assert kept == {"https://n.org/b"}

    # second batch of files: near dup + fresh; only fresh appended
    spark.createDataFrame(
        [("https://n.org/c", " ".join(body.split()[:-1])),
         ("https://n.org/d", "another new document with its own words "
                             "sharing nothing with the existing base")],
        ["url", "extracted_text"],
    ).write.mode("append").parquet(inc)
    stream_dedup_against_base(spark, inc, base_path, out, ckpt)
    kept2 = {r["url"] for r in spark.read.parquet(out).collect()}
    assert kept2 == {"https://n.org/b", "https://n.org/d"}


def test_stream_bloom_dedup_accumulates(spark, tmp_path):
    """Streaming bloom dedup: base duplicates dropped join-free per
    micro-batch; with accumulate=True a SECOND invocation also drops
    duplicates of rows ADMITTED by the first (cross-batch dedup —
    the property the anti-join streaming form cannot offer), via the
    filter saved at save_updated_path."""
    from solrizer_spark.operators.bloom import bloom_build, save_bloom
    from solrizer_spark.streaming.incremental import stream_bloom_dedup

    base_texts = [f"base corpus document {i} stable tokens" for i in range(50)]
    base_df = spark.createDataFrame(
        [(f"https://base.org/{i}", t) for i, t in enumerate(base_texts)],
        ["url", "extracted_text"],
    )
    bf = bloom_build(base_df, "extracted_text", expected_items=50, fpp=0.001)
    bloom0 = str(tmp_path / "bloom0")
    save_bloom(spark, bf, bloom0)

    inc = str(tmp_path / "inc")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("https://n.org/a", base_texts[0]),              # base dup
         ("https://n.org/b", "first admitted streaming document words")],
        ["url", "extracted_text"],
    ).write.parquet(inc)
    bloom1 = str(tmp_path / "bloom1")
    stream_bloom_dedup(spark, inc, bloom0, out, ckpt,
                       save_updated_path=bloom1)
    kept = {r["url"] for r in spark.read.parquet(out).collect()}
    assert kept == {"https://n.org/b"}

    # second run, new files: a copy of the FIRST batch's admitted row
    # must now be dropped too (accumulated filter), fresh row kept
    spark.createDataFrame(
        [("https://n.org/c", "first admitted streaming document words"),
         ("https://n.org/d", "second wave wholly new content tokens")],
        ["url", "extracted_text"],
    ).write.mode("append").parquet(inc)
    bloom2 = str(tmp_path / "bloom2")
    stream_bloom_dedup(spark, inc, bloom1, out, ckpt,
                       save_updated_path=bloom2)
    kept2 = {r["url"] for r in spark.read.parquet(out).collect()}
    assert kept2 == {"https://n.org/b", "https://n.org/d"}

    # the accumulated filter knows all three populations
    from solrizer_spark.operators.bloom import bloom_might_contain, load_bloom
    final = load_bloom(spark, bloom2)
    probe = spark.createDataFrame(
        [(base_texts[0],), ("first admitted streaming document words",),
         ("second wave wholly new content tokens",),
         ("never seen anywhere text",)],
        ["extracted_text"],
    )
    hits = {
        r["extracted_text"]: r["bloom_hit"]
        for r in bloom_might_contain(probe, "extracted_text", final).collect()
    }
    assert hits[base_texts[0]] is True
    assert hits["first admitted streaming document words"] is True
    assert hits["second wave wholly new content tokens"] is True
    assert hits["never seen anywhere text"] is False


def test_stream_bloom_dedup_save_requires_await(spark, tmp_path):
    """ADVICE r5: saving the accumulated filter without awaiting
    termination would persist a partially-accumulated filter."""
    import pytest as _pytest

    from solrizer_spark.streaming.incremental import stream_bloom_dedup

    with _pytest.raises(ValueError, match="await_termination"):
        stream_bloom_dedup(
            spark,
            input_path=str(tmp_path / "in"),
            bloom_path=str(tmp_path / "bf"),
            output_path=str(tmp_path / "out"),
            checkpoint_path=str(tmp_path / "ckpt"),
            save_updated_path=str(tmp_path / "bf2"),
            await_termination=False,
        )
