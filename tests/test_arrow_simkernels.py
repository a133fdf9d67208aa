"""Arrow numpy similarity kernels — bit-parity with the Column folds.

operators/similarity.py's Arrow kernels (make_cosine_pair_udf,
make_dot_pair_udf, make_unit_udf, make_band_keys_udf,
make_assign_cell_sim_udf, make_cosine_to_query_udf) claim
BIT-IDENTICAL doubles to their interpreted-HOF Column twins — the
same discipline as make_pq_encode_udf. Every test here compares the
two paths with exact ``==`` over collected Python floats (equal bits
⇔ equal floats for non-NaN doubles), over float32 inputs that include
zero vectors (the zero-norm guard) and duplicated centroids (the
first-maximal tie-break).

Engine-original (no reference analog; the reference has no vector
ops — src/solrizer/indexers/extracted_text.py consumes binaries
per-request).
"""

import math
import random

import pyspark.sql.functions as F
import pytest

from solrizer_spark.operators.similarity import (
    assign_ivf_cell_sim,
    brute_force_topk,
    cosine,
    dot,
    embedding_near_dup_pairs,
    hyperplane_bucket,
    ivf_topk,
    kmeans_fit,
    lsh_topk,
    make_assign_cell_sim_udf,
    make_band_keys_udf,
    make_cosine_pair_udf,
    make_cosine_to_query_udf,
    make_dot_pair_udf,
    make_unit_udf,
    norm,
    semantic_dedup,
)

DIMS = 16


def _vecs(n, seed=11, dims=DIMS, dups_every=None, zeros_every=7):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        if zeros_every and i % zeros_every == 3:
            v = [0.0] * dims
        else:
            v = [rng.uniform(-1, 1) for _ in range(dims)]
        out.append((i, v))
        if dups_every and i % dups_every == 0:
            out.append((i + 10_000, list(v)))
    return out


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _vecs(120, dups_every=10), "vec_id long, embedding array<float>"
    ).cache()


@pytest.fixture(scope="module")
def pairs(spark, emb):
    a = emb.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("vb"))
    return (
        a.join(b, (F.col("ida") % 9) == (F.col("idb") % 9))
        .where(F.col("ida") < F.col("idb"))
        .cache()
    )


def test_cosine_pair_bitparity(pairs):
    rows = pairs.select(
        "ida",
        "idb",
        cosine(F.col("va"), F.col("vb")).alias("col_cos"),
        make_cosine_pair_udf(DIMS)(F.col("va"), F.col("vb")).alias("arrow_cos"),
    ).collect()
    assert rows, "join produced no pairs"
    for r in rows:
        assert r["col_cos"] == r["arrow_cos"], (r["ida"], r["idb"])


def test_dot_pair_bitparity(pairs):
    rows = pairs.select(
        dot(F.col("va"), F.col("vb")).alias("c"),
        make_dot_pair_udf(DIMS)(F.col("va"), F.col("vb")).alias("a"),
    ).collect()
    for r in rows:
        assert r["c"] == r["a"]


def test_unit_udf_bitparity(emb):
    nrm = norm(F.col("embedding"))
    col_unit = F.when(
        nrm != 0.0,
        F.transform(F.col("embedding"), lambda x: x.cast("double") / nrm),
    ).otherwise(F.transform(F.col("embedding"), lambda x: F.lit(0.0)))
    rows = emb.select(
        "vec_id",
        col_unit.alias("c"),
        make_unit_udf(DIMS)(F.col("embedding")).alias("a"),
    ).collect()
    for r in rows:
        assert list(r["c"]) == list(r["a"]), r["vec_id"]


def test_band_keys_bitparity(emb):
    bands, bits = 4, 6
    cols = [
        hyperplane_bucket(F.col("embedding"), bits, DIMS, offset=band * bits).alias(
            f"k{band}"
        )
        for band in range(bands)
    ]
    rows = emb.select(
        "vec_id",
        make_band_keys_udf(bands, bits, DIMS)(F.col("embedding")).alias("a"),
        *cols,
    ).collect()
    for r in rows:
        assert list(r["a"]) == [r[f"k{band}"] for band in range(bands)], r["vec_id"]


def test_assign_cell_sim_bitparity_with_ties(emb):
    rng = random.Random(3)
    c0 = [rng.uniform(-1, 1) for _ in range(DIMS)]
    # duplicated centroid: exact sim tie — both paths must pick the
    # FIRST (lowest) cell; plus a zero centroid (zero-norm guard)
    cents = [c0, list(c0), [rng.uniform(-1, 1) for _ in range(DIMS)], [0.0] * DIMS]
    rows = emb.select(
        "vec_id",
        assign_ivf_cell_sim(F.col("embedding"), cents).alias("c"),
        make_assign_cell_sim_udf(cents)(F.col("embedding")).alias("a"),
    ).collect()
    for r in rows:
        assert r["c"]["cell"] == r["a"]["cell"], r["vec_id"]
        assert r["c"]["sim"] == r["a"]["sim"], r["vec_id"]
    assert any(r["c"]["cell"] == 0 for r in rows), "tie case never exercised"


def test_cosine_to_query_bitparity(emb):
    q = [((i * 37) % 19 - 9) / 9.0 for i in range(DIMS)]
    nq = F.lit(math.sqrt(sum(float(v) * float(v) for v in q)))
    qarr = F.array(*[F.lit(float(v)) for v in q])
    nv = norm(F.col("embedding"))
    col_cos = F.when(
        nv * nq != 0.0, dot(F.col("embedding"), qarr) / (nv * nq)
    ).otherwise(F.lit(0.0))
    rows = emb.select(
        "vec_id",
        col_cos.alias("c"),
        make_cosine_to_query_udf(q)(F.col("embedding")).alias("a"),
    ).collect()
    for r in rows:
        assert r["c"] == r["a"], r["vec_id"]


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_brute_force_topk_arrow_equals_column(emb):
    q = [((i * 13) % 11 - 5) / 5.0 for i in range(DIMS)]
    a = brute_force_topk(emb, q, k=15, arrow=True)
    c = brute_force_topk(emb, q, k=15, arrow=False)
    assert _sorted_rows(a) == _sorted_rows(c)


def test_lsh_and_ivf_topk_arrow_equals_column(emb):
    q = [((i * 13) % 11 - 5) / 5.0 for i in range(DIMS)]
    a = lsh_topk(emb, q, k=10, n_bits=4, bands=2, arrow=True)
    c = lsh_topk(emb, q, k=10, n_bits=4, bands=2, arrow=False)
    assert _sorted_rows(a) == _sorted_rows(c)
    rng = random.Random(5)
    cents = [[rng.uniform(-1, 1) for _ in range(DIMS)] for _ in range(3)]
    a2 = ivf_topk(emb, q, cents, k=10, nprobe=2, arrow=True)
    c2 = ivf_topk(emb, q, cents, k=10, nprobe=2, arrow=False)
    assert _sorted_rows(a2) == _sorted_rows(c2)


def test_near_dup_pairs_arrow_equals_column(emb):
    a = embedding_near_dup_pairs(
        emb, threshold=0.99, dims=DIMS, band_bits=4, bands=4, arrow=True
    )
    c = embedding_near_dup_pairs(
        emb, threshold=0.99, dims=DIMS, band_bits=4, bands=4, arrow=False
    )
    ra, rc = _sorted_rows(a), _sorted_rows(c)
    assert ra == rc
    assert ra, "no near-dup pairs found — dups_every planted copies missing"


def test_semantic_dedup_arrow_equals_column(emb):
    cents = kmeans_fit(emb, k=3, n_iter=2, arrow=True)
    a = semantic_dedup(emb, cents, tau=0.99, arrow=True)
    c = semantic_dedup(emb, cents, tau=0.99, arrow=False)
    ra, rc = _sorted_rows(a), _sorted_rows(c)
    assert ra == rc
    assert any(r[2] for r in ra), "no semantic dup flagged"


def test_kmeans_fit_arrow_matches_column_assignments(emb):
    """Arrow and Column training assign identical cells every round
    (bit-identical sims), so the centroid streams agree to float-sum
    partition-order noise; assignments from either centroid set must
    coincide exactly on this corpus."""
    ca = kmeans_fit(emb, k=4, n_iter=3, arrow=True)
    cc = kmeans_fit(emb, k=4, n_iter=3, arrow=False)
    for va, vc in zip(ca, cc):
        for xa, xc in zip(va, vc):
            assert xa == pytest.approx(xc, rel=1e-9, abs=1e-12)
    rows = emb.select(
        assign_ivf_cell_sim(F.col("embedding"), ca)["cell"].alias("a"),
        assign_ivf_cell_sim(F.col("embedding"), cc)["cell"].alias("c"),
    ).collect()
    assert all(r["a"] == r["c"] for r in rows)


def test_simhash_arrow_bitparity(spark):
    """dedup.simhash: the memoized-md5 numpy kernel must equal the
    Column fold exactly (all-integer arithmetic) — including null
    text, empty text, runs of spaces, and repeated docs."""
    import random as _r

    from solrizer_spark.operators.dedup import simhash

    rng = _r.Random(21)
    words = [f"w{i}" for i in range(50)]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 60))))
        for i in range(80)
    ] + [(100, None), (101, ""), (102, "a  b   c "), (103, "w1 w2 w3")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        simhash("text", arrow=True).alias("a"),
        simhash("text", arrow=False).alias("c"),
    ).collect()
    assert all(r["a"] == r["c"] for r in out)
    assert next(r["a"] for r in out if r["doc_id"] == 100) is None


def test_simhash_pairs_arrow_equals_column(spark):
    from solrizer_spark.operators.dedup import simhash_near_dup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, base + f" tail{i}") for i in range(20)] + [
        (100, base + " tail1"),  # exact text dup of 1 -> hamming 0
        (200, "a wholly different document about completely other topics"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import solrizer_spark.operators.dedup as dd

    got = sorted(
        tuple(r) for r in simhash_near_dup_pairs(df, max_hamming=3).collect()
    )
    # force the Column fingerprint path through the same pair pipeline
    orig = dd.simhash
    try:
        dd.simhash = lambda t, bits=32, arrow=True: orig(t, bits, arrow=False)
        want = sorted(
            tuple(r) for r in simhash_near_dup_pairs(df, max_hamming=3).collect()
        )
    finally:
        dd.simhash = orig
    assert got == want
    assert (1, 100, 0) in [(a, b, h) for a, b, h in got]
