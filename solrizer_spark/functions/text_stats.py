"""Text analysis functions for training-data pipelines — all native
Column expressions (JVM-side, codegen'd; no Python per row).

* token counting (whitespace + a BPE-ish subword estimate)
* quality scoring (length / punctuation / stopword signals)
* language-ID heuristic (stopword-profile scoring)
* document fingerprinting (polynomial rolling hash, DuckDB-parity)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny public stopword profiles (top function words per language)
STOPWORD_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "est", "que"),
}

ROLLING_BASE = 131
ROLLING_MOD = 2_147_483_647  # 2^31 − 1


def tokens(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.split(col, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


#: BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct split,
#: simplified to the RE2/Java-common subset — no lookaheads)
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(text: Column | str) -> Column:
    """Token count under a BPE-style pre-tokenization regex (letters /
    digits / punctuation runs) — the standard first pass of GPT-style
    tokenizers; reproducible in SQL via ``regexp_extract_all``."""
    col = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(col, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))


def subword_count_estimate(text: Column | str, chars_per_token: float = 4.0) -> Column:
    """BPE-ish token count estimate: word boundaries + length-based
    subword splits (a word of L chars ≈ ceil(L/4) subword tokens)."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / chars_per_token).cast("long"),
    )


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORD_PROFILES[lang])))
    return hits.cast("double") / F.size(toks)


def punct_ratio(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(col, r"[^\p{L}\p{N}\s]", "")
    return (F.length(col) - F.length(stripped)).cast("double") / F.length(col)


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic (C4/Gopher-style signals):
    penalizes very short docs, extreme punctuation, missing stopwords,
    and degenerate mean word length."""
    col = F.col(text) if isinstance(text, str) else text
    n = token_count(col)
    mean_len = F.length(col).cast("double") / n
    len_ok = F.when((n >= 10) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    word_ok = F.when((mean_len >= 3.0) & (mean_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col, "en") >= 0.01, F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_ok + word_ok + punct_ok + stop_ok) / 4.0, 4)


def langid(text: Column | str) -> Column:
    """Stopword-profile language ID: predicted language = argmax of
    per-language stopword hit ratio, ties broken by language code
    ascending; all-zero scores → 'und' (undetermined)."""
    toks = tokens(text)
    n = F.size(toks)

    def in_profile(words: tuple[str, ...]):
        # closure factory, not a default arg: pyspark treats a second
        # lambda parameter as the array-index variable
        return lambda t: t.isin(*words)

    scores = [
        (code, F.size(F.filter(toks, in_profile(ws))).cast("double") / n)
        for code, ws in sorted(STOPWORD_PROFILES.items())
    ]
    # array-argmax, not a when-chain fold: the fold form references
    # the running best twice per step — an O(2^n_profiles) expression
    # tree (see similarity.assign_ivf_cell_sim, where the same shape
    # OOM'd the planner at 16 branches). array_position picks the
    # FIRST maximal score = lowest sorted code on ties, identical to
    # the strictly-greater fold it replaces.
    sarr = F.array(*[score for _, score in scores])
    best_score = F.array_max(sarr)
    best_lang = F.element_at(
        F.array(*[F.lit(code) for code, _ in scores]),
        F.array_position(sarr, best_score).cast("int"),
    )
    return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))


def winnow_fingerprints(
    text: Column | str, k: int = 8, window: int = 4
) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    MOSS scheme): 60-bit md5 hashes of character ``k``-grams, minimum
    per sliding ``window``, distinct + sorted. Guarantees any match of
    length ≥ ``k + window − 1`` shares a fingerprint. Pure Column
    expression (and SQL-reproducible via the same md5-prefix hash)."""
    col = F.col(text) if isinstance(text, str) else text
    n_kgrams = F.length(col) - (k - 1)
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n_kgrams, F.lit(1))),
        lambda i: F.conv(F.substring(F.md5(col.substr(i, F.lit(k))), 1, 15), 16, 10).cast("long"),
    )
    n_windows = F.size(hashes) - (window - 1)
    mins = F.when(n_windows <= 0, F.array(F.array_min(hashes))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
            lambda j: F.array_min(F.slice(hashes, j, window)),
        )
    )
    return F.array_sort(F.array_distinct(mins))


def rolling_fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash of the character stream:
    ``h = (h·131 + ascii(c)) mod (2^31−1)`` — DuckDB-reproducible via
    ``list_reduce(list_prepend('0', string_split(text,'')), ...)``."""
    col = F.col(text) if isinstance(text, str) else text
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + F.ascii(c)) % ROLLING_MOD,
    )


def dup_line_fraction(text: Column | str, sep: str = "\n") -> Column:
    """Gopher-style repetition signal: fraction of lines that are
    repeats of an earlier line (0.0 when every line is unique).
    Documents dominated by repeated lines (boilerplate listings,
    scraper loops) are low-quality training text. ``sep`` is a literal
    separator string (regex-escaped before it reaches ``F.split``, so
    passing ``'.'`` or ``'|'`` splits on those characters, not on
    every character)."""
    import re

    col = F.col(text) if isinstance(text, str) else text
    lines = F.split(col, re.escape(sep))
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / F.size(lines), 6
    )


def top_ngram_fraction(text: Column | str, n: int = 2) -> Column:
    """Gopher-style repetition signal: the fraction of tokens covered
    by the single most frequent word n-gram (``count(top gram) · n /
    n_tokens``). Pure map-side expression: sort the gram array, then
    one ``aggregate`` fold counts the longest equal-run — no
    explode/groupBy, so it composes into per-doc quality filters at
    scan time."""
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(col, " ")
    k = F.size(toks) - (n - 1)
    grams = F.when(k <= 0, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )
    folded = F.aggregate(
        F.array_sort(grams),
        acc0,
        lambda a, g: F.struct(
            g.alias("prev"),
            F.when(g == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                a["best"],
                F.when(g == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
    )
    # cap at 1.0: overlapping runs ("x x x" → two "x x" bigrams over 3
    # tokens) and sub-n-token docs (single whole-text gram) would
    # otherwise push the "fraction" above 1
    return F.round(
        F.least(folded["best"].cast("double") * n / F.size(toks), F.lit(1.0)), 6
    )


def hashed_linear_score(
    text: Column | str, weights: list[float], bias: float = 0.0
) -> Column:
    """fastText-style hashed bag-of-words linear model score, as one
    JVM-side fold: each token hashes (md5-60bit, DuckDB-reproducible)
    into a bucket of the ``weights`` table and the score is
    ``bias + Σ weights[bucket(token)]`` — the standard shape of a
    learned quality/toxicity/language filter applied at scan time to
    10^12 docs with zero Python and zero shuffle. ``weights`` is the
    trained vector (any length; it ships as one array literal in the
    plan). Rounded to 6 dp so equal logical scores compare equal
    across engines regardless of FP summation order."""
    from solrizer_spark.operators.dedup import md5_hash60

    col = F.col(text) if isinstance(text, str) else text
    n = len(weights)
    if n == 0:
        raise ValueError("weights must be non-empty")
    table = F.array(*[F.lit(float(w)) for w in weights])
    return F.round(
        F.aggregate(
            F.split(col, " "),
            F.lit(float(bias)),
            lambda acc, t: acc
            + F.element_at(table, ((md5_hash60(t) % n) + 1).cast("int")),
        ),
        6,
    )
