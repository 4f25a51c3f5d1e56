"""Text-analysis operators for large-scale training-data pipelines
(task brief: language-ID, quality scoring, token counting, document
fingerprinting).  All pure column expressions (JVM-side, codegen'd) so the
same logic is expressible as the DuckDB oracle SQL.

Cross-engine determinism notes:
- tokenization = split on runs of whitespace after trim;
- hashes use md5 (identical in Spark and DuckDB); 64-bit integers derived
  from the first 15 hex chars (60 bits, fits signed BIGINT in both).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword seed lists for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["的", "是", "不", "了", "在"],
}


def tokens_expr(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate
    (ceil(chars/4) is the common 4-chars-per-token heuristic)."""
    toks = tokens_expr(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.ceil(F.length(text_col) / F.lit(4)).cast("long").alias("n_tokens_bpe"),
        F.length(text_col).cast("long").alias("n_chars_computed"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    score in [0,1].  All column arithmetic."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    toks = tokens_expr(t)
    n_toks = F.size(toks).cast("double")
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))).cast("double")
    en_stop = F.lit(LANG_STOPWORDS["en"])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(en_stop, F.lower(x))))
    mean_tok_len = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_toks > 0, n_stop / n_toks).otherwise(F.lit(0.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    # floor-based 6dp quantization: floor(x*1e6 + 0.5) is pure IEEE arithmetic,
    # bit-identical across engines, unlike round() whose half-boundary
    # behavior differs between Spark (BigDecimal HALF_UP) and DuckDB
    def q6(c):
        return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)

    return df.select(
        "doc_id",
        q6(mean_tok_len).alias("mean_tok_len"),
        q6(punct_ratio).alias("punct_ratio"),
        q6(stop_ratio).alias("stop_ratio"),
        q6(score).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language heuristic: count per-language stopword hits in
    the token stream, pick the argmax (ties broken by language code order,
    'und' when no hits)."""
    toks = F.transform(tokens_expr(F.col(text_col)), lambda x: F.lower(x))
    out = df.select("doc_id", toks.alias("_toks"))
    hit_cols = []
    for lang, words in sorted(LANG_STOPWORDS.items()):
        arr = F.lit(words)
        c = F.size(F.filter(F.col("_toks"), lambda x: F.array_contains(arr, x)))
        hit_cols.append(c.cast("long").alias(f"hits_{lang}"))
    out = out.select("doc_id", *hit_cols)
    langs = sorted(LANG_STOPWORDS)
    # argmax with lexicographic tie-break, 'und' when no stopword hits at all
    gh = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when((gh > 0) & (F.col(f"hits_{lang}") == gh), F.lit(lang)).otherwise(pred)
    return out.select("doc_id", *[f"hits_{lg}" for lg in langs], pred.alias("lang_pred"))


def md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT — engine-portable hash."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized lowercase text
    (content-defined identity for exact dedup joins) + its 60-bit int form."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    h = F.md5(norm)
    return df.select(
        "doc_id",
        h.alias("fp_md5"),
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("fp_int"),
    )


def shingle_rows_raw(df, text_col: str = "text", k: int = 3, id_col: str = "doc_id"):
    """Exploded RAW (id, shingle) rows — duplicates preserved, zero shuffles.
    This is the right input for any duplicate-insensitive downstream aggregate
    (minhash: min() over a multiset == min() over the set), where a dedup pass
    is pure waste: the ``.distinct()`` variant shuffles the ENTIRE exploded
    stream and then pays a second exchange because (id, s) partitioning does
    not satisfy a groupBy(id) clustering (measured 103.6 s vs 6.0 s cold on
    sf0.1 — an extra full-data shuffle is exactly what does not survive
    100 TB).  Use :func:`shingle_rows` only where set semantics matter.

    The token array is MATERIALIZED into its own projection before the
    per-index shingle lambda: with the tokenization expression inlined,
    codegen re-evaluates trim+split+lower(text) once PER SHINGLE INDEX
    inside the ``transform`` lambda — O(tokens²) work per document
    (measured 5.0 s vs 0.4 s on sf0.1 documents, a 13x penalty that grows
    with document length)."""
    toked = df.select(
        id_col,
        F.transform(tokens_expr(F.col(text_col)), lambda x: F.lower(x)).alias("_toks"),
    )
    toks = F.col("_toks")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    arr = F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))
    return toked.select(id_col, F.explode(arr).alias("s"))


def shingle_rows(df, text_col: str = "text", k: int = 3, id_col: str = "doc_id"):
    """Exploded DISTINCT (id, shingle) rows, for consumers that need SET
    semantics (n-gram Jaccard set cardinalities).  Dedup happens as a hash
    aggregate AFTER the explode, not via ``array_distinct`` inside the row
    (O(S^2) per-document scan)."""
    return shingle_rows_raw(df, text_col, k, id_col).distinct()


def shingles_expr(text: Column, k: int = 3) -> Column:
    """Word k-shingles as strings ('w1 w2 w3'), distinct, from the token
    stream.  Pure array functions — no UDF.

    Column-level variant (no DataFrame to project onto), so it avoids the
    per-element token recompute differently than :func:`shingle_rows_raw`:
    the shingle list is built by zipping k SHIFTED SLICES of the token array
    — the tokenization expression appears k times total per row, not once
    per shingle index.  Prefer :func:`shingle_rows_raw` where a projection
    is available."""
    toks = F.transform(tokens_expr(text), lambda x: F.lower(x))
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(0))
    zipped = F.slice(toks, k, m)
    for off in range(k - 2, -1, -1):
        zipped = F.zip_with(
            F.slice(toks, off + 1, m), zipped, lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.array_distinct(zipped)
