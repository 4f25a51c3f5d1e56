"""Deduplication operators for training-data pipelines (task brief):
exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-duplicates.

Scale design:
- exact dedup is a single hash-shuffle on the fingerprint;
- MinHash/LSH: shingle -> K minhashes -> B bands -> self-join per band
  bucket (candidate pairs only; never O(n²));
- SimHash: 64-bit majority-vote signature from md5-derived token hashes
  (pure explode + bit arithmetic, no UDF);
- embedding cosine: LSH via random-hyperplane signs (seeded, deterministic)
  to bucket, exact cosine within buckets.

All hashes are md5-derived so DuckDB oracles can reproduce them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsengine.operators.textops import fingerprint, shingles_expr


def dedup_exact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: keep the min doc_id per normalized-text fingerprint.
    One shuffle on the md5 key; map-side partial min."""
    fp = fingerprint(df, text_col)
    return (
        fp.groupBy("fp_md5")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dupes"))
    )


MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def minhash_affine(i: int) -> tuple[int, int]:
    """Deterministic (a, b) for the i-th universal hash h_i(x) = (a*x+b) mod P.
    a*x fits int64 for x < P, so the same formula evaluates identically in
    Spark (wrapping longs never reached) and DuckDB (strict BIGINT)."""
    a = (1103515245 * (i + 1) + 12345) % MINHASH_P or 1
    b = (2027 * i + 577) % MINHASH_P
    return a, b


def minhash_signatures(
    df: DataFrame, text_col: str = "text", num_hashes: int = 16, shingle_k: int = 3
) -> DataFrame:
    """K minhash values per doc via ONE md5 base hash per shingle plus K
    affine universal hashes (a_i*h + b_i) mod (2^31-1) — instead of K md5
    calls per shingle, which dominated the old profile.
    Output: doc_id, mh (array<long> length K)."""
    sh = shingles_expr(F.col(text_col), k=shingle_k)
    base = (
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
        % F.lit(MINHASH_P)
    )
    e = df.select("doc_id", F.explode(sh).alias("shingle")).withColumn("_h", base)
    mh_cols = []
    for i in range(num_hashes):
        a, b = minhash_affine(i)
        mh_cols.append(
            F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{i}")
        )
    sig = e.groupBy("doc_id").agg(*mh_cols)
    return sig.select("doc_id", F.array(*[f"mh{i}" for i in range(num_hashes)]).alias("mh"))


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup candidates: docs sharing any band bucket.
    Returns distinct (doc_a, doc_b) with doc_a < doc_b.

    Shuffle profile: one agg for signatures, one explode->self-join keyed by
    (band, band_hash) — the join keys are uniformly distributed md5 buckets,
    so no skew; AQE handles residual imbalance.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, num_hashes, shingle_k)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.array_join(
                                F.transform(
                                    F.slice("mh", b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (from LSH, or all
    pairs sharing at least one shingle when pairs=None — still never a full
    cross join).  Output: doc_a, doc_b, jaccard."""
    from pyspark.sql import Window

    # shingle rows carry their doc's shingle-set size via a window — the
    # sizes ride through the join, so no per-doc sizes table and no two
    # extra joins at the end (the old shape recomputed the text->shingle
    # explode three times).
    sh = df.select(
        "doc_id", F.explode(shingles_expr(F.col(text_col), k=shingle_k)).alias("s")
    ).withColumn("n", F.count("*").over(Window.partitionBy("doc_id")))
    if pairs is None:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(b, F.col("a.s") == F.col("b.s"))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("inter"),
                 F.first(F.col("a.n")).alias("na"), F.first(F.col("b.n")).alias("nb"))
        )
    else:
        # equi-join on BOTH (doc, shingle) keys: the old shape joined on doc
        # alone and filtered s == s2 afterwards — a per-pair cartesian of the
        # two shingle sets (|A| x |B| rows per candidate pair) that the hash
        # join on the composite key never materializes.
        inter = (
            pairs.join(
                sh.select(F.col("doc_id").alias("doc_a"), "s",
                          F.col("n").alias("na")), "doc_a")
            .join(
                sh.select(F.col("doc_id").alias("doc_b"), "s",
                          F.col("n").alias("nb")), ["doc_b", "s"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("inter"),
                 F.first("na").alias("na"), F.first("nb").alias("nb"))
        )
    out = (
        inter
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


def simhash(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash signature: per token take `bits` bits of md5(token); each bit
    position votes +1/-1; signature bit = majority.  Expressed as
    explode(token) x explode(bit position) -> conditional agg -> bit OR.
    Output: doc_id, simhash (long)."""
    from tsengine.operators.textops import tokens_expr

    toks = df.select(
        "doc_id", F.explode(F.transform(tokens_expr(F.col(text_col)), F.lower)).alias("tok")
    )
    h = toks.withColumn(
        "th", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = h.groupBy("doc_id").agg(*votes)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0))
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_near_dups(df: DataFrame, text_col: str = "text", bits: int = 16, max_hamming: int = 2) -> DataFrame:
    """Near-dup pairs by simhash hamming distance <= max_hamming, bucketed by
    simhash bands (two halves) so the self-join never goes O(n²)."""
    s = simhash(df, text_col, bits)
    half = bits // 2
    banded = s.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), F.shiftright("simhash", half).alias("key")),
                F.struct(
                    F.lit(1).alias("band"),
                    F.col("simhash").bitwiseAND(F.lit(2**half - 1)).alias("key"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.key")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def embedding_near_dups(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicates: random-hyperplane LSH bucket, exact
    cosine inside buckets, keep pairs >= threshold."""
    import numpy as np

    dim = len(emb.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    hyper = rng.normal(size=(planes, dim))

    v = F.col(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    sig = F.lit(0).cast("long")
    for p in range(planes):
        plane = F.lit(hyper[p].tolist())
        dot = F.aggregate(
            F.zip_with(v, plane, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
        sig = sig + F.when(dot > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0))
    e = emb.select(F.col(id_col).alias("vid"), v.alias("vec"), norm.alias("nrm"), sig.alias("bucket"))
    a, b = e.alias("a"), e.alias("b")
    dot_ab = F.aggregate(
        F.zip_with(F.col("a.vec"), F.col("b.vec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round(dot_ab / (F.col("a.nrm") * F.col("b.nrm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
