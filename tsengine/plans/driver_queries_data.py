"""Driver-contract queries for the training-data pipeline operators
(dedup / text analysis / similarity / multimodal / compression), over the
documents + embeddings tables, with DuckDB oracles wherever the op is
SQL-expressible.

Hash parity: Spark conv(substr(md5(x),1,15),16,10)::long ==
DuckDB CAST('0x'||substr(md5(x),1,15) AS BIGINT) — verified.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tsengine.operators import dedup, multimodal, similarity, textops

N_MINHASH = 8
SIMHASH_BITS = 16

# ---------------------------------------------------------------- engine side


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_dedup_exact(spark, sf_dir):
    return dedup.dedup_exact(_docs(spark, sf_dir))


def q_token_count(spark, sf_dir):
    return textops.token_count(_docs(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    return textops.quality_score(_docs(spark, sf_dir))


def q_language_id(spark, sf_dir):
    return textops.language_id(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    return textops.fingerprint(_docs(spark, sf_dir))


def q_simhash(spark, sf_dir):
    return dedup.simhash(_docs(spark, sf_dir), bits=SIMHASH_BITS)


def q_minhash(spark, sf_dir):
    sig = dedup.minhash_signatures(_docs(spark, sf_dir), num_hashes=N_MINHASH)
    return sig.select(
        "doc_id", *[F.col("mh")[i].alias(f"mh{i}") for i in range(N_MINHASH)]
    )


def q_jaccard_pairs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(docs, pairs=None, shingle_k=3, threshold=0.2)


def q_lsh_near_dups(spark, sf_dir):
    # fully value-checked: the affine minhash family + md5 band hashes are
    # deterministic and mirrored in the DuckDB oracle below
    docs = _docs(spark, sf_dir)
    pairs = dedup.lsh_candidate_pairs(docs, num_hashes=16, bands=8)
    return dedup.ngram_jaccard_pairs(docs, pairs, threshold=0.5)


def q_knn_bruteforce(spark, sf_dir):
    emb = _emb(spark, sf_dir).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    return similarity.cosine_topk_bruteforce(emb, qv, k=25)


def q_embedding_near_dups(spark, sf_dir):
    emb = _emb(spark, sf_dir).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return dedup.embedding_near_dups(emb, threshold=0.5, planes=6)


def q_knn_ivf(spark, sf_dir):
    # rows-only: IVF centroids trained on a driver-side sample
    emb = _emb(spark, sf_dir).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    cents = similarity.train_centroids(emb, n_cells=8, iters=3)
    return similarity.ivf_topk(emb, qv, cents, k=10, nprobe=3)


def q_compress_roundtrip(spark, sf_dir):
    """Gorilla+DoD roundtrip over the events series: the oracle is the
    IDENTITY query — decode(encode(x)) must equal the raw series."""
    from tsengine import compress as C
    from tsengine.core import events_as_series

    ev = events_as_series(spark, sf_dir)
    blocks = C.compress_series(ev)
    back = C.decompress_series(blocks)
    return back.select("series_id", "epoch", F.round("value", 6).alias("value"))


def q_transcript_rollup_1m(spark, sf_dir):
    """Rows-only: north-star tier rollup on the synthetic transcripts
    (bit-for-bit pinned against the pandas oracle in tests/test_rollup.py)."""
    from tsengine.operators import rollup as R
    from tsengine.synth import transcripts

    t = transcripts(spark, n_conv=40, base_turns=40, hot_factor=10)
    out = R.rollup_raw_to_tier(R.with_latency(t), "1m")
    return out.drop("role_dist", "tool_dist")


def q_multimodal_image_features(spark, sf_dir):
    media = multimodal.synth_media(spark, n=48)
    return multimodal.image_features(media, target=(4, 4)).select(
        "media_id", F.round("pixel_mean", 6).alias("pixel_mean")
    )


def q_multimodal_frame_sample(spark, sf_dir):
    media = multimodal.synth_media(spark, n=48)
    return multimodal.video_frame_sample(media, every_n=24)


# ---------------------------------------------------------------- oracle SQL

_H15 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
_TOKS = "list_transform(string_split_regex(trim(text), '\\s+'), x -> lower(x))"
_TOKS_CASED = "string_split_regex(trim(text), '\\s+')"
_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_SHINGLES = (
    "list_distinct([array_to_string(" + _TOKS + "[i:i+2], ' ') "
    "for i in range(1, greatest(len(" + _TOKS + ") - 2, 0) + 1)])"
)

ORACLE: dict[str, str] = {}

ORACLE["q_dedup_exact"] = f"""
SELECT md5({_NORM}) AS fp_md5, min(doc_id) AS keep_doc_id, count(*) AS n_dupes
FROM documents GROUP BY 1
"""

ORACLE["q_token_count"] = f"""
SELECT doc_id,
  CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS_CASED}) END::BIGINT AS n_tokens,
  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe,
  length(text)::BIGINT AS n_chars_computed
FROM documents
"""

_STOP_EN = "['the','and','of','to','in']"
ORACLE["q_quality_score"] = f"""
WITH t AS (
  SELECT doc_id, length(text)::DOUBLE AS n_chars,
    len({_TOKS_CASED})::DOUBLE AS n_toks,
    (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE AS n_punct,
    len(list_filter({_TOKS}, x -> list_contains({_STOP_EN}, x)))::DOUBLE AS n_stop
  FROM documents)
SELECT doc_id,
  floor((CASE WHEN n_toks > 0 THEN n_chars / n_toks ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS mean_tok_len,
  floor((CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS punct_ratio,
  floor((CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS stop_ratio,
  floor((0.4 * least(n_chars / 500.0, 1.0)
      + 0.3 * least(CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0.0 END * 5, 1.0)
      + 0.3 * (1.0 - least(CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END * 10, 1.0))
      ) * 1000000.0 + 0.5) / 1000000.0 AS quality
FROM t
"""

_LANGS = {
    "de": "['der','die','und','das','ist']",
    "en": "['the','and','of','to','in']",
    "es": "['el','la','de','que','los']",
    "fr": "['le','la','et','les','des']",
    "zh": "['的','是','不','了','在']",
}
_hits = ",\n  ".join(
    f"len(list_filter({_TOKS}, x -> list_contains({arr}, x)))::BIGINT AS hits_{lg}"
    for lg, arr in _LANGS.items()
)
_gh = "greatest(" + ", ".join(f"hits_{lg}" for lg in sorted(_LANGS)) + ")"
_pred = "CASE "
for lg in sorted(_LANGS):
    _pred += f"WHEN {_gh} > 0 AND hits_{lg} = {_gh} THEN '{lg}' "
_pred += "ELSE 'und' END"
ORACLE["q_language_id"] = f"""
WITH h AS (SELECT doc_id, {_hits} FROM documents)
SELECT doc_id, {', '.join('hits_' + lg for lg in sorted(_LANGS))}, {_pred} AS lang_pred
FROM h
"""

ORACLE["q_fingerprint"] = f"""
SELECT doc_id, md5({_NORM}) AS fp_md5,
       CAST(('0x' || substr(md5({_NORM}), 1, 15)) AS BIGINT) AS fp_int
FROM documents
"""

_simhash_votes = ",\n  ".join(
    f"sum(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(SIMHASH_BITS)
)
_simhash_sig = " + ".join(
    f"CASE WHEN v{b} > 0 THEN {2**b}::BIGINT ELSE 0 END" for b in range(SIMHASH_BITS)
)
ORACLE["q_simhash"] = f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
h AS (SELECT doc_id, {_H15.format(x='tok')} AS th FROM toks),
v AS (SELECT doc_id, {_simhash_votes} FROM h GROUP BY doc_id)
SELECT doc_id, {_simhash_sig} AS simhash FROM v
"""

from tsengine.operators.dedup import MINHASH_P, minhash_affine

_mh_cols = ",\n  ".join(
    "min(({a} * h + {b}) % {p}) AS mh{i}".format(
        a=minhash_affine(i)[0], b=minhash_affine(i)[1], p=MINHASH_P, i=i
    )
    for i in range(N_MINHASH)
)
ORACLE["q_minhash"] = f"""
WITH sh AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents),
h AS (SELECT doc_id, ({_H15.format(x='s')}) % {MINHASH_P} AS h FROM sh)
SELECT doc_id, {_mh_cols} FROM h GROUP BY doc_id
"""

ORACLE["q_jaccard_pairs"] = f"""
WITH sh AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(i / (na.n + nb.n - i), 6) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE round(i / (na.n + nb.n - i), 6) >= 0.2
"""

# Full MinHash-LSH chain in SQL: the affine hash family made signatures,
# band hashes, candidate pairs and the jaccard confirm all deterministic and
# DuckDB-expressible, upgrading this from a rows-only check to a full
# value-checked oracle (num_hashes=16, bands=8 mirror q_lsh_near_dups).
_lsh_mh = ",\n  ".join(
    "min(({a} * h + {b}) % {p}) AS mh{i}".format(
        a=minhash_affine(i)[0], b=minhash_affine(i)[1], p=MINHASH_P, i=i
    )
    for i in range(16)
)
_lsh_bands = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band, md5(CAST(mh{2*b} AS VARCHAR) || ',' || "
    f"CAST(mh{2*b+1} AS VARCHAR)) AS bh FROM sig"
    for b in range(8)
)
ORACLE["q_lsh_near_dups"] = f"""
WITH sh AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents),
h AS (SELECT doc_id, s, ({_H15.format(x='s')}) % {MINHASH_P} AS h FROM sh),
sig AS (SELECT doc_id, {_lsh_mh} FROM h GROUP BY doc_id),
bands AS ({_lsh_bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
  GROUP BY 1, 2)
SELECT doc_a, doc_b, round(i / (na.n + nb.n - i), 6) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE round(i / (na.n + nb.n - i), 6) >= 0.5
"""

ORACLE["q_compress_roundtrip"] = (
    "SELECT user_id AS series_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch, "
    "round(value, 6) AS value FROM events"
)


def _knn_sql() -> str:
    return """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings ORDER BY vec_id LIMIT 1),
scored AS (
  SELECT vec_id,
    round(list_dot_product(embedding::DOUBLE[], q.qv) /
          (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
           sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
  FROM embeddings, q)
SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id LIMIT 25
"""


ORACLE["q_knn_bruteforce"] = _knn_sql()


def _near_dup_sql() -> str:
    import numpy as np

    rng = np.random.RandomState(42)
    hyper = rng.normal(size=(6, 64))
    sig_terms = " + ".join(
        f"CASE WHEN list_dot_product(embedding::DOUBLE[], {hyper[p].tolist()}) > 0 "
        f"THEN {2**p}::BIGINT ELSE 0 END"
        for p in range(6)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec,
       sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
       ({sig_terms}) AS bucket
  FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm), 6) AS cosine
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm), 6) >= 0.5
"""


ORACLE["q_embedding_near_dups"] = _near_dup_sql()


QUERIES = {
    "q_dedup_exact": q_dedup_exact,
    "q_token_count": q_token_count,
    "q_quality_score": q_quality_score,
    "q_language_id": q_language_id,
    "q_fingerprint": q_fingerprint,
    "q_simhash": q_simhash,
    "q_minhash": q_minhash,
    "q_jaccard_pairs": q_jaccard_pairs,
    "q_lsh_near_dups": q_lsh_near_dups,
    "q_knn_bruteforce": q_knn_bruteforce,
    "q_embedding_near_dups": q_embedding_near_dups,
    "q_knn_ivf": q_knn_ivf,
    "q_compress_roundtrip": q_compress_roundtrip,
    "q_transcript_rollup_1m": q_transcript_rollup_1m,
    "q_multimodal_image_features": q_multimodal_image_features,
    "q_multimodal_frame_sample": q_multimodal_frame_sample,
}
