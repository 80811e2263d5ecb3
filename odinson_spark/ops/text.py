"""Text analysis operators (language-ID heuristic, quality scoring, token
counting, document fingerprinting). All JVM-side — whole-stage codegen, no
Python workers; each has an exact SQL oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# function words used by the n-gram/stopword language heuristic
EN_MARKERS = ("the", "a", "of", "and", "to", "in", "is", "it")


def token_stats(documents: DataFrame) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (ceil(len/4) per
    token — the standard chars/4 rule of thumb, deterministic)."""
    toks = F.split(F.col("text"), " ")
    subwords = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("int")
    )
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        subwords.alias("n_subwords"),
        F.length("text").alias("n_chars_actual"),
    )


TOKEN_STATS_ORACLE_SQL = """
SELECT doc_id,
       len(string_split(text, ' '))::INT AS n_tokens,
       list_aggregate(list_transform(string_split(text, ' '),
                                     t -> CAST(ceil(len(t) / 4.0) AS INT)),
                      'sum')::INT AS n_subwords,
       len(text)::INT AS n_chars_actual
FROM documents
"""


def quality_scores(documents: DataFrame, stopwords=EN_MARKERS) -> DataFrame:
    """Length/stopword/mean-word-length features + a composite score.

    All ratios are emitted as integer-scaled fixed-point values (×10⁴)
    computed with integer division — floating-point rounding is
    engine-dependent at decimal ties (Spark rounds the shortest decimal
    representation, DuckDB the binary value), so exact cross-engine parity
    requires integer arithmetic end-to-end."""
    toks = F.split(F.col("text"), " ")
    stoplist = ",".join(repr(s) for s in stopwords)
    hits = (
        f"CAST(size(filter(split(text, ' '), t -> t IN ({stoplist}))) AS BIGINT)"
    )
    n = "greatest(size(split(text, ' ')), 1)"
    stop_ratio_e4 = F.expr(f"{hits} * 10000 DIV {n}")
    mean_len_e2 = F.expr(f"CAST(length(text) AS BIGINT) * 100 DIV {n}")
    part1 = F.expr(
        "least(CAST(size(split(text, ' ')) AS BIGINT) * 10000 DIV 64, 10000) DIV 2"
    )
    part2 = F.expr(f"least({hits} * 50000 DIV {n}, 10000) DIV 2")
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        stop_ratio_e4.alias("stop_ratio_e4"),
        mean_len_e2.alias("mean_len_e2"),
        (part1 + part2).alias("quality_e4"),
    )


def quality_oracle_sql(stopwords=EN_MARKERS) -> str:
    stoplist = ", ".join(f"'{s}'" for s in stopwords)
    return f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
), f AS (
  SELECT doc_id, text, toks,
         len(list_filter(toks, tok -> tok IN ({stoplist})))::BIGINT AS stop_hits,
         greatest(len(toks), 1)::BIGINT AS n
  FROM t
)
SELECT doc_id,
       len(toks)::INT AS n_tokens,
       (stop_hits * 10000) // n AS stop_ratio_e4,
       (len(text)::BIGINT * 100) // n AS mean_len_e2,
       (least(len(toks)::BIGINT * 10000 // 64, 10000) // 2
        + least(stop_hits * 50000 // n, 10000) // 2) AS quality_e4
FROM f
"""


def langid(documents: DataFrame, markers=EN_MARKERS) -> DataFrame:
    """Stopword-ratio language heuristic: 'en' iff ≥ 5% of tokens are English
    function words. The 5% threshold compares as exact integers
    (hits*20 >= n) so both engines decide identically. (A real model is out
    of scope by design — the pipeline shape is what scales.)"""
    stoplist = ",".join(repr(s) for s in markers)
    hits = f"CAST(size(filter(split(text, ' '), t -> t IN ({stoplist}))) AS BIGINT)"
    n = "greatest(size(split(text, ' ')), 1)"
    return documents.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        F.expr(f"{hits} * 10000 DIV {n}").alias("en_ratio_e4"),
        F.expr(
            f"CASE WHEN {hits} * 20 >= {n} THEN 'en' ELSE 'other' END"
        ).alias("lang_pred"),
    )


def langid_oracle_sql(markers=EN_MARKERS) -> str:
    stoplist = ", ".join(f"'{s}'" for s in markers)
    return f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), r AS (
  SELECT doc_id, lang,
         len(list_filter(toks, tok -> tok IN ({stoplist})))::BIGINT AS hits,
         greatest(len(toks), 1)::BIGINT AS n
  FROM t
)
SELECT doc_id, lang AS lang_true,
       hits * 10000 // n AS en_ratio_e4,
       CASE WHEN hits * 20 >= n THEN 'en' ELSE 'other' END AS lang_pred
FROM r
"""


def fingerprints(documents: DataFrame) -> DataFrame:
    """Order-sensitive 60-bit document fingerprint:
    bit_xor over tokens of md5_60bit(token ':' position).

    Pure Catalyst — posexplode + md5 + conv + bit_xor stay in whole-stage
    codegen with map-side partial aggregation, so the shuffle carries one
    (doc_id, 8-byte hash) row per doc per partition, not the tokens. The
    tokenization (single-space split, 0-based positions) mirrors
    FINGERPRINT_ORACLE_SQL exactly."""
    toks = documents.select(
        "doc_id",
        F.posexplode(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias(
            "pos", "tok"
        ),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("tok"), F.lit(":"), F.col("pos").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        toks.select("doc_id", h.alias("h"))
        .groupBy("doc_id")
        .agg(F.bit_xor("h").alias("fingerprint"))
    )


FINGERPRINT_ORACLE_SQL = """
WITH toks AS (
  SELECT doc_id, t.tok, t.i - 1 AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) d,
       LATERAL (SELECT unnest(ts) AS tok, generate_subscripts(ts, 1) AS i) t
)
SELECT doc_id,
       bit_xor(('0x' || substring(md5(tok || ':' || pos), 1, 15))::UBIGINT)::BIGINT AS fingerprint
FROM toks GROUP BY doc_id
"""
