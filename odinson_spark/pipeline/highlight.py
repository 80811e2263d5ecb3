"""Match highlighting: render each mention inside its full sentence with the
matched span wrapped in tags.

Reference parity: lucene/search/highlight/OdinsonHighlighter.scala:99 (the
display layer of the shell/REST API). Pure Catalyst — a (doc_id, sent_id)
equi-join against the sentence table plus array slice/concat expressions, so
it stays in whole-stage codegen; the mentions side is usually the small one
and AQE will broadcast it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def highlight_mentions(
    mentions: DataFrame,
    sentences: DataFrame,
    open_tag: str = "<mark>",
    close_tag: str = "</mark>",
) -> DataFrame:
    """mentions + a `highlighted` column: the sentence's raw tokens with
    tokens [start, end) wrapped in ``open_tag``/``close_tag``."""
    s = sentences.select("doc_id", "sent_id", F.col("raw").alias("_raw"))
    m = mentions.join(s, ["doc_id", "sent_id"])
    raw, st, en = F.col("_raw"), F.col("start"), F.col("end")
    before = F.slice(raw, 1, st)
    mid = F.concat_ws(" ", F.slice(raw, st + 1, en - st))
    after_len = F.size(raw) - en
    after = F.when(after_len > 0, F.slice(raw, en + 1, after_len)).otherwise(
        F.array().cast("array<string>")
    )
    parts = F.concat(
        before,
        F.array(F.concat(F.lit(open_tag), mid, F.lit(close_tag))),
        after,
    )
    return m.withColumn("highlighted", F.concat_ws(" ", parts)).drop("_raw")
