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


def _meta_values(meta_list):
    """Reference metadata fields (OdinsonDocument.scala:137-199) → a
    canonical JSON-able dict + a field→kind map. TokensField values are
    joined with single spaces (the reference compares text metadata as
    token phrases; the joined form plus token-boundary matching reproduces
    that); NestedFields accumulate into a list of objects so repeated names
    (several authors) become one array column queried with exists()."""
    vals: Dict[str, object] = {}
    kinds: Dict[str, str] = {}
    for f in meta_list or []:
        t = f.get("$type", "")
        name = f.get("name")
        if not name:
            continue
        if t.endswith("TokensField"):
            vals[name] = " ".join(f.get("tokens") or [])
            kinds[name] = "tokens"
        elif t.endswith("StringField"):
            vals[name] = str(f.get("string", ""))
            kinds[name] = "string"
        elif t.endswith("NumberField"):
            vals[name] = float(f.get("value", 0.0))
            kinds[name] = "number"
        elif t.endswith("DateField"):
            vals[name] = str(f.get("date"))
            kinds[name] = "date"
        elif t.endswith("NestedField"):
            inner, _ = _meta_values(f.get("fields"))
            vals.setdefault(name, []).append(inner)
            kinds[name] = "nested"
    return vals, kinds


_SENTENCES_META_SCHEMA = None


def _sentences_meta_schema():
    global _SENTENCES_META_SCHEMA
    if _SENTENCES_META_SCHEMA is None:
        from pyspark.sql.types import StringType, StructField, StructType

        _SENTENCES_META_SCHEMA = StructType(
            list(SENTENCES_SCHEMA.fields)
            + [StructField("meta_json", StringType()), StructField("meta_kinds_json", StringType())]
        )
    return _SENTENCES_META_SCHEMA


def read_document_json(
    spark: SparkSession, path: str, max_tokens: int = 100, expand_metadata: bool = True
) -> DataFrame:
    """Path of JSON-lines files (one Document per line) → sentences DF.

    With ``expand_metadata`` (default), document metadata fields become typed
    ``meta_*`` columns (tokens → string, number → double, date → date,
    nested → array<struct>) replicated on every sentence row of the doc, so
    the metadata query language filters them scan-side."""
    lines = spark.read.text(path)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        schema = _sentences_meta_schema()
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                line = (line or "").strip()
                if not line:
                    continue
                doc = json.loads(line)
                sentences = _fill_layers(doc_to_sentences(doc, max_tokens))
                sha = hashlib.sha256(line.encode("utf-8")).hexdigest()
                vals, kinds = _meta_values(doc.get("metadata"))
                mj, mk = json.dumps(vals), json.dumps(kinds)
                for r in _sentences_rows(str(doc.get("id")), sha, None, sentences):
                    r["meta_json"] = mj
                    r["meta_kinds_json"] = mk
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    df = lines.mapInPandas(fn, _sentences_meta_schema())
    if not expand_metadata:
        return df.drop("meta_json", "meta_kinds_json")
    from pyspark.sql import functions as F

    # corpus metadata schemas vary per corpus: infer the union schema from
    # the canonical JSON (one extra scan over the small metadata strings)
    meta_schema = spark.read.json(
        df.select("meta_json").rdd.map(lambda r: r[0] or "{}")
    ).schema
    fields = [f.name for f in meta_schema.fields if not f.name.startswith("_corrupt")]
    if fields:
        kind_rows = (
            df.select(F.explode(F.from_json("meta_kinds_json", "map<string,string>")))
            .distinct()
            .collect()
        )
        kinds = {r[0]: r[1] for r in kind_rows}
        m = F.from_json("meta_json", meta_schema)
        for name in fields:
            col = m[name]
            if kinds.get(name) == "date":
                col = F.to_date(col)
            df = df.withColumn(f"meta_{name}", col)
    return df.drop("meta_json", "meta_kinds_json")


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
