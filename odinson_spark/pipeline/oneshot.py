"""Fused one-shot extraction: documents → mentions in a single narrow stage.

The staged path (tokenize → sentence table → match) is right when the
annotated corpus is materialized once and queried many times (the
index-then-search shape of the reference). For one-shot jobs it pays the
Arrow round-trip of fat sentence rows (all token layers) twice. This fused
stage annotates AND matches inside one ``mapInPandas`` pass, so only raw
text enters Python and only (small) mention rows leave.

The rule prefilter is applied at the *text* level before the UDF:
a required term over a text-derived layer implies a substring hit, which
Catalyst pushes into the parquet/Iceberg scan.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lang.rules import Extractor
from ..match.extractor import BatchExtractor
from ..plans import prefilter as pfmod
from ..schema import MENTIONS_SCHEMA
from ..testing import sentence_batch_from_docs
from ..tokenizer.code_tokenizer import annotate_code, annotate_text, content_sha
from .extract import _fan_out, _fields_used, _mention_frame

# layers derivable from the raw text by the deterministic annotators — a term
# constraint on these implies a substring occurrence in `text`
_TEXT_DERIVED_FIELDS = ("raw", "word", "norm", "lemma")


def _is_non_ascii_text() -> "F.Column":
    # a string is pure ASCII iff its UTF-8 byte length equals its char length
    # (every ASCII char is 1 byte; every non-ASCII char is >1). Cheap JVM-side
    # check, no regex scan.
    return F.octet_length(F.col("text")) != F.length(F.col("text"))


def text_prefilter_column(pf) -> "F.Column":
    """Render a rule prefilter as a predicate over the raw `text` column.

    Sound (never drops a matchable doc): term constraints on text-derived
    layers become case-insensitive substring tests, but ONLY for pure-ASCII
    documents — on ASCII input every derived layer (raw/word = NFKC,
    lemma = lower, norm = NFKC+casefold+strip-diacritics) degenerates to
    ``lower``, so ``[layer=term]`` implies ``lower(text) contains term``.
    A non-ASCII document can normalize INTO the term without containing it
    ("Café" → norm "cafe"), so non-ASCII docs bypass the prefilter and go
    straight to the matcher. Anything not provably necessary → TRUE."""
    if isinstance(pf, pfmod.PFTrue):
        return F.lit(True)
    if isinstance(pf, pfmod.PFFalse):
        return F.lit(False)
    if isinstance(pf, pfmod.PFTerm):
        if pf.field in _TEXT_DERIVED_FIELDS and pf.value.isascii() and pf.value.isalnum():
            return _is_non_ascii_text() | F.lower(F.col("text")).contains(
                pf.value.lower()
            )
        return F.lit(True)
    if isinstance(pf, pfmod.PFEdge):
        return F.lit(True)
    if isinstance(pf, pfmod.PFMultiTerm):
        # regex/fuzzy: no necessary substring exists in general
        return F.lit(True)
    if isinstance(pf, pfmod.PFPhrase):
        # adjacency over TOKENS has no necessary raw-text substring
        # (tokenization may insert/normalize); term containment is already
        # carried by the sibling PFTerm conjuncts
        return F.lit(True)
    if isinstance(pf, pfmod.PFAnd):
        col = text_prefilter_column(pf.subs[0])
        for s in pf.subs[1:]:
            col = col & text_prefilter_column(s)
        return col
    if isinstance(pf, pfmod.PFOr):
        col = text_prefilter_column(pf.subs[0])
        for s in pf.subs[1:]:
            col = col | text_prefilter_column(s)
        return col
    raise TypeError(f"unknown prefilter {pf!r}")


def extract_one_shot(
    documents: DataFrame,
    extractors: Sequence[Extractor],
    mode: str = "text",
    use_state: bool = False,
    max_tokens: int = 100,
    apply_text_prefilter: bool = True,
    project: Optional[Sequence[str]] = None,
) -> DataFrame:
    """documents(doc_id, text[, …]) or repos(repo, path, commit, lang,
    content) → mentions DataFrame, one fused Python stage.

    ``project`` — optional subset of mention columns to EMIT from the
    Python stage. Column pruning cannot see through mapInPandas, so a
    query that only reads (doc_id, start, end, text) otherwise pays Arrow
    serialization for every column of every mention — at 1.6M mentions the
    unread content_sha strings alone are ~100 MB of boundary traffic
    (optimization guide §4.1: pass only the columns the function needs, in
    both directions). None = the full MENTIONS_SCHEMA."""
    annotate = annotate_text if mode == "text" else annotate_code
    is_repos = mode == "code" and "content" in documents.columns

    if apply_text_prefilter and not is_repos:
        pf = pfmod.pf_or([pfmod.prefilter_of(e.program) for e in extractors])
        documents = documents.filter(text_prefilter_column(pf))

    documents = _fan_out(documents)
    spark = documents.sparkSession
    bc = spark.sparkContext.broadcast(list(extractors))
    need_inout = bool(
        _fields_used([e.program for e in extractors]) & {"incoming", "outgoing"}
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..match.matches import EventMatch

        runner = BatchExtractor(bc.value)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sents: List[dict] = []
            doc_ids: List[str] = []
            sent_ids: List[int] = []
            shas: List[str] = []
            if is_repos:
                it = (
                    (f"{r.repo}/{r.path}@{r.commit}", r.content or "")
                    for r in pdf.itertuples(index=False)
                )
            else:
                it = ((str(d), t or "") for d, t in zip(pdf["doc_id"], pdf["text"]))
            for doc_id, text in it:
                sha = content_sha(text)
                for s in annotate(text, max_tokens):
                    sents.append(s)
                    doc_ids.append(doc_id)
                    sent_ids.append(s["sent_id"])
                    shas.append(sha)
            if not sents:
                continue
            # annotators emit sanitized+NFKC tokens with a precomputed norm
            # layer; skip the redundant per-token re-normalization
            batch = sentence_batch_from_docs(
                sents, build_inout=need_inout, pre_normalized=True
            )
            if use_state:
                mentions = runner.extract_mentions(batch, doc_ids, sent_ids)
            else:
                mentions = runner.extract_no_state(batch, doc_ids, sent_ids)
            idx = {(doc_ids[i], sent_ids[i]): i for i in range(len(doc_ids))}
            yield _mention_frame(
                mentions, idx, batch.raw_layers["raw"], shas, EventMatch,
                cols=project,
            )

    out_schema = MENTIONS_SCHEMA
    if project is not None:
        keep = set(project)
        unknown = keep - {f.name for f in MENTIONS_SCHEMA.fields}
        if unknown:
            raise ValueError(f"unknown mention columns: {sorted(unknown)}")
        from pyspark.sql.types import StructType

        out_schema = StructType([f for f in MENTIONS_SCHEMA.fields if f.name in keep])

    cols = ["doc_id", "text"] if not is_repos else ["repo", "path", "commit", "content"]
    return documents.select(*[c for c in cols if c in documents.columns]).mapInPandas(
        fn, out_schema
    )
