"""Interactive query surface: top-N results, searchAfter pagination,
totalHits.

Reference parity: ExtractorEngine.query with an early-terminating top-N
collector and a searchAfter cursor
(core/.../lucene/search/OdinsonCollector.scala:95-153,
extra/.../Shell.scala:240, reference.conf `computeTotalHits`). This is the
reference's primary UX — near-real-time paged queries over a prebuilt
index — re-expressed Spark-native over the sentence table:

* top-N = ORDER BY the deterministic result key + LIMIT n, which Catalyst
  plans as TakeOrderedAndProject (per-partition heap of size n, only n rows
  cross the network — the distributed analogue of the early-terminating
  collector);
* searchAfter = a lexicographic range predicate on the result key applied
  BEFORE the matcher stage's doc/sentence keys, so later pages skip earlier
  documents at the scan (predicate pushdown), not after matching them;
* totalHits = an optional count (the reference's `computeTotalHits` toggle —
  skipping it avoids running the matcher over the full corpus when only the
  first page is wanted... modulo Spark still scanning matched partitions;
  the prefilter bounds that).

The result key is (doc_id, sent_id, start, end) — unique per (rule, span)
stream and stable across pages.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lang.metadata import compile_metadata_query
from .lang.rules import Extractor, RuleReader
from .pipeline.extract import apply_prefilter, extract_mentions_df


@dataclass(frozen=True)
class Cursor:
    """searchAfter position: the result key of the last delivered row."""

    doc_id: str
    sent_id: int
    start: int
    end: int


@dataclass
class SearchResults:
    rows: List  # pyspark Rows of the mentions schema
    next_cursor: Optional[Cursor]
    total_hits: Optional[int]


_KEY = ("doc_id", "sent_id", "start", "end")


def _after_predicate(c: Cursor):
    """Lexicographic (doc_id, sent_id, start, end) > cursor. The leading
    doc_id >= clause is a plain range predicate Catalyst can push into the
    sentence scan; the exact tuple comparison refines it after."""
    d, s, st, en = F.col("doc_id"), F.col("sent_id"), F.col("start"), F.col("end")
    strictly_after = (
        (d > c.doc_id)
        | ((d == c.doc_id) & (s > c.sent_id))
        | ((d == c.doc_id) & (s == c.sent_id) & (st > c.start))
        | ((d == c.doc_id) & (s == c.sent_id) & (st == c.start) & (en > c.end))
    )
    return strictly_after


def _sentence_cursor_prefilter(c: Cursor):
    """Sentence-level necessary condition for a mention to sort after the
    cursor — applied before the matcher so earlier pages' documents are
    never re-matched."""
    return (F.col("doc_id") > c.doc_id) | (
        (F.col("doc_id") == c.doc_id) & (F.col("sent_id") >= c.sent_id)
    )


class SearchEngine:
    """Paged pattern search over a sentence table (the 'index')."""

    def __init__(
        self,
        sentences: DataFrame,
        meta_prefix: str = "",
        extra_token_fields: Sequence[str] = (),
    ):
        self.sentences = sentences
        # document_json sources expose metadata as meta_* columns; the
        # deterministic tokenizers keep plain names (e.g. `lang`)
        self.meta_prefix = meta_prefix
        # user-configured token layers (reference allTokenFields,
        # reference.conf:46-57): extend the parser's field vocabulary and
        # ship the extra columns to the matcher
        self.extra_token_fields = tuple(extra_token_fields)
        self._reader = RuleReader.with_extra_token_fields(self.extra_token_fields)

    def _prefilter_sentences(self, sents: DataFrame, extractors) -> DataFrame:
        """Hook: narrow the sentence set before the matcher stage. The scan
        path applies the boolean prefilter; index.IndexedSearchEngine
        overrides this to prune via posting-list candidates first."""
        return apply_prefilter(sents, extractors)

    def compile(self, pattern: str) -> Sequence[Extractor]:
        import yaml

        # build the rule as a dict and dump it — patterns containing
        # newlines/quotes can't break out of the YAML structure
        grammar = yaml.safe_dump(
            {"rules": [{"name": "q", "type": "basic", "pattern": pattern}]}
        )
        extractors, _ = self._reader.compile_rules(grammar)
        return extractors

    def mentions(
        self,
        pattern: str,
        metadata_filter: Optional[str] = None,
        after: Optional[Cursor] = None,
    ) -> DataFrame:
        """The full (unlimited) mention stream for a pattern, cursor-pruned."""
        extractors = self.compile(pattern)
        sents = self.sentences
        if metadata_filter:
            sents = sents.filter(
                compile_metadata_query(metadata_filter, self.meta_prefix)
            )
        if after is not None:
            sents = sents.filter(_sentence_cursor_prefilter(after))
        m = extract_mentions_df(
            self._prefilter_sentences(sents, extractors),
            extractors,
            extra_token_fields=self.extra_token_fields,
        )
        if after is not None:
            m = m.filter(_after_predicate(after))
        return m

    def search(
        self,
        pattern: str,
        n: int = 10,
        after: Optional[Cursor] = None,
        metadata_filter: Optional[str] = None,
        compute_total_hits: bool = False,
    ) -> SearchResults:
        m = self.mentions(pattern, metadata_filter, after)
        page = (
            m.orderBy(*[F.col(k).asc() for k in _KEY])
            .limit(n)
            .collect()
        )
        # NOTE: compute_total_hits runs the matcher twice (full count + the
        # top-N page) — mirrors the reference's computeTotalHits toggle
        # (ExtractorEngine.scala), off by default precisely because it
        # doubles the query cost
        total = m.count() if compute_total_hits else None
        nxt = None
        if n > 0 and len(page) == n:
            last = page[-1]
            nxt = Cursor(last.doc_id, last.sent_id, last.start, last.end)
        return SearchResults(rows=page, next_cursor=nxt, total_hits=total)
