"""Interactive top-N + searchAfter surface (reference: ExtractorEngine.query
+ OdinsonCollector top-N/early-termination + searchAfter cursor)."""

import pytest
from pyspark.sql import functions as F

from odinson_spark.pipeline.extract import tokenize_documents
from odinson_spark.search import Cursor, SearchEngine


@pytest.fixture(scope="module")
def engine(spark):
    rows = []
    for i in range(30):
        rows.append((i, f"alpha beta{' fast' * (i % 3)} gamma fast end", "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    return SearchEngine(tokenize_documents(docs))


def _key(r):
    return (r.doc_id, r.sent_id, r.start, r.end)


def test_pagination_covers_stream_without_overlap(engine):
    full = sorted(map(_key, engine.mentions("fast").collect()))
    assert len(full) > 20
    seen = []
    cursor = None
    while True:
        page = engine.search("fast", n=7, after=cursor)
        seen.extend(map(_key, page.rows))
        if page.next_cursor is None:
            break
        cursor = page.next_cursor
    assert seen == full  # ordered, complete, no duplicates


def test_total_hits_toggle(engine):
    page = engine.search("fast", n=5, compute_total_hits=True)
    assert page.total_hits == engine.mentions("fast").count()
    page = engine.search("fast", n=5)
    assert page.total_hits is None


def test_short_final_page_has_no_cursor(engine):
    total = engine.mentions("fast").count()
    page = engine.search("fast", n=total + 50)
    assert len(page.rows) == total and page.next_cursor is None


def test_cursor_prunes_before_matcher(engine):
    # the sentence-level cursor prefilter must drop earlier docs from the
    # matcher input entirely (doc_id is a string key: "12" sorts after "1")
    cursor = Cursor(doc_id="12", sent_id=0, start=3, end=4)
    m = engine.mentions("fast", after=cursor)
    assert all(r.doc_id > "12" or (r.doc_id == "12") for r in m.collect())
    page = engine.search("fast", n=1000, after=cursor)
    keys = list(map(_key, page.rows))
    assert keys == sorted(keys)
    assert all(k > ("12", 0, 3, 4) for k in keys)


def test_n_zero_is_empty_without_cursor(engine):
    page = engine.search("fast", n=0)
    assert page.rows == [] and page.next_cursor is None


def test_metadata_filter_param(spark):
    docs = spark.createDataFrame(
        [(1, "fast one", "en"), (2, "fast two", "fr")],
        "doc_id long, text string, lang string",
    )
    sents = tokenize_documents(docs)
    eng = SearchEngine(sents)
    page = eng.search("fast", n=10, metadata_filter="lang == 'en'")
    assert {r.doc_id for r in page.rows} == {"1"}
