"""Metadata query language parity (reference metadata/QueryParser.scala,
TestMetadataFilter expectations adapted): comparison chains, boolean
algebra, contains, nested blocks, date functions."""

import datetime

import pytest

from odinson_spark.lang.metadata import compile_metadata_query


@pytest.fixture(scope="module")
def meta_df(spark):
    rows = [
        (1, "en", 7.0, datetime.date(2005, 3, 1), [("John", "Smith")], "Gonzalez"),
        (2, "de", 3.0, datetime.date(1999, 1, 1), [("Jane", "Doe")], "gonzalez"),
        (3, "en", 9.0, datetime.date(2015, 6, 5), [("John", "Doe")], "Müller"),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, lang string, stars double, pubdate date, "
        "authors array<struct<first:string,last:string>>, surname string",
    )


def ids(df, q):
    return sorted(r.doc_id for r in df.filter(compile_metadata_query(q)).collect())


def test_comparisons(meta_df):
    assert ids(meta_df, "stars > 5") == [1, 3]
    assert ids(meta_df, "stars >= 7") == [1, 3]
    assert ids(meta_df, "stars != 3") == [1, 3]
    assert ids(meta_df, "lang == 'en'") == [1, 3]


def test_chained_comparison(meta_df):
    assert ids(meta_df, "2000 <= pubdate.year <= 2010") == [1]


def test_boolean_algebra(meta_df):
    assert ids(meta_df, "lang == 'en' && stars > 8") == [3]
    assert ids(meta_df, "lang == 'de' || stars > 8") == [2, 3]
    assert ids(meta_df, "!(lang == 'en')") == [2]


def test_date_function(meta_df):
    assert ids(meta_df, "pubdate > date(2004)") == [1, 3]
    assert ids(meta_df, "pubdate < date(2005, 3, 2)") == [1, 2]


def test_contains_and_normalization(meta_df):
    # aggressive normalization: casefold + diacritics on both sides is the
    # reference behavior for metadata strings (metadata/Ast.scala:22-25).
    # contains is a token-boundary PHRASE match (the reference compiles it
    # to a Lucene phrase query) — partial tokens do not match.
    assert ids(meta_df, "surname contains 'gonzalez'") == [1, 2]
    assert ids(meta_df, "surname contains 'GONZÁLEZ'".replace("á", "a")) == [1, 2]
    assert ids(meta_df, "surname contains 'gonza'") == []
    assert ids(meta_df, "surname not contains 'gonza'") == [1, 2, 3]
    assert ids(meta_df, "surname contains 'müller'") == [3]
    assert ids(meta_df, "surname contains 'muller'") == [3]


def test_nested_block(meta_df):
    assert ids(meta_df, "authors{first == 'John' && last == 'Doe'}") == [3]
    assert ids(meta_df, "authors{first == 'john'}") == [1, 3]
    assert ids(meta_df, "authors{last == 'Doe'}") == [2, 3]
