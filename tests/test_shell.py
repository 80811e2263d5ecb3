"""Scripted drive of the interactive shell (reference
extra/src/main/scala/ai/lum/odinson/extra/Shell.scala parity): ad-hoc
queries, paging via :more / :display, :corpus, :settings, rule-file
:load/:reload/:run, :mkdoc, error recovery."""

import io

import pytest

from odinson_spark.pipeline.extract import tokenize_documents
from odinson_spark.search import SearchEngine
from odinson_spark.shell import OdinsonShell


@pytest.fixture(scope="module")
def engine(spark):
    rows = [(i, f"alpha beta{' fast' * (i % 3)} gamma fast end", "en") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    return SearchEngine(tokenize_documents(docs))


def drive(engine, *lines, page_size=10):
    out = io.StringIO()
    OdinsonShell(engine, out=out, page_size=page_size).run(iter(lines))
    return out.getvalue()


def test_query_and_paging(engine):
    # 24 matches total (12 trailing 'fast' + 0+1+2 extras per i%3 cycle × 4)
    out = drive(engine, "fast", ":more", ":more", ":more", ":more", page_size=7)
    assert ">>> fast <<<" in out
    assert "[1]" in out and "[8]" in out  # second page continues numbering
    assert "[24]" in out and "[25]" not in out
    assert "(:more for the next 7)" in out
    assert "no more results" in out  # fifth :more exhausts


def test_display_resizes_page(engine):
    out = drive(engine, ":display 3", "fast", ":more")
    assert "will now display 3 results per page" in out
    assert "[6]" in out and "[7]" not in out


def test_corpus_settings_help_and_unknown(engine):
    out = drive(engine, ":corpus", ":settings", ":help", ":bogus")
    assert "sentences: 12" in out
    assert "display = 10" in out
    assert ":display N" in out
    assert "unknown command :bogus" in out


def test_bad_pattern_keeps_shell_alive(engine):
    out = drive(engine, "[unclosed", ":corpus")
    assert "error:" in out
    assert "sentences: 12" in out  # still running after the error


def test_load_run_reload_clear(engine, tmp_path):
    rules = tmp_path / "rules.yml"
    rules.write_text(
        "rules:\n"
        "  - name: fast-rule\n"
        "    type: basic\n"
        "    pattern: |\n"
        "      fast\n"
        "  - name: alpha-rule\n"
        "    type: basic\n"
        "    pattern: |\n"
        "      alpha\n"
    )
    out = drive(
        engine, f":load {rules}", ":run", ":reload", ":clear", ":run", ":reload"
    )
    assert "loaded 2 rule(s)" in out and "fast-rule, alpha-rule" in out
    assert "alpha-rule: 12 mention(s)" in out
    assert "fast-rule: 24 mention(s)" in out
    assert "rules cleared" in out
    assert "no rule file loaded" in out


def test_mkdoc_emits_document_json(engine):
    out = drive(engine, ":mkdoc hello fast world")
    assert '"$type"' in out and "TokensField" in out and '"hello"' in out


def test_more_without_query(engine):
    out = drive(engine, ":more")
    assert "no active query" in out


def test_index_command_switches_engine(spark, engine, tmp_path):
    from odinson_spark.index import TermIndex
    from odinson_spark.pipeline.extract import tokenize_documents as tok

    docs = spark.createDataFrame(
        [(100, "indexed zeppelin fast", "en")], "doc_id long, text string, lang string"
    )
    path = str(tmp_path / "shellidx")
    TermIndex.build(tok(docs), path, n_term_buckets=4, n_doc_buckets=2)
    out = drive(engine, ":index " + path, "zeppelin", ":settings")
    assert f"using index at {path}" in out
    assert ">>> zeppelin <<<" in out  # queries now hit the index corpus
    assert "display = 10" in out  # shell state survives the switch
    # bad path reports and keeps the shell alive
    out = drive(engine, ":index /nonexistent", ":corpus")
    assert "error:" in out and "sentences: 12" in out


def test_buildindex_command_materializes_and_switches(engine, tmp_path):
    path = str(tmp_path / "built_idx")
    out = drive(engine, ":buildindex " + path, "fast", ":explain fast")
    assert f"built index at {path}" in out
    assert ">>> fast <<<" in out  # queries run against the new index engine
    assert "route =" in out  # explain available → it IS an index engine
    import os

    assert os.path.exists(os.path.join(path, "odinson_index_meta.json"))
    out = drive(engine, ":buildindex")
    assert "usage: :buildindex PATH" in out
