"""Interactive query shell over :class:`~odinson_spark.search.SearchEngine`.

Parity target: the reference's ad-hoc REPL
(extra/src/main/scala/ai/lum/odinson/extra/Shell.scala:29-36,100-120) —
ad-hoc pattern queries with paged results (:more), page-size control
(:display N), corpus stats (:corpus), settings dump (:settings) — plus rule
-file workflow (:load / :reload, the reference shell's companion apps'
job) and :mkdoc (text → Document JSON).

The loop is stream-driven (any iterable of lines in, any writer out), so a
scripted pytest drives it exactly like a human (tests/test_shell.py).
Run interactively:  python -m odinson_spark.shell <sentences.parquet>
"""

from __future__ import annotations

import sys
from typing import Iterable, Optional, TextIO

from .search import Cursor, SearchEngine

HELP = """commands:
  :help             show commands
  :exit             exit the shell
  :corpus           corpus statistics (sentence count)
  :settings         engine settings (page size, extra token fields)
  :display N        set the page size (current shown in :settings)
  :more             next page of the current query
  :index PATH       switch to a prebuilt TermIndex directory (postings-
                    pruned queries, the reference shell's native mode)
  :buildindex PATH  materialize the current corpus as a TermIndex at PATH
                    and switch to it (the reference's IndexDocuments app)
  :explain PATTERN  show the plan an index engine would pick for PATTERN
                    (route, estimated candidates, reason)
  :load PATH        compile a YAML rule file (:run executes it)
  :run              run the loaded rule file; print mentions per rule
  :reload           recompile the last loaded rule file
  :clear            drop the loaded rules
  :mkdoc TEXT       produce the Document JSON for TEXT
anything else is an ad-hoc pattern query (independent of loaded rules)"""


class OdinsonShell:
    def __init__(self, engine: SearchEngine, out: TextIO = None, page_size: int = 10):
        self.engine = engine
        self.out = out if out is not None else sys.stdout
        self.page_size = page_size
        self.query: Optional[str] = None
        self.after: Optional[Cursor] = None
        self.shown = 0
        self.rule_file: Optional[str] = None
        self.extractors = None

    # -- plumbing ---------------------------------------------------------

    def _p(self, *lines: str):
        for ln in lines:
            print(ln, file=self.out)

    def _show_page(self):
        res = self.engine.search(self.query, n=self.page_size, after=self.after)
        if not res.rows:
            self._p("no more results" if self.shown else "no results")
            return
        for r in res.rows:
            mark = f">>> {r.text} <<<" if r.text else ""
            self._p(
                f"[{self.shown + 1}] doc={r.doc_id} sent={r.sent_id} "
                f"span=[{r.start},{r.end}) {mark}"
            )
            self.shown += 1
        self.after = res.next_cursor
        if self.after is not None:
            self._p(f"(:more for the next {self.page_size})")

    # -- commands ---------------------------------------------------------

    def _cmd_load(self, path: str):
        from .lang.rules import RuleReader

        with open(path) as f:
            grammar = f.read()
        reader = RuleReader.with_extra_token_fields(self.engine.extra_token_fields)
        self.extractors, _ = reader.compile_rules(grammar)
        self.rule_file = path
        names = ", ".join(e.name for e in self.extractors)
        self._p(f"loaded {len(self.extractors)} rule(s) from {path}: {names}")

    def _cmd_extract_rules(self):
        """':run' runs the whole loaded grammar and prints per-rule mention
        counts (the IndexDocuments/run_pipeline batch shape, interactively).
        Rules with zero mentions are listed too — the most useful signal
        when debugging a grammar."""
        from .pipeline.extract import apply_prefilter, extract_mentions_df
        from pyspark.sql import functions as F

        m = extract_mentions_df(
            apply_prefilter(self.engine.sentences, self.extractors),
            self.extractors,
            extra_token_fields=self.engine.extra_token_fields,
        )
        counts = {
            row["found_by"]: row["n"]
            for row in m.groupBy("found_by").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        for name in sorted({e.name for e in self.extractors}):
            self._p(f"{name}: {counts.get(name, 0)} mention(s)")

    def _cmd_mkdoc(self, text: str):
        from .document import Document, Sentence, TokensField
        from .tokenizer.code_tokenizer import annotate_text

        sents = []
        for s in annotate_text(text):
            fields = [
                TokensField(name, list(s[name]))
                for name in ("raw", "word", "norm", "lemma", "tag", "chunk", "entity")
                if s.get(name) is not None
            ]
            sents.append(Sentence(len(s["raw"]), fields))
        self._p(Document("shell", (), sents).to_pretty_json())

    def handle(self, line: str) -> bool:
        """Process one input line; False means exit."""
        line = line.strip()
        if not line:
            return True
        if line == ":exit":
            return False
        # dispatch on the exact first token: prefix matching would treat
        # ":indexes foo" as ":index" with path "es foo" instead of
        # reporting an unknown command
        cmd = line.split(None, 1)[0] if line.strip() else line
        if line == ":help":
            self._p(HELP)
        elif line == ":corpus":
            self._p(f"sentences: {self.engine.sentences.count()}")
        elif line == ":settings":
            self._p(
                f"display = {self.page_size}",
                f"extraTokenFields = {list(self.engine.extra_token_fields)}",
                f"ruleFile = {self.rule_file}",
            )
        elif cmd == ":display":
            try:
                self.page_size = max(1, int(line.split(None, 1)[1]))
                self._p(f"will now display {self.page_size} results per page")
            except (IndexError, ValueError):
                self._p("usage: :display N")
        elif line == ":more":
            if self.query is None:
                self._p("no active query")
            elif self.after is None:
                self._p("no more results")
            else:
                self._show_page()
        elif cmd == ":buildindex":
            try:
                from .index import TermIndex

                path = line.split(None, 1)[1]
                idx = TermIndex.build(self.engine.sentences, path)
                self.engine = idx.engine(
                    extra_token_fields=self.engine.extra_token_fields
                )
                self.query, self.after, self.shown = None, None, 0
                self._p(f"built index at {path} ({idx.n_sentences} sentences)")
            except IndexError:
                self._p("usage: :buildindex PATH")
            except Exception as e:
                self._p(f"error: {e}")
        elif cmd == ":index":
            try:
                from .index import TermIndex

                path = line.split(None, 1)[1]
                spark = self.engine.sentences.sparkSession
                self.engine = TermIndex.read(spark, path).engine(
                    extra_token_fields=self.engine.extra_token_fields
                )
                self.query, self.after, self.shown = None, None, 0
                self._p(f"using index at {path}")
            except IndexError:
                self._p("usage: :index PATH")
            except Exception as e:
                self._p(f"error: {e}")
        elif cmd == ":explain":
            try:
                pat = line.split(None, 1)[1]
                if not hasattr(self.engine, "explain"):
                    self._p("explain needs an index engine (:index PATH first)")
                else:
                    info = self.engine.explain(pat)
                    for k in ("route", "reason", "estimated_candidates", "prefilter"):
                        self._p(f"{k} = {info[k]}")
            except IndexError:
                self._p("usage: :explain PATTERN")
            except Exception as e:
                self._p(f"error: {e}")
        elif cmd == ":load":
            try:
                self._cmd_load(line.split(None, 1)[1])
            except IndexError:
                self._p("usage: :load PATH")
            except Exception as e:  # compile/read error: report, keep running
                self._p(f"error: {e}")
        elif line == ":reload":
            if self.rule_file is None:
                self._p("no rule file loaded")
            else:
                try:
                    self._cmd_load(self.rule_file)
                except Exception as e:
                    self._p(f"error: {e}")
        elif line == ":clear":
            self.extractors, self.rule_file = None, None
            self._p("rules cleared")
        elif line == ":run":
            if self.extractors is None:
                self._p("no rule file loaded")
            else:
                try:
                    self._cmd_extract_rules()
                except Exception as e:  # runtime extraction error: stay alive
                    self._p(f"error: {e}")
        elif cmd == ":mkdoc":
            try:
                self._cmd_mkdoc(line.split(None, 1)[1])
            except IndexError:
                self._p("usage: :mkdoc TEXT")
            except Exception as e:
                self._p(f"error: {e}")
        elif line.startswith(":"):
            self._p(f"unknown command {line.split()[0]}", "type :help for commands")
        else:
            self.query, self.after, self.shown = line, None, 0
            try:
                self._show_page()
            except Exception as e:  # parse/compile error: report, keep running
                self._p(f"error: {e}")
        return True

    def run(self, lines: Iterable[str]):
        self._p("type :help for a list of commands")
        for line in lines:
            if not self.handle(line):
                break
        self._p(":exit")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m odinson_spark.shell <sentences.parquet>")
        return 2
    from .session import get_spark

    spark = get_spark(app_name="odinson-shell")
    import os

    if os.path.exists(os.path.join(argv[0], "odinson_index_meta.json")):
        from .index import TermIndex

        engine = TermIndex.read(spark, argv[0]).engine()
    else:
        engine = SearchEngine(spark.read.parquet(argv[0]))
    OdinsonShell(engine).run(iter(sys.stdin.readline, ""))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
