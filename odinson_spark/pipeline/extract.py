"""Spark extraction stages.

Layout of the distributed job (idiomatic-Spark re-expression of the
reference's index+search lifecycle, ExtractorEngine.scala §3 of SURVEY.md):

1. ``tokenize_repos`` / ``tokenize_documents`` — ``mapInPandas`` annotation
   stage (repos(content) → sentence rows). Pure, deterministic, no shuffle.
2. ``apply_prefilter`` — a Catalyst-pushable necessary condition derived from
   the compiled rules (plans/prefilter.py). No shuffle; enables scan pruning.
3. ``extract_mentions_df`` — ``mapInPandas`` matcher stage. Rules are
   compiled on the driver and shipped once per executor via broadcast.
   No shuffle: each sentence row is self-contained (token layers + graph).
4. ``triples_from_mentions`` — pure DataFrame ops (filter/explode on the
   captures array); stays in whole-stage codegen.

Scale notes: stages 1–3 are embarrassingly parallel (the only wide ops in
the whole extraction path are the optional state-cascade joins and the final
write). Skew from giant files is handled upstream by salted repartitioning
(pipeline/skew.py).
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lang import ast
from ..lang.rules import Extractor
from ..match import program as prog
from ..match.context import SentenceBatch
from ..match.extractor import BatchExtractor
from ..plans.prefilter import pf_or, prefilter_of, to_spark_column
from ..schema import MENTIONS_SCHEMA, SENTENCES_SCHEMA, TRIPLES_SCHEMA
from ..tokenizer.code_tokenizer import annotate_code, annotate_text, content_sha

# ---------------------------------------------------------------------------
# stage 1: tokenize
# ---------------------------------------------------------------------------


def _sentences_rows(doc_id, sha, lang, sentences, extra_token_fields=()) -> Iterator[dict]:
    for s in sentences:
        edges = s.get("edges") or []
        labels = [lab for _, _, lab in edges]
        incoming = sorted({lab for _, _, lab in edges})
        extras = {name: s.get(name) for name in extra_token_fields}
        yield {
            **extras,
            "doc_id": doc_id,
            "sent_id": s["sent_id"],
            "content_sha": sha,
            "lang": lang,
            "num_tokens": len(s["raw"]),
            "raw": s["raw"],
            "word": s["word"],
            "norm": s["norm"],
            "norm_alt": s.get("norm_alt"),
            "lemma": s["lemma"],
            "tag": s["tag"],
            "chunk": s["chunk"],
            "entity": s["entity"],
            "deps_src": [e[0] for e in edges],
            "deps_dst": [e[1] for e in edges],
            "deps_label": labels,
            "deps_roots": s.get("roots") or [],
            "incoming_flat": incoming,
            "outgoing_flat": incoming,
        }


def _fan_out(df: DataFrame, force: Optional[bool] = None) -> DataFrame:
    """Small inputs often arrive as one parquet split; the Python annotate/
    match stages scale with partition count, so widen to the session's
    parallelism. On a real corpus (thousands of splits) this is a no-op.

    ``force``: explicit override — True always repartitions, False never
    (skips the partition-count probe entirely)."""
    if df.isStreaming:
        return df  # micro-batch sizing is the trigger's job
    if force is False:
        return df
    # one wave of core-count tasks measured fastest on local[*]; finer tasks
    # add per-task Arrow/scheduling overhead without helping balance here
    target = df.sparkSession.sparkContext.defaultParallelism
    if force is True:
        return df.repartition(target)
    try:
        # physical partition count straight off the query execution — avoids
        # building the Python RDD wrapper (and its deserializer) per call
        nparts = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        nparts = df.rdd.getNumPartitions()
    if nparts < target:
        return df.repartition(target)
    return df


_SENTENCE_COLS = [f.name for f in SENTENCES_SCHEMA.fields]


def _sentences_frame(annotated: Iterable[Tuple[str, str, Optional[str], list]]) -> pd.DataFrame:
    """(doc_id, sha, lang, sentences) stream → one Arrow-ready frame, built
    column-wise (dict-of-lists): no per-sentence dict, one DataFrame
    construction per batch — the batch_from_pandas treatment applied to the
    tokenize stage."""
    c_doc, c_sent, c_sha, c_lang, c_nt = [], [], [], [], []
    c_raw, c_word, c_norm, c_nalt, c_lem, c_tag, c_chk, c_ent = (
        [], [], [], [], [], [], [], [],
    )
    c_src, c_dst, c_lab, c_roots, c_inc, c_out = [], [], [], [], [], []
    for doc_id, sha, lang, sentences in annotated:
        for s in sentences:
            edges = s.get("edges") or []
            if isinstance(edges, tuple) and len(edges) == 3:
                # vectorized (src, dst, label) triple from the annotator
                src_l, dst_l, labels = (
                    edges[0].tolist(),
                    edges[1].tolist(),
                    edges[2].tolist(),
                )
            else:
                src_l = [e[0] for e in edges]
                dst_l = [e[1] for e in edges]
                labels = [lab for _, _, lab in edges]
            incoming = sorted(set(labels))
            c_doc.append(doc_id)
            c_sent.append(s["sent_id"])
            c_sha.append(sha)
            c_lang.append(lang)
            c_nt.append(len(s["raw"]))
            c_raw.append(s["raw"])
            c_word.append(s["word"])
            c_norm.append(s["norm"])
            c_nalt.append(s.get("norm_alt"))
            c_lem.append(s["lemma"])
            c_tag.append(s["tag"])
            c_chk.append(s["chunk"])
            c_ent.append(s["entity"])
            c_src.append(src_l)
            c_dst.append(dst_l)
            c_lab.append(labels)
            c_roots.append(s.get("roots") or [])
            c_inc.append(incoming)
            c_out.append(incoming)
    if not c_doc:
        # empty dict-of-lists would infer float64 columns Arrow can't cast
        return pd.DataFrame(columns=_SENTENCE_COLS)
    return pd.DataFrame(
        {
            "doc_id": c_doc,
            "sent_id": c_sent,
            "content_sha": c_sha,
            "lang": c_lang,
            "num_tokens": c_nt,
            "raw": c_raw,
            "word": c_word,
            "norm": c_norm,
            "norm_alt": c_nalt,
            "lemma": c_lem,
            "tag": c_tag,
            "chunk": c_chk,
            "entity": c_ent,
            "deps_src": c_src,
            "deps_dst": c_dst,
            "deps_label": c_lab,
            "deps_roots": c_roots,
            "incoming_flat": c_inc,
            "outgoing_flat": c_out,
        },
        columns=_SENTENCE_COLS,
    )


def tokenize_repos(repos: DataFrame, max_tokens: int = 100) -> DataFrame:
    """repos(repo, path, commit, lang, content) → sentence rows."""
    repos = _fan_out(repos)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _sentences_frame(
                (
                    f"{repo}/{path}@{commit}",
                    content_sha(content or ""),
                    lang,
                    annotate_code(content or "", max_tokens),
                )
                for repo, path, commit, lang, content in zip(
                    pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"], pdf["content"]
                )
            )

    return repos.mapInPandas(fn, SENTENCES_SCHEMA)


def tokenize_documents(documents: DataFrame, max_tokens: int = 100) -> DataFrame:
    """documents(doc_id, text, lang, …) → sentence rows (whitespace mode)."""
    documents = _fan_out(documents)
    has_lang = "lang" in documents.columns

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            langs = pdf["lang"] if has_lang else [None] * len(pdf)
            yield _sentences_frame(
                (
                    str(doc_id),
                    content_sha(text or ""),
                    lang,
                    annotate_text(text or "", max_tokens),
                )
                for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], langs)
            )

    return documents.mapInPandas(fn, SENTENCES_SCHEMA)


# ---------------------------------------------------------------------------
# stage 2: prefilter
# ---------------------------------------------------------------------------


def combined_prefilter(extractors: Sequence[Extractor]):
    """A sentence can match the grammar iff it can match *some* rule."""
    return pf_or([prefilter_of(e.program) for e in extractors])


def apply_prefilter(sentences: DataFrame, extractors: Sequence[Extractor]) -> DataFrame:
    pf = combined_prefilter(extractors)
    return sentences.filter(to_spark_column(pf, columns=sentences.columns))


# ---------------------------------------------------------------------------
# stage 3: match (mapInPandas)
# ---------------------------------------------------------------------------

_LAYER_NAMES = ("raw", "word", "norm", "norm_alt", "lemma", "tag", "chunk", "entity")


def _fields_used(programs) -> set:
    fields = set()

    def walk_mask(e):
        if isinstance(e, prog.LeafMask):
            fields.add(e.field)
        for attr in ("subs", "sub"):
            v = getattr(e, attr, None)
            if v is None:
                continue
            if isinstance(v, (list, tuple)):
                for x in v:
                    walk_mask(x)
            else:
                walk_mask(v)

    def walk_ft(ft):
        if isinstance(ft, prog.SingleStepFT):
            walk(ft.surface)
        elif isinstance(ft, prog.ConcatFT):
            for c in ft.clauses:
                walk_ft(c)
        elif isinstance(ft, prog.RepeatFT):
            walk_ft(ft.sub)

    def walk(p):
        if p is None:
            return
        if isinstance(p, prog.PToken):
            walk_mask(p.expr)
        elif isinstance(p, prog.PEvent):
            walk(p.trigger)
            for a in list(p.required) + list(p.optional):
                walk_ft(a.full_traversal)
        elif isinstance(p, prog.PGraphTraversal):
            walk(p.src)
            walk_ft(p.full_traversal)
        else:
            for attr in ("sub", "main", "filter"):
                v = getattr(p, attr, None)
                if isinstance(v, prog.Prog):
                    walk(v)
            for c in getattr(p, "clauses", ()) or ():
                walk(c)

    for p in programs:
        walk(p)
    return fields


def _uses_graph(programs) -> bool:
    def walk(p) -> bool:
        if isinstance(p, (prog.PGraphTraversal, prog.PEvent)):
            return True
        for attr in ("sub", "main", "filter"):
            v = getattr(p, attr, None)
            if isinstance(v, prog.Prog) and walk(v):
                return True
        for c in getattr(p, "clauses", ()) or ():
            if walk(c):
                return True
        return False

    return any(walk(p) for p in programs)


def batch_from_pandas(
    pdf: pd.DataFrame,
    need_graph: bool,
    need_inout: bool,
    extra_token_fields: Sequence[str] = (),
) -> Tuple[SentenceBatch, list, list]:
    """Arrow batch → SentenceBatch with no per-row Python conversion: token
    layers stay as the numpy object arrays Arrow produced, edges are passed
    as (src, dst, label) array triples that _build_graphs concatenates
    vectorized."""
    import numpy as np

    n = len(pdf)
    layers = {}
    for name in (*_LAYER_NAMES, *extra_token_fields):
        if name in pdf.columns and name not in layers:
            layers[name] = pdf[name].to_numpy()
    num_tokens = pdf["num_tokens"].to_numpy()
    edges = None
    # inout layers are derived from edges, so a bare [incoming=]/[outgoing=]
    # token constraint needs the edge columns even without any traversal
    if (need_graph or need_inout) and "deps_src" in pdf.columns:
        edges = []
        for src, dst, lab in zip(
            pdf["deps_src"].to_numpy(),
            pdf["deps_dst"].to_numpy(),
            pdf["deps_label"].to_numpy(),
        ):
            if src is None or len(src) == 0:
                edges.append(None)
            else:
                edges.append(
                    (
                        np.asarray(src, dtype=np.int32),
                        np.asarray(dst, dtype=np.int32),
                        np.asarray(lab, dtype=object),
                    )
                )
    if need_inout and edges is not None:
        inc_col, out_col = [], []
        for i in range(n):
            nt = int(num_tokens[i])
            inc = [[] for _ in range(nt)]
            out = [[] for _ in range(nt)]
            if edges[i] is not None:
                s_arr, d_arr, l_arr = edges[i]
                for s, d, lab in zip(s_arr.tolist(), d_arr.tolist(), l_arr.tolist()):
                    if 0 <= s < nt and 0 <= d < nt:
                        out[s].append(lab)
                        inc[d].append(lab)
            inc_col.append(inc)
            out_col.append(out)
        layers["incoming"] = inc_col
        layers["outgoing"] = out_col
    batch = SentenceBatch(layers=layers, num_tokens=num_tokens, edges=edges)
    return batch, list(pdf["doc_id"]), pdf["sent_id"].to_numpy().tolist()


_MENTION_COLS = [f.name for f in MENTIONS_SCHEMA.fields]


def _mention_frame(
    mentions, idx_by_key, raws, shas, EventMatch, cols=None
) -> pd.DataFrame:
    """Mentions → pandas frame, built column-wise (dict-of-lists): one
    DataFrame construction per batch instead of one dict per mention row.

    ``cols`` — optional subset of mention columns to build; the capture
    structs and span-text joins are skipped entirely when unrequested, and
    only the requested columns cross the Arrow boundary."""
    out_cols = _MENTION_COLS if cols is None else [c for c in _MENTION_COLS if c in set(cols)]
    want = set(out_cols)
    need_caps = "captures" in want
    need_text = "text" in want
    c_doc, c_sent, c_sha, c_label, c_found, c_start, c_end, c_text = (
        [], [], [], [], [], [], [], [],
    )
    c_isev, c_tstart, c_tend, c_caps = [], [], [], []
    for m in mentions:
        i = idx_by_key[(m.doc_id, m.sent_id)]
        toks = raws[i]
        is_event = isinstance(m.match, EventMatch)
        if need_caps:
            c_caps.append(
                [
                    {
                        "name": c.name,
                        "label": c.label,
                        "start": c.match.start,
                        "end": c.match.end,
                        "text": " ".join(toks[c.match.start : c.match.end]),
                    }
                    for c in (
                        m.match.captures if is_event else m.match.named_captures()
                    )
                ]
            )
        c_doc.append(m.doc_id)
        c_sent.append(m.sent_id)
        c_sha.append(shas[i])
        c_label.append(m.label)
        c_found.append(m.found_by)
        c_start.append(m.start)
        c_end.append(m.end)
        if need_text:
            c_text.append(" ".join(toks[m.start : m.end]))
        c_isev.append(is_event)
        c_tstart.append(m.match.trigger.start if is_event else None)
        c_tend.append(m.match.trigger.end if is_event else None)
    if not c_doc:
        # empty dict-of-lists would infer float64 columns, which Arrow can't
        # cast to list<struct>; the empty-constructor keeps object dtype
        return pd.DataFrame(columns=out_cols)
    data = {
        "doc_id": c_doc,
        "sent_id": c_sent,
        "content_sha": c_sha,
        "label": c_label,
        "found_by": c_found,
        "start": c_start,
        "end": c_end,
        "text": c_text,
        "is_event": c_isev,
        "trigger_start": c_tstart,
        "trigger_end": c_tend,
        "captures": c_caps,
    }
    return pd.DataFrame({k: data[k] for k in out_cols}, columns=out_cols)


def required_columns(
    extractors: Sequence[Extractor], extra_token_fields: Sequence[str] = ()
) -> List[str]:
    programs = [e.program for e in extractors]
    fields = _fields_used(programs) & (set(_LAYER_NAMES) | set(extra_token_fields))
    cols = ["doc_id", "sent_id", "content_sha", "num_tokens", "raw"]
    cols += sorted(fields - {"raw"})
    if "norm" not in cols:
        cols.append("norm")
    # the default field is a synonym union: norm (from word) + norm_alt
    # (from raw, only where it differs)
    if "norm" in cols and "norm_alt" not in cols:
        cols.append("norm_alt")
    if _uses_graph(programs) or _fields_used(programs) & {"incoming", "outgoing"}:
        cols += ["deps_src", "deps_dst", "deps_label", "deps_roots"]
    return cols


def extract_mentions_df(
    sentences: DataFrame,
    extractors: Sequence[Extractor],
    use_state: bool = False,
    allow_trigger_overlaps: bool = False,
    disable_match_selector: bool = False,
    prune_columns: bool = True,
    extra_token_fields: Sequence[str] = (),
) -> DataFrame:
    """Run the grammar; one matcher pass per Arrow batch, no shuffle.

    ``use_state=False`` runs the single-pass no-state path; ``use_state=True``
    runs the full priority cascade *within each batch* (sentence-local state
    is exact because reference state lookups are keyed by (doc, sentence) —
    StateQuery.scala:14-142 reads mentions of the same sentence only).

    ``extra_token_fields``: user-configured token layers beyond the built-in
    set (reference ``allTokenFields``, reference.conf:46-57) — each must be a
    position-aligned array<string> column on ``sentences``."""
    programs = [e.program for e in extractors]
    need_graph = _uses_graph(programs)
    need_inout = bool(_fields_used(programs) & {"incoming", "outgoing"})
    extra_token_fields = tuple(extra_token_fields)
    if prune_columns:
        cols = [
            c
            for c in required_columns(extractors, extra_token_fields)
            if c in sentences.columns
        ]
        sentences = sentences.select(*cols)
    spark = sentences.sparkSession
    bc = spark.sparkContext.broadcast(list(extractors))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extrs = bc.value
        runner = BatchExtractor(extrs)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            batch, doc_ids, sent_ids = batch_from_pandas(
                pdf, need_graph, need_inout, extra_token_fields
            )
            raws = batch.raw_layers.get("raw")
            if raws is None:
                raws = batch.raw_layers.get("word")
            if use_state:
                mentions = runner.extract_mentions(
                    batch, doc_ids, sent_ids, allow_trigger_overlaps, disable_match_selector
                )
            else:
                mentions = runner.extract_no_state(
                    batch, doc_ids, sent_ids, allow_trigger_overlaps, disable_match_selector
                )
            shas = list(pdf["content_sha"]) if "content_sha" in pdf.columns else [None] * len(pdf)
            idx_by_key = {(doc_ids[i], sent_ids[i]): i for i in range(len(doc_ids))}
            from ..match.matches import EventMatch

            yield _mention_frame(mentions, idx_by_key, raws, shas, EventMatch)

    return sentences.mapInPandas(fn, MENTIONS_SCHEMA)


# ---------------------------------------------------------------------------
# stage 4: triples (pure DataFrame ops — no Python)
# ---------------------------------------------------------------------------

DEFAULT_SUBJ_ROLES = ("subject", "subj", "agent", "cause", "hypernym", "src", "caller")
DEFAULT_OBJ_ROLES = ("object", "obj", "patient", "theme", "effect", "hyponym", "dst", "callee")


def triples_from_mentions(
    mentions: DataFrame,
    subj_roles: Sequence[str] = DEFAULT_SUBJ_ROLES,
    obj_roles: Sequence[str] = DEFAULT_OBJ_ROLES,
) -> DataFrame:
    """(subj, pred, obj) rows from mention captures, entirely in Catalyst.

    Role resolution: captures whose name is a known subject/object role pair
    up; otherwise the first two captures (pattern order) form the triple."""
    m = mentions.filter(F.size("captures") >= 2)
    subj_arr = F.filter("captures", lambda c: c["name"].isin(*subj_roles))
    obj_arr = F.filter("captures", lambda c: c["name"].isin(*obj_roles))
    has_roles = (F.size(subj_arr) > 0) & (F.size(obj_arr) > 0)
    subj_arr = F.when(has_roles, subj_arr).otherwise(F.slice("captures", 1, 1))
    obj_arr = F.when(has_roles, obj_arr).otherwise(F.slice("captures", 2, 1))
    # for events the mention span IS the trigger span (EventMatch start/end
    # delegate to the trigger), so `text` is the trigger text
    pred = F.coalesce(
        F.col("label"),
        F.when(F.col("is_event"), F.col("text")),
        F.col("found_by"),
    )
    exploded = (
        m.withColumn("_subj", F.explode(subj_arr))
        .withColumn("_obj", F.explode(obj_arr))
        .filter(F.col("_subj") != F.col("_obj"))
    )
    return exploded.select(
        "doc_id",
        "sent_id",
        "content_sha",
        F.col("found_by").alias("rule"),
        "label",
        F.col("_subj.name").alias("subj_role"),
        F.col("_subj.start").alias("subj_start"),
        F.col("_subj.end").alias("subj_end"),
        F.col("_subj.text").alias("subj_text"),
        pred.alias("pred"),
        F.col("_obj.name").alias("obj_role"),
        F.col("_obj.start").alias("obj_start"),
        F.col("_obj.end").alias("obj_end"),
        F.col("_obj.text").alias("obj_text"),
    )
