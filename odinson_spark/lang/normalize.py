"""Unicode normalization — MUST be identical on the index side (tokenizer)
and the query side (compiler), or exact-term matching silently breaks.

Parity target: the reference applies ``normalizeUnicode`` (NFKC) to every
indexed/queried term and ``normalizeUnicodeAggressively`` (NFKC + casefold +
diacritic stripping) to the synthetic default ``norm`` field
(/root/reference/core/src/main/scala/ai/lum/odinson/lucene/index/OdinsonIndexWriter.scala:174-182,
compiler/QueryCompiler.scala:414-421).
"""

from __future__ import annotations

import unicodedata

WHITESPACE_PLACEHOLDER = "�"  # reference replaces whitespace-only tokens


def normalize_unicode(s: str) -> str:
    """NFKC normalization (reference: ai.lum.common normalizeUnicode)."""
    if s.isascii():
        return s  # NFKC is the identity on ASCII
    return unicodedata.normalize("NFKC", s)


# ASCII transliteration for symbols/ligatures NFKC doesn't decompose —
# parity with the reference's aggressive normalization equivalence classes
# (foundations/TestUnicodeNormalization.scala: ½≡1/2, Œtker™≡OEtker(TM),
# “quotes”≡"quotes", •≡-). Applied before NFKC (™ would otherwise become
# "tm", losing the parens) and again after (NFKC(½) emits U+2044 ⁄).
_TRANSLIT = str.maketrans(
    {
        "“": '"', "”": '"', "„": '"', "‟": '"',
        "‘": "'", "’": "'", "‚": "'", "‛": "'",
        "–": "-", "—": "-", "‒": "-", "―": "-",
        "‐": "-", "‑": "-", "•": "-",
        "™": "(tm)", "℠": "(sm)", "©": "(c)", "®": "(r)",
        "œ": "oe", "Œ": "OE", "æ": "ae", "Æ": "AE",
        "ø": "o", "Ø": "O", "đ": "d", "Đ": "D",
        "ð": "d", "Ð": "D", "þ": "th", "Þ": "TH",
        "ł": "l", "Ł": "L",
        "⁄": "/",
    }
)


def normalize_unicode_aggressively(s: str) -> str:
    """NFKC + casefold + diacritics stripped + ASCII transliteration."""
    if s.isascii():
        # exact fast path: every step below is the identity on ASCII except
        # casefold, and ASCII casefold == lower (the _TRANSLIT keys, NFKC/
        # NFKD decompositions, and combining marks are all non-ASCII)
        return s.lower()
    s = s.translate(_TRANSLIT)
    s = unicodedata.normalize("NFKC", s).casefold()
    s = s.translate(_TRANSLIT)
    s = unicodedata.normalize("NFKD", s)
    s = "".join(c for c in s if not unicodedata.combining(c))
    return unicodedata.normalize("NFKC", s)


# --- Catalyst-side folding ---------------------------------------------------
# Metadata predicates must stay JVM-side (so Catalyst pushes them into the
# scan), which rules out a Python UDF. We approximate
# normalize_unicode_aggressively as lower + replace-chain + translate, with
# the tables DERIVED from the Python function itself over the Latin-1
# Supplement / Latin Extended-A/B range — the two sides cannot drift for any
# character in that range. Outside it (CJK fullwidth forms, ligature NFKC
# cases) the column side falls back to plain lower(); the reference corpus
# for metadata values is Latin-script names/venues, so this covers parity
# where it matters (reference: metadata/Ast.scala:22-25 normalizes both
# index and query sides aggressively).

_FOLD_RANGE = range(0x80, 0x250)


def _fold_tables():
    translate_src, translate_dst, multi = [], [], []
    seen = set()
    for cp in _FOLD_RANGE:
        ch = chr(cp).lower()
        # some lowercases are multi-char ('İ'.lower() == 'i̇'); translate()
        # is strictly 1:1, so skip those — plain lower() already handled them
        if len(ch) != 1 or ch in seen:
            continue
        seen.add(ch)
        folded = normalize_unicode_aggressively(ch)
        if folded == ch:
            continue
        if len(folded) == 1:
            translate_src.append(ch)
            translate_dst.append(folded)
        elif 1 < len(folded) <= 3 and folded.isascii():
            multi.append((ch, folded))
    return "".join(translate_src), "".join(translate_dst), tuple(multi)


_TRANSLATE_SRC, _TRANSLATE_DST, _MULTI_FOLDS = _fold_tables()


def fold_string_column(col):
    """Column-side equivalent of :func:`normalize_unicode_aggressively` for
    Latin-script text, as pure Catalyst expressions (lower + replace chain +
    translate). Use on BOTH sides of metadata string comparisons."""
    from pyspark.sql import functions as F

    c = F.lower(col)
    for src, dst in _MULTI_FOLDS:  # multi-char expansions: ß→ss, æ→ae, …
        c = F.replace(c, F.lit(src), F.lit(dst))
    return F.translate(c, _TRANSLATE_SRC, _TRANSLATE_DST)


def sanitize_token(tok: str) -> str:
    """Whitespace-only tokens are replaced with a placeholder so positional
    alignment survives (reference OdinsonIndexWriter.scala:312-325)."""
    if tok and tok.strip() == "":
        return WHITESPACE_PLACEHOLDER
    return tok
