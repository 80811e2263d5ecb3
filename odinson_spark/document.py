"""Programmatic Document model (reference OdinsonDocument.scala:13-199).

The reference's corpus-construction API: typed fields
(``TokensField``/``GraphField``/``StringField``/``DateField``/
``NumberField``/``NestedField``), ``Sentence``, ``Document``, JSON in both
compact and pretty forms with ``$type`` discriminators. The JSON emitted
here round-trips semantically with the reference's uPickle output (same key
order, same ``$type`` strings, ``store`` omitted when false) but is not
guaranteed byte-identical: known divergences are ``"store": true`` (an
extension — the reference case classes have no ``store`` member), whole
doubles (uPickle renders ``5`` where ``json.dumps`` renders ``5.0``), and
``GraphField`` roots (the reference serializes a Set in iteration order;
this module sorts them for determinism).

Behavioral parity: foundations/TestOdinsonDocument.scala:11-196
(fromJson/toJson/toPrettyJson round-trips, DateField date handling,
addMetadata replace-vs-append semantics).
"""

from __future__ import annotations

import datetime as _dt
import json
from dataclasses import dataclass, field as dc_field
from typing import List, Sequence, Tuple, Union

_PKG = "ai.lum.odinson"


def _parse(source: Union[str, dict]) -> dict:
    return json.loads(source) if isinstance(source, str) else source


@dataclass(frozen=True)
class Field:
    name: str

    def to_json(self) -> str:
        return json.dumps(self._data(), separators=(",", ":"), ensure_ascii=False)

    def to_pretty_json(self) -> str:
        return json.dumps(self._data(), indent=4, ensure_ascii=False)


@dataclass(frozen=True)
class TokensField(Field):
    tokens: Tuple[str, ...] = ()
    store: bool = False

    def __init__(self, name: str, tokens: Sequence[str], store: bool = False):
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "tokens", tuple(tokens))
        object.__setattr__(self, "store", store)

    def _data(self) -> dict:
        d = {"$type": f"{_PKG}.TokensField", "name": self.name, "tokens": list(self.tokens)}
        if self.store:
            d["store"] = True
        return d

    @classmethod
    def from_json(cls, source: Union[str, dict]) -> "TokensField":
        d = _parse(source)
        return cls(d["name"], d.get("tokens") or [], bool(d.get("store", False)))


@dataclass(frozen=True)
class GraphField(Field):
    edges: Tuple[Tuple[int, int, str], ...] = ()
    roots: Tuple[int, ...] = ()

    def __init__(self, name: str, edges: Sequence, roots: Sequence[int]):
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "edges", tuple((int(a), int(b), str(l)) for a, b, l in edges))
        object.__setattr__(self, "roots", tuple(sorted({int(r) for r in roots})))

    def _data(self) -> dict:
        return {
            "$type": f"{_PKG}.GraphField",
            "name": self.name,
            "edges": [[a, b, l] for a, b, l in self.edges],
            "roots": list(self.roots),
        }

    @classmethod
    def from_json(cls, source: Union[str, dict]) -> "GraphField":
        d = _parse(source)
        return cls(d["name"], d.get("edges") or [], d.get("roots") or [])


@dataclass(frozen=True)
class StringField(Field):
    string: str = ""

    def _data(self) -> dict:
        return {"$type": f"{_PKG}.StringField", "name": self.name, "string": self.string}

    @classmethod
    def from_json(cls, source: Union[str, dict]) -> "StringField":
        d = _parse(source)
        return cls(d["name"], d.get("string", ""))


@dataclass(frozen=True)
class DateField(Field):
    date: str = ""
    store: bool = False

    def _data(self) -> dict:
        d = {"$type": f"{_PKG}.DateField", "name": self.name, "date": self.date}
        if self.store:
            d["store"] = True
        return d

    @property
    def local_date(self) -> _dt.date:
        return _dt.date.fromisoformat(self.date)

    @classmethod
    def from_json(cls, source: Union[str, dict]) -> "DateField":
        d = _parse(source)
        return cls(d["name"], str(d.get("date")), bool(d.get("store", False)))

    @classmethod
    def from_local_date(cls, name: str, date: _dt.date, store: bool = False) -> "DateField":
        return cls(name, date.isoformat(), store)

    # reference DateField.fromDate takes a java.util.Date; the Python
    # analogue accepts datetime/date
    @classmethod
    def from_date(cls, name: str, date: Union[_dt.date, _dt.datetime], store: bool = False) -> "DateField":
        if isinstance(date, _dt.datetime):
            date = date.date()
        return cls(name, date.isoformat(), store)


@dataclass(frozen=True)
class NumberField(Field):
    value: float = 0.0
    store: bool = False

    def _data(self) -> dict:
        d = {"$type": f"{_PKG}.NumberField", "name": self.name, "value": self.value}
        if self.store:
            d["store"] = True
        return d

    @classmethod
    def from_json(cls, source: Union[str, dict]) -> "NumberField":
        d = _parse(source)
        return cls(d["name"], float(d.get("value", 0.0)), bool(d.get("store", False)))


@dataclass(frozen=True)
class NestedField(Field):
    fields: Tuple[Field, ...] = ()

    def __init__(self, name: str, fields: Sequence[Field]):
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "fields", tuple(fields))

    def _data(self) -> dict:
        return {
            "$type": f"{_PKG}.NestedField",
            "name": self.name,
            "fields": [f._data() for f in self.fields],
        }

    @classmethod
    def from_json(cls, source: Union[str, dict]) -> "NestedField":
        d = _parse(source)
        return cls(d["name"], [field_from_json(f) for f in d.get("fields") or []])


_FIELD_TYPES = {
    "TokensField": TokensField,
    "GraphField": GraphField,
    "StringField": StringField,
    "DateField": DateField,
    "NumberField": NumberField,
    "NestedField": NestedField,
}


def field_from_json(source: Union[str, dict]) -> Field:
    d = _parse(source)
    tname = str(d.get("$type", "")).rsplit(".", 1)[-1]
    cls = _FIELD_TYPES.get(tname)
    if cls is None:
        raise ValueError(f"unknown field $type: {d.get('$type')!r}")
    return cls.from_json(d)


@dataclass(frozen=True)
class Sentence:
    num_tokens: int
    fields: Tuple[Field, ...]

    def __init__(self, num_tokens: int, fields: Sequence[Field]):
        object.__setattr__(self, "num_tokens", int(num_tokens))
        object.__setattr__(self, "fields", tuple(fields))

    def _data(self) -> dict:
        return {"numTokens": self.num_tokens, "fields": [f._data() for f in self.fields]}

    def to_json(self) -> str:
        return json.dumps(self._data(), separators=(",", ":"), ensure_ascii=False)

    def to_pretty_json(self) -> str:
        return json.dumps(self._data(), indent=4, ensure_ascii=False)

    @classmethod
    def from_json(cls, source: Union[str, dict]) -> "Sentence":
        d = _parse(source)
        return cls(d.get("numTokens", 0), [field_from_json(f) for f in d.get("fields") or []])


@dataclass(frozen=True)
class Document:
    id: str
    metadata: Tuple[Field, ...]
    sentences: Tuple[Sentence, ...]

    def __init__(self, id: str, metadata: Sequence[Field], sentences: Sequence[Sentence]):
        object.__setattr__(self, "id", str(id))
        object.__setattr__(self, "metadata", tuple(metadata))
        object.__setattr__(self, "sentences", tuple(sentences))

    def _data(self) -> dict:
        return {
            "id": self.id,
            "metadata": [f._data() for f in self.metadata],
            "sentences": [s._data() for s in self.sentences],
        }

    def to_json(self) -> str:
        return json.dumps(self._data(), separators=(",", ":"), ensure_ascii=False)

    def to_pretty_json(self) -> str:
        return json.dumps(self._data(), indent=4, ensure_ascii=False)

    to_dict = _data  # engine-side consumers (doc_to_sentences, fixtures)

    @classmethod
    def from_json(cls, source: Union[str, dict]) -> "Document":
        d = _parse(source)
        return cls(
            d.get("id", ""),
            [field_from_json(f) for f in d.get("metadata") or []],
            [Sentence.from_json(s) for s in d.get("sentences") or []],
        )

    def add_metadata(self, fields: Sequence[Field], append: bool = False) -> "Document":
        """Replace (``append=False``) or extend the metadata
        (OdinsonDocument.scala addMetadata; TestOdinsonDocument.scala:168-196:
        replace-then-append semantics)."""
        new_meta = (*self.metadata, *fields) if append else tuple(fields)
        return Document(self.id, new_meta, self.sentences)
