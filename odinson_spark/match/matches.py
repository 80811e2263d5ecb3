"""Match derivation trees.

The engine keeps the full derivation of every candidate match (which OR
clause fired, how many repetitions, greedy vs lazy) because match selection
(:mod:`odinson_spark.match.selector`) disambiguates by walking two
derivations in lockstep. Node inventory parity:
/root/reference/core/src/main/scala/ai/lum/odinson/OdinsonMatch.scala.

``NamedCaptureView`` is the flattened (name, label, start, end) view used for
output rows; capture extraction mirrors the reference's ``namedCaptures``
ordering (a NamedMatch contributes its own capture before its children's).
"""

from __future__ import annotations

from typing import List, Optional, Tuple


class NamedCaptureView:
    __slots__ = ("name", "label", "match")

    def __init__(self, name: str, label: Optional[str], match: "BaseMatch"):
        self.name = name
        self.label = label
        self.match = match

    def __repr__(self):
        return f"Capture({self.name},{self.label},{self.match.start},{self.match.end})"


class BaseMatch:
    __slots__ = ()

    start: int
    end: int

    @property
    def length(self) -> int:
        return self.end - self.start

    def named_captures(self) -> List[NamedCaptureView]:
        out: List[NamedCaptureView] = []
        self._collect_captures(out)
        return out

    def _collect_captures(self, out: List[NamedCaptureView]) -> None:
        pass

    def intersects(self, other: "BaseMatch") -> bool:
        # open intervals: empty intervals intersect nothing
        if self.start >= self.end or other.start >= other.end:
            return False
        return self.start < other.end and other.start < self.end

    def __repr__(self):
        return f"{type(self).__name__}({self.start},{self.end})"


class NGramMatch(BaseMatch):
    __slots__ = ("start", "end")

    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class StateMatch(BaseMatch):
    """A mention replayed from the state (earlier cascade epoch)."""

    __slots__ = ("start", "end", "captures")

    def __init__(self, start: int, end: int, captures: Tuple = ()):
        self.start = start
        self.end = end
        self.captures = captures  # tuple of NamedCaptureView

    def _collect_captures(self, out):
        out.extend(self.captures)


class ConcatMatch(BaseMatch):
    __slots__ = ("start", "end", "subs")

    def __init__(self, subs: Tuple[BaseMatch, ...]):
        self.subs = subs
        self.start = subs[0].start
        self.end = subs[-1].end

    def _collect_captures(self, out):
        for s in self.subs:
            s._collect_captures(out)


class RepetitionMatch(BaseMatch):
    __slots__ = ("start", "end", "subs", "greedy")

    def __init__(self, subs: Tuple[BaseMatch, ...], greedy: bool):
        self.subs = subs
        self.greedy = greedy
        self.start = subs[0].start
        self.end = subs[-1].end

    def _collect_captures(self, out):
        for s in self.subs:
            s._collect_captures(out)


class OptionalMatch(BaseMatch):
    __slots__ = ("start", "end", "sub", "greedy")

    def __init__(self, sub: BaseMatch, greedy: bool):
        self.sub = sub
        self.greedy = greedy
        self.start = sub.start
        self.end = sub.end

    def _collect_captures(self, out):
        self.sub._collect_captures(out)


class OrMatch(BaseMatch):
    __slots__ = ("start", "end", "sub", "clause_id")

    def __init__(self, sub: BaseMatch, clause_id: int):
        self.sub = sub
        self.clause_id = clause_id
        self.start = sub.start
        self.end = sub.end

    def _collect_captures(self, out):
        self.sub._collect_captures(out)


class NamedMatch(BaseMatch):
    __slots__ = ("start", "end", "sub", "name", "label")

    def __init__(self, sub: BaseMatch, name: str, label: Optional[str]):
        self.sub = sub
        self.name = name
        self.label = label
        self.start = sub.start
        self.end = sub.end

    def _collect_captures(self, out):
        out.append(NamedCaptureView(self.name, self.label, self.sub))
        self.sub._collect_captures(out)


class GraphTraversalMatch(BaseMatch):
    """Span = destination span; provenance keeps the source for expansion."""

    __slots__ = ("start", "end", "src", "dst")

    def __init__(self, src: BaseMatch, dst: BaseMatch):
        self.src = src
        self.dst = dst
        self.start = dst.start
        self.end = dst.end

    def _collect_captures(self, out):
        self.src._collect_captures(out)
        self.dst._collect_captures(out)


class ArgumentMetadata:
    __slots__ = ("name", "min", "max", "promote")

    def __init__(self, name: str, min: int, max: Optional[int], promote: bool):
        self.name = name
        self.min = min
        self.max = max
        self.promote = promote

    def _key(self):
        return (self.name, self.min, self.max, self.promote)

    def __eq__(self, other):
        return isinstance(other, ArgumentMetadata) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())


class EventSketch(BaseMatch):
    """Partial event match: trigger + flat (arg_spec, match) pairs, packaged
    into EventMatch objects by the selector."""

    __slots__ = ("start", "end", "trigger", "arg_sketches")

    def __init__(self, trigger: BaseMatch, arg_sketches: Tuple):
        self.trigger = trigger
        self.arg_sketches = arg_sketches  # tuple of (CompiledArgument, BaseMatch)
        self.start = trigger.start
        self.end = trigger.end

    def argument_metadata(self) -> List[ArgumentMetadata]:
        seen = []
        for spec, _ in self.arg_sketches:
            md = ArgumentMetadata(spec.name, spec.min, spec.max, spec.promote)
            if md not in seen:
                seen.append(md)
        return seen


class EventMatch(BaseMatch):
    __slots__ = ("start", "end", "trigger", "captures", "arg_metadata")

    def __init__(self, trigger: BaseMatch, captures: Tuple[NamedCaptureView, ...], arg_metadata):
        self.trigger = trigger
        self.captures = captures
        self.arg_metadata = arg_metadata
        self.start = trigger.start
        self.end = trigger.end

    def _collect_captures(self, out):
        out.extend(self.captures)

    def remove_trigger_overlaps(self) -> Optional["EventMatch"]:
        """Drop args overlapping the trigger; the event survives only if all
        required arg counts still hold (reference OdinsonMatch.scala:72-83)."""
        trig = self.trigger
        keep = [c for c in self.captures if not c.match.intersects(trig)]
        if len(keep) == len(self.captures):
            # nothing overlapped: packaging already enforced the required
            # minimums, so this instance is unchanged — reuse it
            return self
        counts = {}
        for c in keep:
            counts[c.name] = counts.get(c.name, 0) + 1
        for meta in self.arg_metadata:
            if counts.get(meta.name, 0) < meta.min:
                return None
        return EventMatch(self.trigger, tuple(keep), self.arg_metadata)
