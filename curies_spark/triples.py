"""Driver-scale triple operations — the ``curies.triples`` module
surface (reference src/curies/triples/: model.py, filters.py, ops.py,
io.py, hash_utils.py) over in-memory iterables of :class:`Triple`
objects, so reference code importing ``from curies.triples import …``
ports verbatim.

These are the RECORD-scale twins: every operation here also exists as
a distributed DataFrame operator in
:mod:`curies_spark.operators.triples` (same names, Spark semantics) —
use those for corpus-scale tables; use these for driver-side triple
lists, tests, and small curation scripts. Filters are lazy generators
over the input iterable (one pass, constant memory), matching the
reference's ``filter()``-based forms; the ``progress`` flag is
accepted for signature parity and uses :mod:`tqdm` when installed.
"""

from __future__ import annotations

import csv
import gzip
import hashlib
from collections import defaultdict
from pathlib import Path
from typing import Callable, Collection, Iterable, NamedTuple, TypeVar

from .core.record import Reference, Triple

__all__ = [
    "StrTriple",
    "Triple",
    "TriplePredicate",
    "TripleType",
    "encode_curie_triple",
    "encode_uri_triple",
    "exclude_object_prefixes",
    "exclude_prefix_stratified_many_to_many",
    "exclude_prefixes_both",
    "exclude_references_both",
    "exclude_same_prefixes",
    "exclude_subject_prefixes",
    "exclude_triples",
    "hash_triple",
    "keep_object_prefixes",
    "keep_predicates",
    "keep_prefixes_both",
    "keep_prefixes_either",
    "keep_references_both",
    "keep_references_either",
    "keep_subject_prefixes",
    "keep_triples_by_hash",
    "read_triples",
    "write_triples",
]


class StrTriple(NamedTuple):
    """A (subject, predicate, object) triple of CURIE strings
    (reference triples/model.py:21-27)."""

    subject: str
    predicate: str
    object: str


#: any Triple subclass (reference triples/model.py:114)
TripleType = TypeVar("TripleType", bound=Triple)
#: a boolean test over one triple (reference triples/model.py:117)
TriplePredicate = Callable[[Triple], bool]

#: the default header of a three-column triples TSV
HEADER = ["subject", "predicate", "object"]


def _maybe_progress(triples: Iterable[Triple], progress: bool) -> Iterable[Triple]:
    if progress:  # pragma: no cover - cosmetic
        try:
            from tqdm import tqdm
        except ImportError:
            return triples
        return tqdm(triples, unit="triples", unit_scale=True)
    return triples


def _prefix_test(prefixes: "str | Iterable[str]") -> Callable[[str], bool]:
    """Membership test accepting a single prefix or an iterable of them
    (the reference's str/iterable polymorphism, filters.py passim)."""
    if isinstance(prefixes, str):
        return prefixes.__eq__
    return set(prefixes).__contains__


def _ref_test(references: "Reference | Collection[Reference]") -> Callable[[Reference], bool]:
    if isinstance(references, Reference):
        return references.__eq__
    return set(references).__contains__


# -- prefix filters (reference triples/filters.py:44-335) -------------------


def keep_prefixes_both(
    triples: Iterable[Triple], prefixes: Iterable[str], *, progress: bool = False
) -> Iterable[Triple]:
    """Keep triples whose subject AND object prefixes are both in the
    given set (reference filters.py:44-76; fewer than two prefixes is
    an error there, mirrored here)."""
    wanted = set(prefixes)
    if len(wanted) < 2:
        raise ValueError("keep_prefixes_both requires at least two prefixes")
    return (
        t
        for t in _maybe_progress(triples, progress)
        if t.subject.prefix in wanted and t.object.prefix in wanted
    )


def keep_prefixes_either(
    triples: Iterable[Triple], prefixes: "str | Iterable[str]", *, progress: bool = False
) -> Iterable[Triple]:
    """Keep triples with the subject OR object prefix in the given set
    (reference filters.py:78-113)."""
    ok = _prefix_test(prefixes)
    return (
        t
        for t in _maybe_progress(triples, progress)
        if ok(t.subject.prefix) or ok(t.object.prefix)
    )


def keep_subject_prefixes(
    triples: Iterable[Triple], prefixes: "str | Iterable[str]", *, progress: bool = False
) -> Iterable[Triple]:
    """Reference filters.py:116-151."""
    ok = _prefix_test(prefixes)
    return (t for t in _maybe_progress(triples, progress) if ok(t.subject.prefix))


def keep_object_prefixes(
    triples: Iterable[Triple], prefixes: "str | Iterable[str]", *, progress: bool = False
) -> Iterable[Triple]:
    """Reference filters.py:154-188."""
    ok = _prefix_test(prefixes)
    return (t for t in _maybe_progress(triples, progress) if ok(t.object.prefix))


def exclude_prefixes_both(
    triples: Iterable[Triple], prefixes: "str | Iterable[str]", *, progress: bool = False
) -> Iterable[Triple]:
    """Keep triples with NEITHER side's prefix in the given set
    (reference filters.py:191-229)."""
    bad = _prefix_test(prefixes)
    return (
        t
        for t in _maybe_progress(triples, progress)
        if not bad(t.subject.prefix) and not bad(t.object.prefix)
    )


def exclude_subject_prefixes(
    triples: Iterable[Triple], prefixes: "str | Iterable[str]", *, progress: bool = False
) -> Iterable[Triple]:
    """Reference filters.py:231-268."""
    bad = _prefix_test(prefixes)
    return (t for t in _maybe_progress(triples, progress) if not bad(t.subject.prefix))


def exclude_object_prefixes(
    triples: Iterable[Triple], prefixes: "str | Iterable[str]", *, progress: bool = False
) -> Iterable[Triple]:
    """Reference filters.py:271-308."""
    bad = _prefix_test(prefixes)
    return (t for t in _maybe_progress(triples, progress) if not bad(t.object.prefix))


def exclude_same_prefixes(
    triples: Iterable[Triple], *, progress: bool = False
) -> Iterable[Triple]:
    """Keep only cross-prefix triples (reference filters.py:311-334)."""
    return (
        t
        for t in _maybe_progress(triples, progress)
        if t.subject.prefix != t.object.prefix
    )


# -- reference / predicate / hash / set filters -----------------------------


def keep_references_either(
    triples: Iterable[Triple],
    references: "Reference | Collection[Reference]",
    *,
    progress: bool = False,
) -> Iterable[Triple]:
    """Reference filters.py:430-471."""
    ok = _ref_test(references)
    return (
        t for t in _maybe_progress(triples, progress) if ok(t.subject) or ok(t.object)
    )


def keep_references_both(
    triples: Iterable[Triple],
    references: Collection[Reference],
    *,
    progress: bool = False,
) -> Iterable[Triple]:
    """Reference filters.py:474-506 (two or more references required)."""
    wanted = set(references)
    if len(wanted) < 2:
        raise ValueError("two or more references are required")
    return (
        t
        for t in _maybe_progress(triples, progress)
        if t.subject in wanted and t.object in wanted
    )


def exclude_references_both(
    triples: Iterable[Triple],
    references: "Reference | Collection[Reference]",
    *,
    progress: bool = False,
) -> Iterable[Triple]:
    """Keep triples with NEITHER side in the given references
    (reference filters.py:509-549)."""
    bad = _ref_test(references)
    return (
        t
        for t in _maybe_progress(triples, progress)
        if not bad(t.subject) and not bad(t.object)
    )


def keep_predicates(
    triples: Iterable[Triple],
    predicates: "Reference | Collection[Reference]",
    *,
    progress: bool = False,
) -> Iterable[Triple]:
    """Reference filters.py:552-585."""
    ok = _ref_test(predicates)
    return (t for t in _maybe_progress(triples, progress) if ok(t.predicate))


def keep_triples_by_hash(
    triples: Iterable[Triple],
    converter,
    triple_hashes: "str | Iterable[str]",
    *,
    progress: bool = False,
) -> Iterable[Triple]:
    """Keep triples whose hash under the converter is in the given
    collection (reference filters.py:337-387)."""
    if isinstance(triple_hashes, str):
        wanted = {triple_hashes}
    else:
        wanted = set(triple_hashes)
    return (
        t
        for t in _maybe_progress(triples, progress)
        if hash_triple(converter, t) in wanted
    )


def exclude_triples(
    triples: Iterable[Triple],
    exclusion: "Triple | Collection[Triple]",
    *,
    progress: bool = False,
) -> Iterable[Triple]:
    """Drop the given triple(s) (reference filters.py:390-427)."""
    bad = {exclusion} if isinstance(exclusion, Triple) else set(exclusion)
    return (t for t in _maybe_progress(triples, progress) if t not in bad)


# -- many-to-many (reference triples/ops.py:38-143) -------------------------


def get_prefix_stratified_many_to_many(triples: Iterable[Triple]) -> "set[Triple]":
    """Triples in many-to-many mappings within their (subject-prefix,
    object-prefix) pair — the reference's two-sided slicing (ops.py:
    63-143): a triple is M:N iff its object has >1 distinct subjects
    and its subject has >1 distinct such "popular" objects. Predicates
    are ignored. The distributed twin (same semantics, window counts
    over the distinct edge set) is
    :func:`curies_spark.operators.triples.get_prefix_stratified_many_to_many`.
    """
    triples = list(triples)
    subjects_of: "defaultdict[tuple, set]" = defaultdict(set)
    for t in triples:
        pair = (t.subject.prefix, t.object.prefix)
        subjects_of[(pair, t.object.identifier)].add(t.subject.identifier)
    popular = {key for key, subs in subjects_of.items() if len(subs) > 1}
    popular_objects_of: "defaultdict[tuple, set]" = defaultdict(set)
    for t in triples:
        pair = (t.subject.prefix, t.object.prefix)
        if (pair, t.object.identifier) in popular:
            popular_objects_of[(pair, t.subject.identifier)].add(t.object.identifier)
    return {
        t
        for t in triples
        if ((t.subject.prefix, t.object.prefix), t.object.identifier) in popular
        and len(
            popular_objects_of[
                ((t.subject.prefix, t.object.prefix), t.subject.identifier)
            ]
        )
        > 1
    }


def exclude_prefix_stratified_many_to_many(
    triples: Iterable[Triple], *, progress: bool = False
) -> Iterable[Triple]:
    """Drop M:N triples (reference ops.py:38-60; consumes the iterator —
    two passes are required)."""
    triples = list(triples)
    return exclude_triples(
        triples, get_prefix_stratified_many_to_many(triples), progress=progress
    )


# -- hashing (reference triples/hash_utils.py:17-115) -----------------------


def encode_uri_triple(uri_triple: "tuple[str, str, str]", *, negate: bool = False) -> str:
    """SHA-256 hex digest of the space-joined URI triple; ``negate``
    appends ``~`` (reference hash_utils.py:88-115). Columnar twin:
    ``functions.kernels.hash_uri_triple_col``."""
    digest = hashlib.sha256(" ".join(uri_triple).encode("utf-8")).hexdigest()
    return digest + "~" if negate else digest


def encode_curie_triple(
    curie_triple: "tuple[str, str, str]", converter, *, negate: bool = False
) -> str:
    """Strictly expand then hash a CURIE triple (reference
    hash_utils.py:49-85)."""
    uris = tuple(converter.expand(c, strict=True) for c in curie_triple)
    return encode_uri_triple(uris, negate=negate)


def hash_triple(converter, triple: Triple, *, negate: bool = False) -> str:
    """Hash a :class:`Triple` after strict URI expansion (reference
    hash_utils.py:17-46)."""
    return encode_uri_triple(triple.as_uri_triple(converter), negate=negate)


# -- io (reference triples/io.py:24-53) -------------------------------------


def _open_text(path, mode: str):
    """Open plain or gzip text keyed on the ``.gz`` suffix (the
    reference's pystow safe_open behavior)."""
    path = Path(path).expanduser()
    if path.suffix == ".gz":
        return gzip.open(path, mode + "t", newline="" if "w" in mode else None)
    return path.open(mode, newline="" if "w" in mode else None)


def write_triples(
    triples: Iterable[Triple],
    path,
    *,
    header: "Iterable[str] | None" = None,
) -> None:
    """Write triples as a three-column CURIE TSV (gzipped when the
    path ends in ``.gz``)."""
    with _open_text(path, "w") as fh:
        writer = csv.writer(fh, delimiter="\t", lineterminator="\n")
        writer.writerow(HEADER if header is None else list(header))
        writer.writerows(t.as_str_triple() for t in triples)


def read_triples(path, *, reference_cls: "type | None" = None) -> "list[Triple]":
    """Read triples from a three-column CURIE TSV — gzipped when the
    path ends in ``.gz``; the header row is skipped; ``reference_cls``
    customizes the parsed reference type."""
    cls = reference_cls or Reference
    with _open_text(path, "r") as fh:
        reader = csv.reader(fh, delimiter="\t")
        next(reader)
        return [
            Triple(cls.from_curie(s), cls.from_curie(p), cls.from_curie(o))
            for s, p, o in reader
        ]
