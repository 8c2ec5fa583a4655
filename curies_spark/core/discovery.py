"""URI-prefix discovery (driver-scale iterable form).

Semantics from the reference (/root/reference/src/curies/discovery.py:138-265):
for each URI, the first delimiter (in priority order ``#``, ``/``, ``_``)
whose rightmost split yields an all-alphanumeric LUID wins; URI prefixes
with ≥ cutoff distinct LUIDs are kept, sorted lexicographically, and
assigned dummy prefixes ``ns1..nsN``.

The distributed DataFrame twin lives in
:mod:`curies_spark.operators.discovery`.
"""

from __future__ import annotations

import re
from collections import defaultdict
from pathlib import Path
from typing import Any, Iterable, Mapping, Sequence

from .converter import Converter
from .record import Record

__all__ = [
    "DEFAULT_DELIMITERS",
    "discover",
    "discover_from_rdf",
    "get_uris_from_rdf",
]

#: Reference discovery.py:230
DEFAULT_DELIMITERS = ("#", "/", "_")

#: absolute-URI shape for duck-typed graph parts (real rdflib nodes are
#: classified by type instead, matching reference discovery.py:129-135)
_ABSOLUTE_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://\S+$")

#: ``<uri>`` tokens of an N-Triples/Turtle-ish document
_ANGLE_URI_RE = re.compile(r"<([^<>\s]+)>")


def _is_uri_part(part: Any) -> bool:
    """True for graph nodes that are URI references.

    With rdflib importable this is the reference's
    ``isinstance(part, rdflib.URIRef)`` (discovery.py:129-135); for
    duck-typed graphs (tests, other RDF libraries) a node whose class is
    not literal/bnode-like and whose string form is an absolute URI
    counts.
    """
    try:
        import rdflib

        return isinstance(part, rdflib.URIRef)
    except ImportError:
        cls = type(part).__name__
        if cls in ("Literal", "BNode"):
            return False
        return bool(_ABSOLUTE_URI_RE.match(str(part)))


def get_uris_from_rdf(graph: Any, *, format: "str | None" = None) -> "set[str]":
    """Set of URIs appearing in any triple position of an RDF graph
    (reference discovery.py:108-135).

    ``graph`` is either a graph object exposing
    ``triples((None, None, None))`` (rdflib or duck-typed), or — when
    rdflib is importable — any source its ``Graph.parse`` accepts. As an
    rdflib-free fallback, a path to (or text of) an N-Triples document is
    parsed directly: ``<uri>`` tokens are exactly its URI references.
    """
    if hasattr(graph, "triples"):
        return {
            str(part)
            for parts in graph.triples((None, None, None))
            for part in parts
            if _is_uri_part(part)
        }
    # inline N-Triples TEXT parses directly in every environment —
    # rdflib's Graph.parse treats a plain string as a file path/URL, so
    # routing text through it would make behavior rdflib-dependent.
    # "<" never appears in a path or URL-location string, so it safely
    # distinguishes inline content from a source locator.
    if isinstance(graph, str) and "<" in graph:
        return set(_ANGLE_URI_RE.findall(graph))
    try:
        import rdflib

        g = rdflib.Graph()
        g.parse(source=graph, format=format)
        return get_uris_from_rdf(g)
    except ImportError:
        pass
    if isinstance(graph, Path):
        text = graph.read_text()
    elif isinstance(graph, str) and "\n" not in graph and "<" not in graph:
        text = Path(graph).read_text()
    elif isinstance(graph, str):
        text = graph
    else:  # IO-like
        text = graph.read()
        if isinstance(text, bytes):
            text = text.decode()
    return set(_ANGLE_URI_RE.findall(text))


def discover_from_rdf(graph: Any, *, format: "str | None" = None, **kwargs: Any) -> Converter:
    """:func:`discover` with the URI list harvested from an RDF graph
    (reference discovery.py:76-105). The distributed twin over triple
    DataFrames is :func:`curies_spark.operators.discovery.
    discover_from_triples`."""
    return discover(get_uris_from_rdf(graph, format=format), **kwargs)


def _get_uri_prefix_to_luids(
    *,
    converter: Converter | None = None,
    uris: Iterable[str],
    delimiters: Sequence[str] | None = None,
) -> Mapping[str, set[str]]:
    """Reference discovery.py:236-265 (including the GitHub-issues special case)."""
    if not delimiters:
        delimiters = DEFAULT_DELIMITERS
    uri_prefix_to_luids: defaultdict[str, set[str]] = defaultdict(set)
    for uri in uris:
        if converter is not None and converter.is_uri(uri):
            continue
        if uri.startswith("https://github.com") and "issues" in uri:
            continue
        for delimiter in delimiters:
            if delimiter not in uri:
                continue
            uri_prefix, luid = uri.rsplit(delimiter, maxsplit=1)
            if luid.isalnum():
                uri_prefix_to_luids[uri_prefix + delimiter].add(luid)
                break
    return dict(uri_prefix_to_luids)


def discover(
    uris: Iterable[str],
    *,
    delimiters: Sequence[str] | None = None,
    cutoff: int | None = None,
    metaprefix: str = "ns",
    converter: Converter | None = None,
) -> Converter:
    """Discover URI prefixes, returning a converter with dummy prefixes
    (reference discovery.py:138-228)."""
    uri_prefix_to_luids = _get_uri_prefix_to_luids(
        converter=converter, uris=uris, delimiters=delimiters
    )
    uri_prefixes = [
        uri_prefix
        for uri_prefix, luids in sorted(uri_prefix_to_luids.items())
        if cutoff is None or len(luids) >= cutoff
    ]
    records = [
        Record(prefix=f"{metaprefix}{index}", uri_prefix=uri_prefix)
        for index, uri_prefix in enumerate(uri_prefixes, start=1)
    ]
    return Converter(records)
