"""Mapping-service semantics: dynamic owl:sameAs triples from a converter.

Engine form of the reference's mapping service core (reference
mapping_service/api.py:29-118 ``MappingServiceGraph``): given a URI
bound on either side of a mapping predicate, the service answers with
every equivalent URI the converter knows — parse the bound URI, then
expand the reference through ALL URI-prefix (synonyms included).

The reference wraps this in an rdflib ``Graph`` subclass so its SPARQL
engine can evaluate ``VALUES ?s { … } ?s owl:sameAs ?o`` patterns
against it (with a custom processor that evaluates VALUES first,
mapping_service/rdflib_custom.py — Catalyst performs the equivalent
join reorder natively, see docs/PLANS.md). This class keeps the exact
``triples()`` contract duck-typed, with no rdflib dependency; the
HTTP/SPARQL serialization layers are out of engine scope (SURVEY.md
§2.10). The data-scale twin over a DataFrame of URIs is
:func:`curies_spark.operators.mapping.sameas_edges`.
"""

from __future__ import annotations

import re
from typing import Collection, Iterable

from .converter import Converter

__all__ = ["DEFAULT_MAPPING_PREDICATE", "MappingServiceGraph"]

#: the default mapping predicate (rdflib's ``OWL.sameAs``)
DEFAULT_MAPPING_PREDICATE = "http://www.w3.org/2002/07/owl#sameAs"

#: characters that make an IRI invalid (rdflib ``_is_valid_uri``: any of
#: ``<>" {}|\^`` or whitespace) — some registries produce URI prefixes
#: containing spaces, which the service must drop
_INVALID_URI_CHARS_RE = re.compile(r'[\s<>"{}|\\^`]')


def _is_valid_uri(uri: str) -> bool:
    return not _INVALID_URI_CHARS_RE.search(uri)


class MappingServiceGraph:
    """Dynamic sameAs triple generation from a converter.

    Mirrors reference mapping_service/api.py:29-118: ``triples()``
    takes an (s, p, o) pattern with ``None`` for unbound positions and
    yields one triple per equivalent URI of the bound side. Works with
    either side bound (subject → objects, object → subjects); both-bound
    and both-unbound patterns yield nothing, as in the reference.

    >>> converter = Converter.from_priority_prefix_map(
    ...     {"CHEBI": ["http://purl.obolibrary.org/obo/CHEBI_",
    ...                "http://identifiers.org/chebi/"]}
    ... )
    >>> graph = MappingServiceGraph(converter=converter)
    >>> sorted(o for _, _, o in graph.triples(
    ...     ("http://identifiers.org/chebi/1", DEFAULT_MAPPING_PREDICATE, None)))
    ['http://identifiers.org/chebi/1', 'http://purl.obolibrary.org/obo/CHEBI_1']
    """

    def __init__(
        self,
        *,
        converter: Converter,
        predicates: "str | Collection[str] | None" = None,
    ) -> None:
        self.converter = converter
        if predicates is None:
            self.query_predicates = {DEFAULT_MAPPING_PREDICATE}
        elif isinstance(predicates, str):
            self.query_predicates = {predicates}
        else:
            self.query_predicates = set(predicates)

    def _expand_pair_all(self, uri: str) -> "list[str]":
        """All equivalent URIs of ``uri``, or [] if unparsable
        (reference api.py:96-103, including the invalid-IRI filter)."""
        reference = self.converter.parse_uri(uri)
        if reference is None:
            return []
        uris = self.converter.expand_pair_all(
            reference.prefix, reference.identifier, strict=True
        )
        return [u for u in uris if _is_valid_uri(u)]

    def triples(
        self, triple: "tuple[str | None, str | None, str | None]"
    ) -> "Iterable[tuple[str, str, str]]":
        """Yield mapping triples matching the pattern
        (reference api.py:105-118)."""
        subj_query, pred_query, obj_query = triple
        if pred_query not in self.query_predicates:
            return
        if subj_query is None and obj_query is not None:
            for subj in self._expand_pair_all(obj_query):
                for pred in self.query_predicates:
                    yield subj, pred, obj_query
        elif subj_query is not None and obj_query is None:
            for obj in self._expand_pair_all(subj_query):
                for pred in self.query_predicates:
                    yield subj_query, pred, obj
