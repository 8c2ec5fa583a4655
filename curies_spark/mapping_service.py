"""Import-path parity for ``curies.mapping_service`` (reference
src/curies/mapping_service/) — the sameAs SPARQL service surface under
its reference module path. Implementations live in
:mod:`curies_spark.core.mapping_service` (the graph) and
:mod:`curies_spark.services.mapping` (the HTTP apps and the rdflib-free
SPARQL evaluator); the data-scale edge generator is
:mod:`curies_spark.operators.mapping`.
"""

from __future__ import annotations

from typing import Any

from .core.mapping_service import MappingServiceGraph
from .services.mapping import (
    evaluate_sparql,
    get_fastapi_mapping_app,
    get_fastapi_mapping_router as get_fastapi_router,
    get_flask_mapping_app,
    get_flask_mapping_blueprint,
)

__all__ = [
    "MappingServiceGraph",
    "MappingServiceSPARQLProcessor",
    "get_fastapi_mapping_app",
    "get_fastapi_router",
    "get_flask_mapping_app",
    "get_flask_mapping_blueprint",
]


class MappingServiceSPARQLProcessor:
    """The reference's processor (mapping_service/rdflib_custom.py) is
    rdflib glue whose one job is evaluating the service's SPARQL subset
    with ``VALUES`` bound first; this engine evaluates that subset
    directly (services/mapping.py, no rdflib), so the same-name class
    wraps the evaluator behind the processor's ``graph`` + ``query``
    shape."""

    def __init__(self, graph: MappingServiceGraph) -> None:
        self.graph = graph

    def query(
        self, sparql: str, *args: Any, **kwargs: Any
    ) -> "tuple[list[str], list[dict[str, str]]]":
        """Evaluate a sameAs-service SPARQL query against the graph:
        returns (variable names, binding rows). rdflib-specific extras
        (``initBindings``/``initNs``/positional context) are NOT
        supported — fail loud rather than silently evaluating the bare
        query with the caller's bindings ignored."""
        if args or kwargs:
            raise TypeError(
                "MappingServiceSPARQLProcessor.query supports only the "
                f"query string; got extras {args!r} {sorted(kwargs)!r} — "
                "inline bindings as a VALUES clause instead"
            )
        return evaluate_sparql(self.graph, sparql)
