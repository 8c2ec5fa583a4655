"""Mapping-service HTTP endpoint: the SPARQL surface of
:class:`curies_spark.core.mapping_service.MappingServiceGraph`.

The reference mounts its graph behind rdflib's full SPARQL engine
(mapping_service/api.py:121-220); the queries the service actually
receives — directly or via SPARQL 1.1 federation (``SERVICE <...>``) —
are single-pattern sameAs lookups with a VALUES block binding one side
(every shape exercised by reference tests/test_mapping_service.py:46-150).
This module evaluates exactly that subset without rdflib:

- ``SELECT [DISTINCT|REDUCED] (?vars|*) WHERE { VALUES ?s { <u>… }
  ?s owl:sameAs ?o }`` and the ``?o``-bound backwards form;
- the federated-engine form with a trailing parenthesized VALUES block
  (``SELECT REDUCED * WHERE { ?s owl:sameAs ?o . } VALUES (?s) { (<u>) }``);
- directly bound IRIs on either side;
- unsupported predicates / both-bound / both-unbound / unparsable URIs
  yield **empty results**, matching the reference graph's behavior.

Content negotiation (q-values, synonym content types) and the
SPARQL 1.1 results serializations (JSON, XML, CSV) mirror reference
mapping_service/utils.py:28-148.
"""

from __future__ import annotations

import csv
import io
import json
import re
from typing import Any, Iterable
from xml.sax.saxutils import escape

from ..core.mapping_service import MappingServiceGraph

__all__ = [
    "CONTENT_TYPE_SYNONYMS",
    "CONTENT_TYPE_TO_FORMAT",
    "evaluate_sparql",
    "get_fastapi_mapping_app",
    "get_fastapi_mapping_router",
    "get_flask_mapping_app",
    "get_flask_mapping_blueprint",
    "handle_header",
    "parse_header",
    "serialize_results",
]

#: default content type for federated queries (reference utils.py:32)
DEFAULT_CONTENT_TYPE = "application/sparql-results+xml"

#: canonical content type → serialization key (reference utils.py:36-43)
CONTENT_TYPE_TO_FORMAT = {
    "application/sparql-results+json": "json",
    "application/sparql-results+xml": "xml",
    "application/sparql-results+csv": "csv",
}

#: synonym content types → canonical (reference utils.py:46-52)
CONTENT_TYPE_SYNONYMS = {
    "application/json": "application/sparql-results+json",
    "text/json": "application/sparql-results+json",
    "application/xml": "application/sparql-results+xml",
    "text/xml": "application/sparql-results+xml",
    "text/csv": "application/sparql-results+csv",
}

#: IRI forms of the default mapping predicate's CURIE
_OWL_SAMEAS_TOKENS = ("owl:sameAs", "<http://www.w3.org/2002/07/owl#sameAs>")

class Lit(str):
    """A binding value that is an RDF literal rather than an IRI.

    ``evaluate_sparql`` marks BIND-produced strings with this subclass
    so the serializers can type them (``"type": "literal"`` in JSON,
    ``<literal>`` in XML) without changing the row shape."""


_VALUES_RE = re.compile(
    r"VALUES\s*\(?\s*\?(\w+)\s*\)?\s*\{([^{}]*)\}", re.IGNORECASE
)
_BIND_RE = re.compile(r'BIND\s*\(\s*"([^"]*)"\s+as\s+\?(\w+)\s*\)\s*\.?', re.IGNORECASE)
_IRI_RE = re.compile(r"<([^<>\s]+)>")
_WHERE_RE = re.compile(r"WHERE\s*\{(.*)\}", re.IGNORECASE | re.DOTALL)
_SELECT_RE = re.compile(
    r"SELECT\s+(?:DISTINCT\s+|REDUCED\s+)?(\*|(?:\?\w+[\s,]*)+)\s+WHERE",
    re.IGNORECASE,
)
_PATTERN_RE = re.compile(
    r"(\?\w+|<[^<>\s]+>)\s+(\S+)\s+(\?\w+|<[^<>\s]+>)\s*\.?"
)
_PREFIX_DECL_RE = re.compile(r"PREFIX\s+(\w+):\s*<([^<>\s]+)>", re.IGNORECASE)


def _parse(sparql: str) -> "dict[str, Any]":
    """Parse the supported SPARQL subset → a description dict.

    Raises ``ValueError`` on queries outside the subset (malformed /
    multi-pattern), which the HTTP layer maps to a 400.
    """
    prefixes = dict(_PREFIX_DECL_RE.findall(sparql))
    body = _PREFIX_DECL_RE.sub("", sparql)

    values: "dict[str, list[str]]" = {}
    for var, block in _VALUES_RE.findall(body):
        values[var] = _IRI_RE.findall(block)
    body_no_values = _VALUES_RE.sub("", body)

    select = _SELECT_RE.search(body_no_values)
    if select is None:
        raise ValueError("unsupported query: expected SELECT ... WHERE")
    projection = select.group(1).strip()

    where = _WHERE_RE.search(body_no_values)
    if where is None:
        raise ValueError("unsupported query: missing WHERE clause")
    where_body = where.group(1)

    # literal BINDs (the reference's PING_SPARQL health-check shape,
    # reference mapping_service/utils.py:29): a WHERE clause of only
    # BIND("lit" as ?var) terms yields one all-literal row
    binds = {var: value for value, var in _BIND_RE.findall(where_body)}
    where_body = _BIND_RE.sub("", where_body)

    pattern = _PATTERN_RE.search(where_body)
    if pattern is None:
        if binds:
            return {"projection": projection, "binds": binds, "values": values}
        raise ValueError("unsupported query: expected one triple pattern")
    subj_tok, pred_tok, obj_tok = pattern.groups()

    # resolve a prefixed predicate through any PREFIX declarations
    if ":" in pred_tok and not pred_tok.startswith(("<", "?")):
        pfx, _, local = pred_tok.partition(":")
        if pfx in prefixes:
            pred_tok = f"<{prefixes[pfx]}{local}>"

    return {
        "projection": projection,
        "subject": subj_tok,
        "predicate": pred_tok,
        "object": obj_tok,
        "values": values,
    }


def _predicate_iris(graph: MappingServiceGraph, token: str) -> "str | None":
    """The predicate IRI this token denotes iff the graph serves it."""
    if token in _OWL_SAMEAS_TOKENS:
        iri = "http://www.w3.org/2002/07/owl#sameAs"
    elif token.startswith("<") and token.endswith(">"):
        iri = token[1:-1]
    else:
        return None
    return iri if iri in graph.query_predicates else None


def evaluate_sparql(
    graph: MappingServiceGraph, sparql: str
) -> "tuple[list[str], list[dict[str, str]]]":
    """Evaluate a supported query → (projected variables, binding rows).

    Out-of-subset *semantics* (bad predicate, both sides bound, both
    unbound without VALUES, unparsable URI) yield empty rows, exactly as
    the reference graph's ``triples()`` does under rdflib.
    """
    q = _parse(sparql)
    if "binds" in q:
        bind_vars = list(q["binds"])
        if q["projection"] == "*":
            out_vars = bind_vars
        else:
            out_vars = re.findall(r"\?(\w+)", q["projection"])
        return out_vars, [{v: Lit(q["binds"][v]) for v in bind_vars}]
    subj, obj = q["subject"], q["object"]
    pred = _predicate_iris(graph, q["predicate"])

    pattern_vars = [t[1:] for t in (subj, obj) if t.startswith("?")]
    if q["projection"] == "*":
        out_vars = pattern_vars
    else:
        # re-extract var names: the projection text may be comma- or
        # whitespace-separated ("?s, ?o"), and lstrip would mangle a
        # trailing comma into the var name
        out_vars = re.findall(r"\?(\w+)", q["projection"])

    rows: "list[dict[str, str]]" = []
    if pred is not None:
        bindings: "Iterable[tuple[str | None, str | None]]"
        if subj.startswith("<") and obj.startswith("?"):
            bindings = [(subj[1:-1], None)]
        elif subj.startswith("?") and obj.startswith("<"):
            bindings = [(None, obj[1:-1])]
        elif subj.startswith("?") and obj.startswith("?"):
            s_vals = q["values"].get(subj[1:])
            o_vals = q["values"].get(obj[1:])
            if s_vals is not None:
                bindings = [(u, None) for u in s_vals]
            elif o_vals is not None:
                bindings = [(None, u) for u in o_vals]
            else:  # both unbound: the reference yields nothing
                bindings = []
        else:  # both bound: the reference yields nothing
            bindings = []

        seen = set()
        for s_bound, o_bound in bindings:
            for s, _p, o in graph.triples((s_bound, pred, o_bound)):
                binding = {}
                if subj.startswith("?"):
                    binding[subj[1:]] = s
                if obj.startswith("?"):
                    binding[obj[1:]] = o
                key = tuple(sorted(binding.items()))
                if key not in seen:  # SELECT DISTINCT/REDUCED semantics
                    seen.add(key)
                    rows.append(binding)

    return out_vars, rows


# ---------------------------------------------------------------------------
# SPARQL 1.1 results serialization (reference serializes via rdflib)
# ---------------------------------------------------------------------------


def serialize_results(
    variables: "list[str]", rows: "list[dict[str, str]]", fmt: str
) -> str:
    """Serialize bindings as SPARQL 1.1 results JSON / XML / CSV."""
    if fmt == "json":
        return json.dumps(
            {
                "head": {"vars": variables},
                "results": {
                    "bindings": [
                        {
                            var: {
                                "type": "literal"
                                if isinstance(row[var], Lit)
                                else "uri",
                                "value": row[var],
                            }
                            for var in variables
                            if var in row
                        }
                        for row in rows
                    ]
                },
            }
        )
    if fmt == "xml":
        parts = ['<?xml version="1.0"?>']
        parts.append('<sparql xmlns="http://www.w3.org/2005/sparql-results#">')
        parts.append(
            "<head>" + "".join(f'<variable name="{v}"/>' for v in variables) + "</head>"
        )
        parts.append("<results>")
        for row in rows:
            parts.append("<result>")
            for var in variables:
                if var in row:
                    tag = "literal" if isinstance(row[var], Lit) else "uri"
                    parts.append(
                        f'<binding name="{var}"><{tag}>{escape(row[var])}</{tag}></binding>'
                    )
            parts.append("</result>")
        parts.append("</results></sparql>")
        return "".join(parts)
    if fmt == "csv":
        buf = io.StringIO()
        writer = csv.writer(buf, lineterminator="\r\n")
        writer.writerow(variables)
        for row in rows:
            writer.writerow([row.get(v, "") for v in variables])
        return buf.getvalue()
    raise ValueError(f"unknown serialization format: {fmt}")


# ---------------------------------------------------------------------------
# content negotiation (reference utils.py:123-148)
# ---------------------------------------------------------------------------


def _handle_part(part: str) -> "tuple[str, float]":
    if ";q=" not in part:
        return part.strip(), 1.0
    key, q = part.split(";q=", 1)
    return key.strip(), float(q)


def parse_header(header: str) -> "list[str]":
    """Accept-header media types in descending q order."""
    parts = dict(_handle_part(part) for part in header.split(","))
    return sorted(parts, key=parts.__getitem__, reverse=True)


def handle_header(header: "str | None", default: str = DEFAULT_CONTENT_TYPE) -> str:
    """Canonical content type for an Accept header."""
    if not header:
        return default
    for part in parse_header(header):
        part = CONTENT_TYPE_SYNONYMS.get(part, part)
        if part in CONTENT_TYPE_TO_FORMAT:
            return part
    return default


# ---------------------------------------------------------------------------
# Flask surface (reference mapping_service/api.py:121-152, 198-205)
# ---------------------------------------------------------------------------


def get_flask_mapping_blueprint(
    converter: Any, route: str = "/sparql", **kwargs: Any
) -> "Any":
    """Get a Flask blueprint serving the mapping SPARQL endpoint."""
    from flask import Blueprint, Response, request

    blueprint = Blueprint("mapping", __name__, **kwargs)
    graph = MappingServiceGraph(converter=converter)

    @blueprint.route(route, methods=["GET", "POST"])
    def serve_sparql() -> "Any":
        sparql = request.values.get("query")
        if not sparql:
            return Response(
                "Missing query (either in args for GET requests, "
                "or in form for POST requests)",
                400,
            )
        content_type = handle_header(request.headers.get("accept"))
        try:
            variables, rows = evaluate_sparql(graph, sparql)
        except ValueError as e:
            return Response(str(e), 400)
        payload = serialize_results(
            variables, rows, CONTENT_TYPE_TO_FORMAT[content_type]
        )
        return Response(payload, content_type=content_type)

    return blueprint


def get_flask_mapping_app(converter: Any) -> "Any":
    """Get a Flask app for the mapping service."""
    from flask import Flask

    app = Flask(__name__)
    app.register_blueprint(get_flask_mapping_blueprint(converter))
    return app


# ---------------------------------------------------------------------------
# FastAPI surface (reference mapping_service/api.py:154-196, 208-220),
# lazy like the Flask one: fastapi is imported at call time with a clear
# ImportError where absent
# ---------------------------------------------------------------------------


def get_fastapi_mapping_router(
    converter: Any, route: str = "/sparql", **kwargs: Any
) -> "Any":
    """Get a FastAPI router serving the mapping SPARQL endpoint."""
    try:
        from fastapi import APIRouter, Form, Header, Query, Response
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "get_fastapi_mapping_router requires fastapi; install it or "
            "use get_flask_mapping_blueprint for the Flask variant"
        ) from e

    api_router = APIRouter(**kwargs)
    graph = MappingServiceGraph(converter=converter)

    def _resolve(accept: "str | None", sparql: str) -> "Any":
        content_type = handle_header(accept)
        try:
            variables, rows = evaluate_sparql(graph, sparql)
        except ValueError as e:
            return Response(str(e), status_code=400)
        payload = serialize_results(
            variables, rows, CONTENT_TYPE_TO_FORMAT[content_type]
        )
        return Response(payload, media_type=content_type)

    @api_router.get(route)
    def resolve_get(
        query: str = Query(description="The SPARQL query to run"),
        accept: "str | None" = Header(default=None),
    ) -> "Any":
        return _resolve(accept, query)

    @api_router.post(route)
    def resolve_post(
        query: str = Form(description="The SPARQL query to run"),
        accept: "str | None" = Header(default=None),
    ) -> "Any":
        return _resolve(accept, query)

    return api_router


def get_fastapi_mapping_app(converter: Any) -> "Any":
    """Get a FastAPI app for the mapping service."""
    from fastapi import FastAPI

    router = get_fastapi_mapping_router(converter)
    app = FastAPI()
    app.include_router(router)
    return app
