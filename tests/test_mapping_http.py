"""Mapping-service SPARQL endpoint: the reference's test vectors
(reference tests/test_mapping_service.py:46-180, 206-280) over the
engine's rdflib-free evaluator + Flask blueprint."""

from __future__ import annotations

import csv
import json

import pytest

flask = pytest.importorskip("flask")

from curies_spark.core.converter import Converter
from curies_spark.core.mapping_service import MappingServiceGraph
from curies_spark.services import (
    evaluate_sparql,
    get_flask_mapping_app,
    handle_header,
    parse_header,
)

PREFIX_MAP = {
    "CHEBI": [
        "http://purl.obolibrary.org/obo/CHEBI_",
        "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=",
        "http://identifiers.org/chebi/",
    ],
}

SPARQL_SIMPLE = """\
SELECT DISTINCT ?s ?o WHERE {
    VALUES ?s {
        <http://purl.obolibrary.org/obo/CHEBI_1>
        <http://purl.obolibrary.org/obo/CHEBI_2>
    }
    ?s owl:sameAs ?o
}"""

SPARQL_SIMPLE_BACKWARDS = """\
SELECT DISTINCT ?s ?o WHERE {
    VALUES ?o {
        <http://purl.obolibrary.org/obo/CHEBI_1>
        <http://purl.obolibrary.org/obo/CHEBI_2>
    }
    ?s owl:sameAs ?o
}"""

#: the query shape a federating SPARQL engine sends (reference :67-75)
SPARQL_FROM_SERVICE = """\
SELECT REDUCED * WHERE {
    ?s owl:sameAs ?o .
}
VALUES (?s) {
    (<http://purl.obolibrary.org/obo/CHEBI_1>)
    (<http://purl.obolibrary.org/obo/CHEBI_2>)
}"""

EXPECTED = {
    ("http://purl.obolibrary.org/obo/CHEBI_1", "http://purl.obolibrary.org/obo/CHEBI_1"),
    ("http://purl.obolibrary.org/obo/CHEBI_1", "http://identifiers.org/chebi/1"),
    ("http://purl.obolibrary.org/obo/CHEBI_1", "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=1"),
    ("http://purl.obolibrary.org/obo/CHEBI_2", "http://purl.obolibrary.org/obo/CHEBI_2"),
    ("http://purl.obolibrary.org/obo/CHEBI_2", "http://identifiers.org/chebi/2"),
    ("http://purl.obolibrary.org/obo/CHEBI_2", "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=2"),
}


@pytest.fixture(scope="module")
def graph():
    return MappingServiceGraph(
        converter=Converter.from_priority_prefix_map(PREFIX_MAP)
    )


def _so(rows):
    return {(r["s"], r["o"]) for r in rows}


def test_sparql_simple(graph):
    variables, rows = evaluate_sparql(graph, SPARQL_SIMPLE)
    assert variables == ["s", "o"]
    assert _so(rows) == EXPECTED


def test_sparql_backwards(graph):
    _, rows = evaluate_sparql(graph, SPARQL_SIMPLE_BACKWARDS)
    assert _so(rows) == {(o, s) for s, o in EXPECTED}


def test_sparql_from_federated_service(graph):
    variables, rows = evaluate_sparql(graph, SPARQL_FROM_SERVICE)
    assert set(variables) == {"s", "o"}
    assert _so(rows) == EXPECTED


def test_missing_uris_yield_empty(graph):
    sparql = """\
        SELECT ?s ?o WHERE {
            VALUES ?s { <http://example.org/1> <http://example.org/1> }
            ?s owl:sameAs ?o
        }"""
    assert evaluate_sparql(graph, sparql)[1] == []


def test_error_shapes_yield_empty(graph):
    # reference tests/test_mapping_service.py:134-150
    for sparql in [
        "SELECT ?s ?o WHERE { ?s owl:sameAs ?o }",
        "SELECT ?o WHERE { <http://purl.obolibrary.org/obo/CHEBI_1> rdfs:seeAlso ?o }",
        "SELECT ?s WHERE { ?s rdfs:seeAlso <http://purl.obolibrary.org/obo/CHEBI_1> }",
        "SELECT ?o WHERE { <http://example.com/1> owl:sameAs ?o }",
        "SELECT ?s WHERE { ?s owl:sameAs <http://example.com/1> }",
        "SELECT * WHERE { <http://purl.obolibrary.org/obo/CHEBI_1> "
        "owl:sameAs <http://purl.obolibrary.org/obo/CHEBI_1> }",
    ]:
        assert evaluate_sparql(graph, sparql)[1] == [], sparql


def test_bound_subject_and_full_predicate_iri(graph):
    sparql = (
        "SELECT ?o WHERE { <http://purl.obolibrary.org/obo/CHEBI_1> "
        "<http://www.w3.org/2002/07/owl#sameAs> ?o }"
    )
    variables, rows = evaluate_sparql(graph, sparql)
    assert variables == ["o"]
    assert {r["o"] for r in rows} == {o for s, o in EXPECTED if s.endswith("CHEBI_1")}


def test_prefix_declaration_resolves_predicate(graph):
    sparql = (
        "PREFIX eq: <http://www.w3.org/2002/07/> "
        "SELECT ?o WHERE { <http://purl.obolibrary.org/obo/CHEBI_1> eq:owl#sameAs ?o }"
    )
    _, rows = evaluate_sparql(graph, sparql)
    assert len(rows) == 3


def test_comma_separated_projection(graph):
    sparql = SPARQL_SIMPLE.replace("SELECT DISTINCT ?s ?o", "SELECT DISTINCT ?s, ?o")
    variables, rows = evaluate_sparql(graph, sparql)
    assert variables == ["s", "o"]
    assert _so(rows) == EXPECTED


def test_content_negotiation():
    # reference utils.py:123-148 semantics
    assert handle_header(None) == "application/sparql-results+xml"
    assert handle_header("application/json") == "application/sparql-results+json"
    assert handle_header("text/csv;q=0.9,application/json;q=0.2") == (
        "application/sparql-results+csv"
    )
    assert parse_header("a;q=0.1,b")[0] == "b"


@pytest.fixture(scope="module")
def client():
    converter = Converter.from_priority_prefix_map(PREFIX_MAP)
    return get_flask_mapping_app(converter).test_client()


def test_http_get_json(client):
    res = client.get(
        "/sparql",
        query_string={"query": SPARQL_SIMPLE},
        headers={"accept": "application/json"},
    )
    assert res.status_code == 200
    assert res.content_type == "application/sparql-results+json"
    data = json.loads(res.get_data(as_text=True))
    rows = {
        (b["s"]["value"], b["o"]["value"]) for b in data["results"]["bindings"]
    }
    assert rows == EXPECTED


def test_http_post_csv(client):
    res = client.post(
        "/sparql",
        data={"query": SPARQL_SIMPLE},
        headers={"accept": "text/csv"},
    )
    assert res.status_code == 200
    records = list(csv.DictReader(res.get_data(as_text=True).splitlines()))
    assert {(r["s"], r["o"]) for r in records} == EXPECTED


def test_http_missing_query_is_400(client):
    assert client.get("/sparql").status_code == 400
    assert client.post("/sparql", data={}).status_code == 400


def test_http_xml_roundtrip(client):
    import xml.etree.ElementTree as ET

    res = client.get("/sparql", query_string={"query": SPARQL_SIMPLE})
    assert res.content_type == "application/sparql-results+xml"
    root = ET.fromstring(res.get_data(as_text=True))
    ns = "{http://www.w3.org/2005/sparql-results#}"
    rows = set()
    for result in root.find(f"{ns}results"):
        values = {
            b.attrib["name"]: b.findtext(f"{ns}uri") for b in result
        }
        rows.add((values["s"], values["o"]))
    assert rows == EXPECTED

def test_evaluator_never_raises_unexpectedly(graph):
    """Fuzz: any input either evaluates or raises ValueError (→ HTTP 400)
    — never a parser crash (→ 500)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.one_of(
            st.text(max_size=200),
            st.from_regex(
                r"SELECT [?\w*, ]{1,20} WHERE \{ [?<>:/\w. ]{0,80} \}", fullmatch=True
            ),
        )
    )
    def run(sparql):
        try:
            variables, rows = evaluate_sparql(graph, sparql)
        except ValueError:
            return
        assert isinstance(variables, list) and isinstance(rows, list)

    run()
