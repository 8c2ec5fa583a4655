"""Federation round trip: the repo's own mapping endpoint served via a
Flask test client, fetched through the injectable SPARQL transport, and
parsed back into records (reference mapping_service/utils.py:55-157).
This also covers the server-side BIND-literal evaluation the reference
health-check query requires."""

from __future__ import annotations

import json

import pytest

from curies_spark.core.converter import Converter
from curies_spark.services import federation
from curies_spark.services.mapping import get_flask_mapping_app

EPM = [
    {
        "prefix": "CHEBI",
        "uri_prefix": "http://purl.obolibrary.org/obo/CHEBI_",
        "uri_prefix_synonyms": ["https://identifiers.org/chebi:"],
    }
]

SPARQL = (
    "SELECT ?s ?o WHERE { VALUES ?s { <http://purl.obolibrary.org/obo/CHEBI_2> } "
    "?s <http://www.w3.org/2002/07/owl#sameAs> ?o }"
)

EXPECTED = {
    ("http://purl.obolibrary.org/obo/CHEBI_2", "http://purl.obolibrary.org/obo/CHEBI_2"),
    ("http://purl.obolibrary.org/obo/CHEBI_2", "https://identifiers.org/chebi:2"),
}


@pytest.fixture()
def client():
    return get_flask_mapping_app(Converter.from_extended_prefix_map(EPM)).test_client()


@pytest.fixture()
def fetcher(client):
    def fetch(endpoint, params, headers):
        res = client.get(endpoint, query_string=params, headers=headers)
        if res.status_code != 200:
            raise OSError(f"HTTP {res.status_code}")
        return res.get_data(as_text=True)

    return fetch


@pytest.mark.parametrize(
    "accept",
    [
        "application/sparql-results+json",
        "application/json",
        "application/sparql-results+xml",
        "application/sparql-results+csv",
        "text/csv;q=0.9,application/json;q=0.4",
    ],
)
def test_round_trip_all_content_types(fetcher, accept):
    records = federation.get_sparql_records("/sparql", SPARQL, accept, fetcher=fetcher)
    assert federation.get_sparql_record_so_tuples(records) == EXPECTED


def test_ping_round_trip(fetcher):
    assert federation.sparql_service_available("/sparql", fetcher=fetcher)


def test_ping_false_on_unreachable_and_garbage():
    def down(endpoint, params, headers):
        raise OSError("connection refused")

    assert not federation.sparql_service_available("/sparql", fetcher=down)

    def garbage(endpoint, params, headers):
        return "<html>not sparql</html>"

    assert not federation.sparql_service_available("/sparql", fetcher=garbage)


def test_installed_default_fetcher(fetcher):
    previous = federation.set_sparql_fetcher(fetcher)
    try:
        records = federation.get_sparql_records(
            "/sparql", SPARQL, "application/json"
        )
        assert federation.get_sparql_record_so_tuples(records) == EXPECTED
    finally:
        federation.set_sparql_fetcher(previous)


def test_handlers_parse_reference_shapes():
    # JSON (reference test vectors shape)
    payload = json.dumps(
        {
            "results": {
                "bindings": [
                    {"s": {"type": "uri", "value": "http://x/1"},
                     "o": {"type": "uri", "value": "http://y/1"}}
                ]
            }
        }
    )
    assert federation.handle_json(payload) == [{"s": "http://x/1", "o": "http://y/1"}]
    # XML: only uri bindings survive, as in the reference parser
    xml = (
        '<?xml version="1.0"?>'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
        '<head><variable name="s"/><variable name="o"/></head>'
        "<results><result>"
        '<binding name="s"><uri>http://x/1</uri></binding>'
        '<binding name="o"><literal>plain</literal></binding>'
        "</result></results></sparql>"
    )
    assert federation.handle_xml(xml) == [{"s": "http://x/1"}]
    with pytest.raises(ValueError):
        federation.handle_xml("<notsparql/>")
    # CSV
    assert federation.handle_csv("s,o\r\nhttp://x/1,http://y/1\r\n") == [
        {"s": "http://x/1", "o": "http://y/1"}
    ]


def test_require_service_skips_when_down():
    decorator = federation.require_service("http://127.0.0.1:1/sparql", "test")
    import unittest

    @decorator
    class _Case(unittest.TestCase):
        def test_x(self):  # pragma: no cover - skipped
            pass

    result = unittest.TestResult()
    unittest.defaultTestLoader.loadTestsFromTestCase(_Case).run(result)
    assert len(result.skipped) == 1
