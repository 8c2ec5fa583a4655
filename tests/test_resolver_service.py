"""Resolver service: redirect/failure semantics via the Flask test client
(reference tests/test_resolver_service.py shape)."""

from __future__ import annotations

import pytest

flask = pytest.importorskip("flask")

from curies_spark.core.converter import Converter
from curies_spark.services import FAILURE_CODE, get_flask_app


@pytest.fixture()
def client():
    converter = Converter.from_prefix_map(
        {
            "GO": "http://amigo.geneontology.org/amigo/term/GO:",
            "CHEBI": "http://purl.obolibrary.org/obo/CHEBI_",
        }
    )
    return get_flask_app(converter).test_client()


def test_resolve_redirects(client):
    # the reference's doc example (resolver_service.py:64-71)
    res = client.get("/GO:0032571")
    assert res.status_code == 302
    assert res.headers["Location"] == "http://amigo.geneontology.org/amigo/term/GO:0032571"


def test_identifier_may_contain_slashes_and_colons(client):
    res = client.get("/CHEBI:1/2:3")
    assert res.status_code == 302
    assert res.headers["Location"].endswith("CHEBI_1/2:3")


def test_unknown_prefix_is_422_with_prefix_list(client):
    res = client.get("/nope:1234")
    assert res.status_code == FAILURE_CODE
    body = res.get_data(as_text=True)
    assert "Invalid prefix: nope" in body
    assert "CHEBI" in body and "GO" in body
