"""Mapping-service semantics: dynamic sameAs triples, driver and data scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from curies_spark.core.converter import Converter
from curies_spark.core.mapping_service import (
    DEFAULT_MAPPING_PREDICATE,
    MappingServiceGraph,
)
from curies_spark.operators.mapping import sameas_edges

#: the converter of the reference's documented example
#: (mapping_service/api.py:54-90)
PRIORITY_MAP = {
    "CHEBI": [
        "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=",
        "http://identifiers.org/chebi/",
        "http://purl.obolibrary.org/obo/CHEBI_",
    ],
    "GO": ["http://purl.obolibrary.org/obo/GO_"],
    "OBO": ["http://purl.obolibrary.org/obo/"],
}


def _graph() -> MappingServiceGraph:
    return MappingServiceGraph(
        converter=Converter.from_priority_prefix_map(PRIORITY_MAP)
    )


def test_reference_doc_example_subject_bound():
    # reference mapping_service/api.py:83-90 results table
    got = sorted(
        o
        for _, _, o in _graph().triples(
            ("http://purl.obolibrary.org/obo/CHEBI_1", DEFAULT_MAPPING_PREDICATE, None)
        )
    )
    assert got == [
        "http://identifiers.org/chebi/1",
        "http://purl.obolibrary.org/obo/CHEBI_1",
        "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=1",
    ]


def test_object_bound_and_pattern_misses():
    g = _graph()
    subjects = {
        s
        for s, _, _ in g.triples(
            (None, DEFAULT_MAPPING_PREDICATE, "http://identifiers.org/chebi/1")
        )
    }
    assert "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=1" in subjects
    # non-mapping predicate → nothing
    assert not list(
        g.triples(("http://identifiers.org/chebi/1", "http://example.org/p", None))
    )
    # both bound or both unbound → nothing (reference yields only the
    # half-bound patterns)
    assert not list(g.triples((None, DEFAULT_MAPPING_PREDICATE, None)))
    # unparsable URI → nothing
    assert not list(
        g.triples(("http://nobody.knows/this", DEFAULT_MAPPING_PREDICATE, None))
    )


def test_invalid_iris_filtered():
    converter = Converter.from_prefix_map({"BAD": "http://x.org/bad path/"})
    g = MappingServiceGraph(converter=converter)
    assert not list(
        g.triples(("http://x.org/bad path/1", DEFAULT_MAPPING_PREDICATE, None))
    )


def test_custom_predicates_cross_product():
    g = MappingServiceGraph(
        converter=Converter.from_priority_prefix_map(PRIORITY_MAP),
        predicates=["p:a", "p:b"],
    )
    rows = list(g.triples(("http://purl.obolibrary.org/obo/GO_9", "p:a", None)))
    assert {(s, p) for s, p, _ in rows} == {
        ("http://purl.obolibrary.org/obo/GO_9", "p:a"),
        ("http://purl.obolibrary.org/obo/GO_9", "p:b"),
    }


def test_mapping_service_doctests():
    import doctest

    from curies_spark.core import mapping_service as module

    results = doctest.testmod(module)
    assert results.failed == 0 and results.attempted > 0


def test_sameas_edges_reference_sparql_vector(spark):
    """The reference's SPARQL_SIMPLE test (tests/test_mapping_service.py:
    46-96): a VALUES block of two CHEBI URIs must yield exactly its
    EXPECTED (s, o) set — here as the data-scale form, where the VALUES
    block is a DataFrame."""
    converter = Converter.from_priority_prefix_map(PRIORITY_MAP)
    values = spark.createDataFrame(
        [
            ("http://purl.obolibrary.org/obo/CHEBI_1",),
            ("http://purl.obolibrary.org/obo/CHEBI_2",),
        ],
        ["uri"],
    )
    got = {
        (r["subject"], r["object"])
        for r in sameas_edges(values, converter).collect()
    }
    expected = {
        ("http://purl.obolibrary.org/obo/CHEBI_1", "http://purl.obolibrary.org/obo/CHEBI_1"),
        ("http://purl.obolibrary.org/obo/CHEBI_1", "http://identifiers.org/chebi/1"),
        ("http://purl.obolibrary.org/obo/CHEBI_1", "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=1"),
        ("http://purl.obolibrary.org/obo/CHEBI_2", "http://purl.obolibrary.org/obo/CHEBI_2"),
        ("http://purl.obolibrary.org/obo/CHEBI_2", "http://identifiers.org/chebi/2"),
        ("http://purl.obolibrary.org/obo/CHEBI_2", "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=2"),
    }
    assert got == expected


def test_sameas_edges_matches_driver_graph(spark):
    converter = Converter.from_priority_prefix_map(PRIORITY_MAP)
    uris = [
        "http://purl.obolibrary.org/obo/CHEBI_1",
        "http://identifiers.org/chebi/44",
        "http://purl.obolibrary.org/obo/GO_7",
        "http://nobody.knows/this",
    ]
    df = spark.createDataFrame([(u,) for u in uris], ["uri"])
    got = {
        (r["subject"], r["predicate"], r["object"])
        for r in sameas_edges(df, converter).collect()
    }
    g = MappingServiceGraph(converter=converter)
    want = {
        t for u in uris for t in g.triples((u, DEFAULT_MAPPING_PREDICATE, None))
    }
    assert got == want and got  # non-empty and identical

    # the plan must be shuffle-free: scan → project/explode only
    plan = sameas_edges(df, converter)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
