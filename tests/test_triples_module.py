"""Driver-scale curies_spark.triples — reference doctest vectors ported
plus a randomized differential against the reference library's own
triples module (filters + the M:N slicing algorithm)."""

from __future__ import annotations

import random

import pytest

import curies_spark.triples as T
from curies_spark import Converter, Reference

from test_differential_reference import _load_reference

try:
    ref = _load_reference()
    ref_triples = __import__(ref.__name__ + ".triples", fromlist=["triples"])
except Exception:  # pragma: no cover
    ref = ref_triples = None

pytestmark = pytest.mark.skipif(ref is None, reason="reference library unavailable")

EXACT = "skos:exactMatch"
C1, C2, C3 = "DOID:0050577", "mesh:C562966", "umls:C4551571"


def _ours(*curies):
    return [T.Triple.from_curies(s, EXACT, o) for s, o in curies]


def _conv():
    return Converter.from_prefix_map(
        {
            "DOID": "http://purl.obolibrary.org/obo/DOID_",
            "skos": "http://www.w3.org/2004/02/skos/core#",
            "mesh": "http://id.nlm.nih.gov/mesh/",
            "umls": "https://uts.nlm.nih.gov/uts/umls/concept/",
        }
    )


def test_filter_doctest_vectors():
    """The reference's own doctest examples (filters.py:44-585)."""
    m1, m2, m3 = _ours((C1, C2), (C2, C3), (C1, C3))
    assert list(T.keep_prefixes_both([m1, m2, m3], {"DOID", "mesh"})) == [m1]
    assert list(T.keep_prefixes_either([m1, m2, m3], {"DOID", "mesh"})) == [m1, m2, m3]
    assert list(T.keep_prefixes_either([m1, m2, m3], "umls")) == [m2, m3]
    assert list(T.keep_subject_prefixes([m1, m2, m3], "DOID")) == [m1, m3]
    assert list(T.keep_object_prefixes([m1, m2, m3], "mesh")) == [m1]
    assert list(T.exclude_prefixes_both([m1, m2, m3], "umls")) == [m1]
    assert list(T.exclude_subject_prefixes([m1, m2, m3], "mesh")) == [m1, m3]
    assert list(T.exclude_object_prefixes([m1, m2, m3], {"umls"})) == [m1]
    assert list(T.exclude_same_prefixes(_ours((C1, "DOID:1"), (C1, C2)))) == [
        T.Triple.from_curies(C1, EXACT, C2)
    ]
    assert list(T.exclude_triples([m1, m2, m3], m3)) == [m1, m2]

    r1, r2, r3 = (Reference.from_curie(c) for c in (C1, C2, C3))
    assert list(T.keep_references_either([m1, m2, m3], [r1])) == [m1, m3]
    assert list(T.keep_references_both([m1, m2, m3], [r2, r1])) == [m1]
    assert list(T.exclude_references_both([m1, m2, m3], [r1])) == [m2]
    with pytest.raises(ValueError):
        list(T.keep_references_both([m1], [r1]))
    with pytest.raises(ValueError):
        list(T.keep_prefixes_both([m1], {"DOID"}))
    pred = Reference.from_curie(EXACT)
    assert list(T.keep_predicates([m1, m2, m3], pred)) == [m1, m2, m3]

    c = _conv()
    h1 = T.hash_triple(c, m1)
    assert list(T.keep_triples_by_hash([m1, m2, m3], c, h1)) == [m1]


def test_hash_vectors_match_reference():
    c = _conv()
    t = T.Triple.from_curies("mesh:C000089", EXACT, "DOID:1")
    rt = ref_triples.Triple(subject="mesh:C000089", predicate=EXACT, object="DOID:1")
    rc = ref.Converter.from_prefix_map(
        {
            "DOID": "http://purl.obolibrary.org/obo/DOID_",
            "skos": "http://www.w3.org/2004/02/skos/core#",
            "mesh": "http://id.nlm.nih.gov/mesh/",
        }
    )
    assert T.hash_triple(c, t) == ref_triples.hash_triple(rc, rt)
    assert T.hash_triple(c, t, negate=True).endswith("~")
    cur = ("mesh:C000089", EXACT, "DOID:1")
    assert T.encode_curie_triple(cur, c) == ref_triples.encode_curie_triple(cur, rc)
    uris = tuple(c.expand(x, strict=True) for x in cur)
    assert T.encode_uri_triple(uris) == ref_triples.encode_uri_triple(uris)


def test_many_to_many_differential_random():
    """Randomized graphs: our M:N slicing must match the reference's
    algorithm exactly (including the popular-object subtlety)."""
    rng = random.Random(11)
    prefixes = ["a", "b", "c"]
    for trial in range(20):
        edges = {
            (
                f"{rng.choice(prefixes)}:{rng.randrange(6)}",
                f"{rng.choice(prefixes)}:{rng.randrange(6)}",
            )
            for _ in range(rng.randrange(3, 25))
        }
        ours = _ours(*edges)
        theirs = [
            ref_triples.Triple(subject=s, predicate=EXACT, object=o) for s, o in edges
        ]
        got = sorted(
            t.as_str_triple()
            for t in T.exclude_prefix_stratified_many_to_many(ours)
        )
        want = sorted(
            (t.subject.curie, t.predicate.curie, t.object.curie)
            for t in ref_triples.exclude_prefix_stratified_many_to_many(theirs)
        )
        assert got == want, (trial, sorted(edges))


def test_io_round_trip(tmp_path):
    triples = _ours((C1, C2), (C2, C3))
    path = tmp_path / "triples.tsv"
    T.write_triples(triples, path)
    back = T.read_triples(path)
    assert back == triples
    assert path.read_text().splitlines()[0] == "subject\tpredicate\tobject"


def test_filters_differential_random():
    """Randomized triples: every iterator filter agrees with the
    reference library's implementation (single-prefix and set forms,
    reference/collection forms)."""
    rng = random.Random(23)
    prefixes = ["p", "q", "r"]
    for _ in range(10):
        edges = [
            (
                f"{rng.choice(prefixes)}:{rng.randrange(5)}",
                f"{rng.choice(prefixes)}:{rng.randrange(5)}",
            )
            for _ in range(rng.randrange(2, 15))
        ]
        ours = _ours(*edges)
        theirs = [
            ref_triples.Triple(subject=s, predicate=EXACT, object=o) for s, o in edges
        ]

        def same(got, want):
            assert [t.as_str_triple() for t in got] == [
                (t.subject.curie, t.predicate.curie, t.object.curie) for t in want
            ]

        pset = {"p", "q"}
        same(
            T.keep_prefixes_both(ours, pset),
            ref_triples.keep_prefixes_both(theirs, pset),
        )
        for arg in ("p", pset):
            same(
                T.keep_prefixes_either(ours, arg),
                ref_triples.keep_prefixes_either(theirs, arg),
            )
            same(
                T.keep_subject_prefixes(ours, arg),
                ref_triples.keep_subject_prefixes(theirs, arg),
            )
            same(
                T.keep_object_prefixes(ours, arg),
                ref_triples.keep_object_prefixes(theirs, arg),
            )
            same(
                T.exclude_prefixes_both(ours, arg),
                ref_triples.exclude_prefixes_both(theirs, arg),
            )
            same(
                T.exclude_subject_prefixes(ours, arg),
                ref_triples.exclude_subject_prefixes(theirs, arg),
            )
            same(
                T.exclude_object_prefixes(ours, arg),
                ref_triples.exclude_object_prefixes(theirs, arg),
            )
        same(
            T.exclude_same_prefixes(ours),
            ref_triples.exclude_same_prefixes(theirs),
        )
        refs = [Reference.from_curie(edges[0][0]), Reference.from_curie(edges[0][1])]
        rrefs = [ref.Reference.from_curie(c.curie) for c in refs]
        same(
            T.keep_references_either(ours, refs),
            ref_triples.keep_references_either(theirs, rrefs),
        )
        same(
            T.exclude_references_both(ours, refs),
            ref_triples.exclude_references_both(theirs, rrefs),
        )


def test_triple_model_contract(tmp_path):
    """Reference tests/test_triples/test_models.py: immutability, CURIE
    stringification, gz+header round trips, sorting, and the PUBLISHED
    hash vectors (ts4nfdi mapping-sameness-identifier examples)."""
    import dataclasses
    import itertools as itt

    t1 = T.Triple.from_curies("a:1", "a:2", "a:3")
    t2 = T.Triple.from_curies("a:1", "a:2", "a:4")
    with pytest.raises(dataclasses.FrozenInstanceError):
        t1.subject = Reference.from_curie("b:1")
    assert t1.as_str_triple() == ("a:1", "a:2", "a:3")
    assert sorted([t2, t1]) == [t1, t2]

    for name, header in itt.product(
        ("t.tsv", "t.tsv.gz"), (None, ("a", "b", "c"))
    ):
        path = tmp_path / name
        T.write_triples([t1, t2], path, header=header)
        assert T.read_triples(path) == [t1, t2]

    assert T.encode_uri_triple(
        (
            "http://example.org/feline",
            "http://www.w3.org/2002/07/owl#sameAs",
            "http://example.com/cat",
        )
    ) == "95a088082ab2b2a68638aebbcc3fe3e0f229da75a8b5bdbb9f3f8cd5e1e4286e"
    assert T.encode_uri_triple(
        (
            "http://id.nlm.nih.gov/mesh/C000089",
            "http://www.w3.org/2004/02/skos/core#exactMatch",
            "http://purl.obolibrary.org/obo/CHEBI_28646",
        )
    ) == "36a1f9244ea7641a90987c82f33c25c0c13712ee8f48207b2a0825f8a4e4e26a"
