"""Top-level API parity: every in-scope reference export importable by name.

The point of the engine is that ``import curies as c`` call sites can
switch to ``import curies_spark as c``. This test imports the actual
reference package (reference src/curies/__init__.py) and asserts name
parity, with an explicit allowlist of declared-out-of-scope surface.
"""

from __future__ import annotations

import pytest

import curies_spark

from test_differential_reference import _load_reference

try:
    ref = _load_reference()
except Exception:  # pragma: no cover - reference unavailable
    ref = None

pytestmark = pytest.mark.skipif(ref is None, reason="reference library unavailable")

#: reference exports consciously NOT mirrored — none remain.
OUT_OF_SCOPE: set = set()


def test_every_reference_export_has_a_counterpart():
    missing = [
        name
        for name in ref.__all__
        if name not in OUT_OF_SCOPE and not hasattr(curies_spark, name)
    ]
    assert not missing, f"reference exports without a curies_spark counterpart: {missing}"


def test_mixins_process_and_standardize():
    conv = curies_spark.Converter.from_extended_prefix_map(
        [
            {
                "prefix": "CHEBI",
                "prefix_synonyms": ["chebi"],
                "uri_prefix": "http://purl.obolibrary.org/obo/CHEBI_",
            }
        ]
    )

    class Raw(curies_spark.SemanticallyProcessable):
        def __init__(self, uri):
            self.uri = uri

        def process(self, converter):
            return converter.parse_uri(self.uri, strict=True)

    class Holder(curies_spark.SemanticallyStandardizable):
        def __init__(self, reference):
            self.reference = reference

        def standardize(self, converter):
            return Holder(converter.standardize_reference(self.reference, strict=True))

    raws = [Raw("http://purl.obolibrary.org/obo/CHEBI_1")]
    assert curies_spark.process(None, conv) is None
    assert curies_spark.process(raws[0], conv).prefix == "CHEBI"
    assert [r.curie for r in curies_spark.process(raws, conv)] == ["CHEBI:1"]
    it = curies_spark.process(raws, conv, return_iterator=True)
    assert not isinstance(it, list) and next(iter(it)).curie == "CHEBI:1"

    holder = Holder(curies_spark.ReferenceTuple("chebi", "2"))
    assert curies_spark.standardize(None, conv) is None
    assert curies_spark.standardize(holder, conv).reference.prefix == "CHEBI"
    assert [
        h.reference.curie for h in curies_spark.standardize([holder], conv)
    ] == ["CHEBI:2"]
    assert curies_spark.process_many is curies_spark.process
    assert curies_spark.standardize_many is curies_spark.standardize


def test_triple_matches_reference_semantics():
    ours = curies_spark.Triple.from_curies("mesh:C000089", "skos:exactMatch", "CHEBI:28646")
    theirs = ref.Triple.from_curies("mesh:C000089", "skos:exactMatch", "CHEBI:28646")
    assert ours.as_str_triple() == theirs.as_str_triple()
    assert (ours.subject.prefix, ours.subject.identifier) == (
        theirs.subject.prefix,
        theirs.subject.identifier,
    )
    # ordering parity
    a = curies_spark.Triple.from_curies("a:1", "b:2", "c:3")
    ra = ref.Triple.from_curies("a:1", "b:2", "c:3")
    assert (a < ours) == (ra < theirs)


def test_from_rdflib_duck_typed_matches_reference_doc_example():
    class Manager:
        def namespaces(self):
            yield "hgnc", "https://bioregistry.io/hgnc:"

    converter = curies_spark.Converter.from_rdflib(Manager())
    # reference api.py:1459-1468 doctest values
    assert converter.expand("hgnc:1234") == "https://bioregistry.io/hgnc:1234"


def test_get_uris_from_rdf_duck_typed_and_nt_text():
    class URIRef(str):
        pass

    class Literal(str):
        pass

    class Graph:
        def triples(self, _pattern):
            yield URIRef("http://x.org/a/1"), URIRef("http://x.org/p"), Literal("txt")
            yield URIRef("http://x.org/a/2"), URIRef("http://x.org/p"), URIRef(
                "http://y.org/b#3"
            )

    assert curies_spark.get_uris_from_rdf(Graph()) == {
        "http://x.org/a/1",
        "http://x.org/a/2",
        "http://x.org/p",
        "http://y.org/b#3",
    }
    nt = (
        '<http://z.org/e/1> <http://z.org/p/x> "lit" .\n'
        "<http://z.org/e/2> <http://z.org/p/x> <http://z.org/e/3> ."
    )
    assert curies_spark.get_uris_from_rdf(nt) == {
        "http://z.org/e/1",
        "http://z.org/p/x",
        "http://z.org/e/2",
        "http://z.org/e/3",
    }


def test_discover_from_rdf_assigns_dummy_prefixes():
    class URIRef(str):
        pass

    class Graph:
        def triples(self, _pattern):
            for i in range(3):
                yield (
                    URIRef(f"http://x.org/entity/{i}"),
                    URIRef("http://x.org/p/rel"),
                    URIRef(f"http://x.org/entity/{i + 10}"),
                )

    converter = curies_spark.discover_from_rdf(Graph(), cutoff=2)
    assert any(r.uri_prefix == "http://x.org/entity/" for r in converter.records)


def test_preset_getters_use_injected_fetcher():
    seen = []

    def fake_fetcher(url: str) -> str:
        seen.append(url)
        if url.endswith(".jsonld"):
            return '{"@context": {"GO": "http://purl.obolibrary.org/obo/GO_"}}'
        return '[{"prefix": "GO", "uri_prefix": "http://purl.obolibrary.org/obo/GO_"}]'

    previous = curies_spark.set_url_fetcher(fake_fetcher)
    try:
        assert curies_spark.get_obo_converter().expand("GO:1") == (
            "http://purl.obolibrary.org/obo/GO_1"
        )
        assert curies_spark.get_go_converter().has_prefix("GO")
        assert curies_spark.get_monarch_converter().has_prefix("GO")
        assert curies_spark.get_bioregistry_converter().has_prefix("GO")
        assert len(seen) == 4 and seen[0].endswith("obo_context.jsonld")
    finally:
        curies_spark.set_url_fetcher(previous)

    with pytest.raises(ValueError, match="fetcher"):
        curies_spark.get_obo_converter()


def test_bind_rdflib_binds_all_records():
    class Graph:
        def __init__(self):
            self.bound = []

        def bind(self, prefix, namespace):
            self.bound.append((prefix, str(namespace)))

    converter = curies_spark.Converter.from_extended_prefix_map(
        [
            {
                "prefix": "CHEBI",
                "prefix_synonyms": ["chebi"],
                "uri_prefix": "http://purl.obolibrary.org/obo/CHEBI_",
            }
        ]
    )
    g = Graph()
    converter.bind_rdflib(g)
    assert g.bound == [("CHEBI", "http://purl.obolibrary.org/obo/CHEBI_")]
    g2 = Graph()
    converter.bind_rdflib(g2, synonyms=True)
    assert ("chebi", "http://purl.obolibrary.org/obo/CHEBI_") in g2.bound


def _ref_all(path):
    """Parse a reference module's __all__ — loud failure when absent so
    a future reference layout change can't silently skip a surface."""
    import ast

    tree = ast.parse(path.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", "") == "__all__" for t in node.targets
        ):
            return ast.literal_eval(node.value)
    raise AssertionError(f"no __all__ found in {path}")


def test_submodule_import_parity():
    """Every reference submodule's ``__all__`` is importable from the
    SAME path under curies_spark (``from curies.w3c import …`` ports as
    ``from curies_spark.w3c import …``). ``TrieNode`` is a documented
    deviation (the trie is a node-free length-bucketed map, see
    curies_spark/api.py); sqlalchemy-backed database names are lazy."""
    import ast
    import importlib
    from pathlib import Path

    skipped = {"TrieNode"}
    for ref_mod in sorted(Path("/root/reference/src/curies").glob("*.py")):
        name = ref_mod.stem
        if name.startswith("_") or name in ("cli", "database"):
            continue  # CLI/database (lazy sqlalchemy) have dedicated tests
        try:
            ref_all = _ref_all(ref_mod)
        except AssertionError:
            continue  # module publishes no __all__ surface
        ours = importlib.import_module(f"curies_spark.{name}")
        missing = [
            n
            for n in ref_all
            if n not in skipped and not n.startswith("_") and not hasattr(ours, n)
        ]
        assert not missing, f"curies_spark.{name} missing {missing}"

    # the triples package surface (directory module in the reference)
    import curies_spark.triples as t

    ref_all = _ref_all(Path("/root/reference/src/curies/triples/__init__.py"))
    missing = [n for n in ref_all if not hasattr(t, n)]
    assert not missing, f"curies_spark.triples missing {missing}"

    # the mapping_service package surface
    import curies_spark.mapping_service as ms

    ref_all = _ref_all(
        Path("/root/reference/src/curies/mapping_service/__init__.py")
    )
    missing = [n for n in ref_all if not hasattr(ms, n)]
    assert not missing, f"curies_spark.mapping_service missing {missing}"
