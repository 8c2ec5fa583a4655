"""Ports of reference tests: w3c golden files, reconciliation, preprocessing, discovery."""

import os

import pytest

from curies_spark.core import (
    Converter,
    PreprocessingBlocklists,
    PreprocessingConverter,
    PreprocessingRewrites,
    PreprocessingRules,
    Record,
    ReferenceTuple,
    discover,
    is_w3c_curie,
    is_w3c_prefix,
    remap_curie_prefixes,
    remap_uri_prefixes,
    rewire,
)
from curies_spark.core.preprocessing import BlocklistError, PostprocessingRewrites
from curies_spark.core.reconciliation import (
    CycleDetected,
    DuplicateKeys,
    DuplicateValues,
    InconsistentMapping,
    TransitiveError,
    _order_curie_remapping,
)

P = "https://example.org"
REF_RESOURCES = "/root/reference/tests/resources"


# ---------------------------------------------------------------------------
# W3C golden-file corpus (reference tests/test_w3c.py:20-43)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.isdir(REF_RESOURCES), reason="reference corpus unavailable")
def test_w3c_golden_files() -> None:
    def lines(name):
        with open(os.path.join(REF_RESOURCES, name)) as f:
            return [line.strip() for line in f if line.strip() and not line.startswith("#")]

    for value in lines("valid_curies.txt"):
        assert is_w3c_curie(value), f"should be valid CURIE: {value!r}"
    for value in lines("invalid_curies.txt"):
        assert not is_w3c_curie(value), f"should be invalid CURIE: {value!r}"
    for value in lines("valid_prefixes.txt"):
        assert is_w3c_prefix(value), f"should be valid prefix: {value!r}"
    for value in lines("invalid_prefixes.txt"):
        assert not is_w3c_prefix(value), f"should be invalid prefix: {value!r}"


def test_w3c_doctests() -> None:
    assert is_w3c_prefix("GO")
    assert is_w3c_prefix("_")
    assert not is_w3c_prefix("3dmet")
    assert not is_w3c_prefix("GO:")
    assert is_w3c_curie(":test")
    assert is_w3c_curie("_:test")
    assert not is_w3c_curie("4cdn:test")
    assert not is_w3c_curie("")
    assert not is_w3c_curie("[bracketed]")


# ---------------------------------------------------------------------------
# Reconciliation (reference tests/test_reconciliation.py)
# ---------------------------------------------------------------------------


def _abc() -> Converter:
    return Converter(
        [
            Record(prefix="a", uri_prefix=f"{P}/a/"),
            Record(prefix="b", uri_prefix=f"{P}/b/"),
            Record(prefix="c", uri_prefix=f"{P}/c/"),
        ]
    )


def test_remapping_ordering() -> None:
    converter = _abc()
    assert _order_curie_remapping(converter, {"a": "a1", "b": "b1"}) == [("a", "a1"), ("b", "b1")]
    assert _order_curie_remapping(converter, {"c": "a", "b": "c"}) == [("c", "a"), ("b", "c")]
    assert _order_curie_remapping(converter, {"b": "c", "c": "a"}) == [("c", "a"), ("b", "c")]


def test_remapping_validation_errors() -> None:
    converter = _abc()
    with pytest.raises(DuplicateValues):
        _order_curie_remapping(converter, {"b": "c", "a": "c"})

    converter2 = Converter(
        [
            Record(prefix="a", prefix_synonyms=["a1"], uri_prefix=f"{P}/a/"),
            Record(prefix="b", uri_prefix=f"{P}/b/"),
            Record(prefix="c", uri_prefix=f"{P}/c/"),
        ]
    )
    with pytest.raises(DuplicateKeys):
        _order_curie_remapping(converter2, {"a": "c", "a1": "b"})
    with pytest.raises(InconsistentMapping):
        _order_curie_remapping(converter2, {"a": "c", "b": "a1"})

    with pytest.raises(CycleDetected):
        remap_curie_prefixes(converter, {"b": "c", "c": "b"})
    with pytest.raises(CycleDetected):
        _order_curie_remapping(converter, {"a": "b", "b": "c", "c": "a"})


def test_remap_curie_simple() -> None:
    # reference TestCURIERemapping.test_simple: old prefix becomes a synonym
    converter = Converter([Record(prefix="a", prefix_synonyms=["x"], uri_prefix=f"{P}/a/")])
    converter = remap_curie_prefixes(converter, {"a": "a1"})
    assert len(converter.records) == 1
    record = converter.records[0]
    assert record.prefix == "a1"
    assert sorted(record.prefix_synonyms) == ["a", "x"]

    # missing key is a no-op
    converter2 = Converter([Record(prefix="a", prefix_synonyms=["x"], uri_prefix=f"{P}/a/")])
    result = remap_curie_prefixes(converter2, {"b": "c"})
    assert result.records == converter2.records


def test_remap_curie_swap() -> None:
    # transitive swap case: {"a": "b", "b": "c"} applies bottom-up
    converter = Converter(
        [
            Record(prefix="a", uri_prefix=f"{P}/a/"),
            Record(prefix="b", uri_prefix=f"{P}/b/"),
        ]
    )
    converter = remap_curie_prefixes(converter, {"a": "b", "b": "c"})
    assert converter.bimap == {"b": f"{P}/a/", "c": f"{P}/b/"}


def test_remap_uri_prefixes() -> None:
    converter = Converter([Record(prefix="a", uri_prefix=f"{P}/a/")])
    converter = remap_uri_prefixes(converter, {f"{P}/a/": f"{P}/A/"})
    record = converter.records[0]
    assert record.uri_prefix == f"{P}/A/"
    assert record.uri_prefix_synonyms == [f"{P}/a/"]
    assert converter.compress(f"{P}/a/1") == "a:1"
    assert converter.expand("a:1") == f"{P}/A/1"

    with pytest.raises(TransitiveError):
        remap_uri_prefixes(converter, {f"{P}/x/": f"{P}/y/", f"{P}/y/": f"{P}/z/"})


def test_remap_uri_clash_skipped() -> None:
    converter = Converter(
        [
            Record(prefix="a", uri_prefix=f"{P}/a/"),
            Record(prefix="b", uri_prefix=f"{P}/b/"),
        ]
    )
    result = remap_uri_prefixes(converter, {f"{P}/a/": f"{P}/b/"})
    assert result.bimap == {"a": f"{P}/a/", "b": f"{P}/b/"}  # unchanged


def test_rewire() -> None:
    converter = Converter(
        [
            Record(prefix="a", uri_prefix=f"{P}/a/"),
            Record(prefix="b", uri_prefix=f"{P}/b/"),
        ]
    )
    result = rewire(converter, {"a": f"{P}/A/"})
    record = result.get_record("a")
    assert record.uri_prefix == f"{P}/A/"
    assert record.uri_prefix_synonyms == [f"{P}/a/"]
    # clash: rewiring a onto b's URI prefix is skipped
    result2 = rewire(converter, {"a": f"{P}/b/"})
    assert result2.get_record("a").uri_prefix == f"{P}/a/"


# ---------------------------------------------------------------------------
# Preprocessing (reference tests/test_preprocessing.py:28-219)
# ---------------------------------------------------------------------------


@pytest.fixture
def preprocessing_converter() -> PreprocessingConverter:
    rules = PreprocessingRules(
        rewrites=PreprocessingRewrites(
            full={
                "is_a": "rdf:type",
                "http://creativecommons.org/licenses/by/3.0/": "spdx:CC-BY-3.0",
            },
            prefix={"OMIM:PS": "omim.ps:", "omim:PS": "omim.ps:"},
            resource_prefix={"clo": {"j": "NCIT:"}},
            resource_full={"clo": {"nopeforever": "NCIT:5678"}},
        ),
        blocklists=PreprocessingBlocklists(
            full=["rdf:NOPE"],
            resource_prefix={"chebi": ["pubmed:"]},
            resource_full={"chebi": ["omim:1356"]},
        ),
        postprocessing=PostprocessingRewrites(suffix={"emedicine": ["-overview"]}),
    )
    inner = Converter.from_prefix_map(
        {
            "GO": "http://purl.obolibrary.org/obo/GO_",
            "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
            "spdx": "https://spdx.org/licenses/",
            "omim.ps": "https://omim.org/phenotypicSeries/",
            "NCIT": "http://purl.obolibrary.org/obo/NCIT_",
            "pubmed": "https://pubmed.ncbi.nlm.nih.gov/",
            "omim": "https://omim.org/entry/",
            "emedicine": "https://emedicine.medscape.com/article/",
        }
    )
    return PreprocessingConverter.from_converter(inner, rules)


def test_preprocessing_full_rewrite(preprocessing_converter: PreprocessingConverter) -> None:
    assert preprocessing_converter.parse("is_a") == ReferenceTuple("rdf", "type")
    assert preprocessing_converter.parse(
        "http://creativecommons.org/licenses/by/3.0/"
    ) == ReferenceTuple("spdx", "CC-BY-3.0")
    # per-resource full rewrite
    assert preprocessing_converter.parse_curie(
        "nopeforever", context="clo"
    ) == ReferenceTuple("NCIT", "5678")


def test_preprocessing_prefix_rewrite(preprocessing_converter: PreprocessingConverter) -> None:
    assert preprocessing_converter.parse_curie("OMIM:PS214100") == ReferenceTuple(
        "omim.ps", "214100"
    )
    # per-resource prefix rewrite
    assert preprocessing_converter.parse_curie("j1234", context="clo") == ReferenceTuple(
        "NCIT", "1234"
    )


def test_preprocessing_blocklist(preprocessing_converter: PreprocessingConverter) -> None:
    with pytest.raises(BlocklistError):
        preprocessing_converter.parse_curie("rdf:NOPE")
    assert preprocessing_converter.parse_curie("rdf:NOPE", block_action="pass") is None
    # context-scoped blocks
    with pytest.raises(BlocklistError):
        preprocessing_converter.parse_curie("pubmed:123", context="chebi")
    assert (
        preprocessing_converter.parse_curie("pubmed:123", context="chebi", block_action="pass")
        is None
    )
    # outside the context, fine
    assert preprocessing_converter.parse_curie("pubmed:123") == ReferenceTuple("pubmed", "123")
    with pytest.raises(BlocklistError):
        preprocessing_converter.parse_curie("omim:1356", context="chebi")
    assert preprocessing_converter.parse_curie("omim:1356") == ReferenceTuple("omim", "1356")


def test_preprocessing_postprocess_suffix(
    preprocessing_converter: PreprocessingConverter,
) -> None:
    assert preprocessing_converter.parse_curie("emedicine:123-overview") == ReferenceTuple(
        "emedicine", "123"
    )
    assert preprocessing_converter.parse_uri(
        "https://emedicine.medscape.com/article/123-overview"
    ) == ReferenceTuple("emedicine", "123")


def test_preprocessing_plain_parse(preprocessing_converter: PreprocessingConverter) -> None:
    assert preprocessing_converter.parse_uri(
        "http://purl.obolibrary.org/obo/GO_1234567"
    ) == ReferenceTuple("GO", "1234567")
    assert preprocessing_converter.parse("GO:1234567") == ReferenceTuple("GO", "1234567")


# ---------------------------------------------------------------------------
# Discovery (reference tests/test_discovery.py:28-82)
# ---------------------------------------------------------------------------


def test_discover_basic() -> None:
    uris = [f"http://ran.dom/{i:03}" for i in range(30)]
    converter = discover(uris)
    assert [r.to_dict() for r in converter.records] == [
        {"prefix": "ns1", "uri_prefix": "http://ran.dom/"}
    ]
    assert converter.compress("http://ran.dom/002") == "ns1:002"


def test_discover_delimiter_priority_and_cutoff() -> None:
    uris = [
        # '#' beats '/' and '_'
        *[f"http://a.org/path#x{i}" for i in range(4)],
        # '/' delimiter
        *[f"http://b.org/item/{i}" for i in range(3)],
        # '_' delimiter
        *[f"http://c.org/obo/GO_{i:07}" for i in range(2)],
        # non-alnum LUID is skipped for '#' and falls to '/' split of the
        # whole string; 'b ad' contains a space so no prefix at all
        "http://d.org/path#b ad",
    ]
    converter = discover(uris)
    uri_prefixes = {r.uri_prefix for r in converter.records}
    assert "http://a.org/path#" in uri_prefixes
    assert "http://b.org/item/" in uri_prefixes
    assert "http://c.org/obo/GO_" in uri_prefixes

    converter2 = discover(uris, cutoff=3)
    uri_prefixes2 = {r.uri_prefix for r in converter2.records}
    assert uri_prefixes2 == {"http://a.org/path#", "http://b.org/item/"}

    # ns numbering follows the lexicographic sort of URI prefixes
    assert [r.prefix for r in converter2.records] == ["ns1", "ns2"]
    assert converter2.records[0].uri_prefix == "http://a.org/path#"


def test_discover_with_existing_converter() -> None:
    known = Converter.from_prefix_map({"GO": "http://c.org/obo/GO_"})
    uris = [
        *[f"http://c.org/obo/GO_{i:07}" for i in range(5)],
        *[f"http://new.org/{i}" for i in range(5)],
    ]
    converter = discover(uris, converter=known)
    assert {r.uri_prefix for r in converter.records} == {"http://new.org/"}


# ---------------------------------------------------------------------------
# Vocabulary constants (reference vocabulary.py:15-384)
# ---------------------------------------------------------------------------


def test_vocabulary_constants() -> None:
    from curies_spark.core import vocabulary as v

    assert v.exact_match.curie == "skos:exactMatch"
    assert v.owl_same_as.curie == "owl:sameAs"
    assert v.same_as is v.owl_same_as  # reference name + engine alias
    assert v.rdf_type.prefix == "rdf" and v.rdf_type.identifier == "type"
    assert v.exact_match in v.mapping_predicates
    assert len(v.matching_processes) == 12
    assert len(v.match_typedefs) == 15
    assert v.inversions[v.part_of] == v.has_part
    # NamedReference is hashable + ordered like Reference
    assert len({v.exact_match, v.close_match, v.exact_match}) == 2
    assert sorted([v.close_match, v.broad_match])[0].identifier == "broadMatch"


# ---------------------------------------------------------------------------
# prefix-map writer round trips (reference tests/test_io.py)
# ---------------------------------------------------------------------------


def _io_converter():
    from curies_spark import Converter

    return Converter.from_extended_prefix_map(
        [
            {
                "prefix": "CHEBI",
                "prefix_synonyms": ["p"],
                "uri_prefix": "http://purl.obolibrary.org/obo/CHEBI_",
                "uri_prefix_synonyms": ["u"],
                "pattern": "^\\d{7}$",
            }
        ]
    )


def test_write_epm_round_trip(tmp_path):
    """Reference tests/test_io.py:40-47: records AND patterns survive."""
    import curies_spark as cs

    c = _io_converter()
    path = tmp_path / "epm.json"
    cs.write_extended_prefix_map(c, path)
    nc = cs.load_extended_prefix_map(path)
    assert nc.records == c.records
    assert nc.pattern_map == {"CHEBI": "^\\d{7}$"}


def test_write_jsonld_round_trip_and_synonyms(tmp_path):
    """Reference tests/test_io.py:49-73: the bimap round-trips (prefix
    synonyms do NOT survive), include_synonyms adds synonym keys, and
    the expanded form emits @prefix terms."""
    import json as _json

    import curies_spark as cs

    c = _io_converter()
    uri = "http://purl.obolibrary.org/obo/CHEBI_"
    path = tmp_path / "ctx.json"
    cs.write_jsonld_context(c, path)
    nc = cs.load_jsonld_context(path)
    assert nc.prefix_map == {"CHEBI": uri}
    assert nc.reverse_prefix_map == {uri: "CHEBI"}
    assert nc.bimap == {"CHEBI": uri}

    cs.write_jsonld_context(c, path, include_synonyms=True)
    data = _json.loads(path.read_text())["@context"]
    assert set(data) == {"CHEBI", "p"}

    cs.write_jsonld_context(c, path, expand=True)
    data = _json.loads(path.read_text())["@context"]
    assert data["CHEBI"] == {"@prefix": True, "@id": uri}


def test_write_tsv(tmp_path):
    import curies_spark as cs

    c = _io_converter()
    path = tmp_path / "pm.tsv"
    cs.write_tsv(c, path)
    assert path.read_text().splitlines() == [
        "prefix\tbase",
        "CHEBI\thttp://purl.obolibrary.org/obo/CHEBI_",
    ]
