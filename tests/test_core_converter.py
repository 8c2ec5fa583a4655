"""Port of the reference's converter semantics tests.

Re-expresses the pure-semantics subsets of
/root/reference/tests/test_api.py (round-trip, strictness matrix, chain,
standardization, bimap), tests/test_struct.py (parsing edge cases), and
the triple-hash vector from tests/test_triples/test_models.py against
the driver-side core.
"""

import hashlib

import pytest

from curies_spark.core import (
    CompressionError,
    Converter,
    ExpansionError,
    NoCURIEDelimiterError,
    Record,
    ReferenceTuple,
    chain,
    upgrade_prefix_map,
)

CHEBI_URI_PREFIX = "http://purl.obolibrary.org/obo/CHEBI_"
GO_URI_PREFIX = "http://purl.obolibrary.org/obo/GO_"


@pytest.fixture
def converter() -> Converter:
    # fixture shape from reference tests/test_api.py:299-320
    return Converter.from_prefix_map(
        {
            "CHEBI": CHEBI_URI_PREFIX,
            "MONDO": "http://purl.obolibrary.org/obo/MONDO_",
            "GO": GO_URI_PREFIX,
            "OBO": "http://purl.obolibrary.org/obo/",
        }
    )


def test_roundtrip_and_strictness_matrix(converter: Converter) -> None:
    # reference tests/test_api.py:322-365 (_assert_convert)
    assert converter.get_prefixes() == {"CHEBI", "MONDO", "GO", "OBO"}
    assert "GO" in converter.prefix_map
    assert converter.has_prefix("GO")
    assert not converter.has_prefix("nope-nope-nope")
    assert "GO" in converter.bimap
    assert "GO" in converter.reverse_bimap.values()
    assert GO_URI_PREFIX in converter.reverse_prefix_map
    assert GO_URI_PREFIX in converter.trie
    assert "http://purl.obolibrary.org/obo/XXX_" not in converter.trie

    for curie, uri in [
        ("CHEBI:1", "http://purl.obolibrary.org/obo/CHEBI_1"),
        ("OBO:unnamespaced", "http://purl.obolibrary.org/obo/unnamespaced"),
    ]:
        assert converter.is_uri(uri)
        assert converter.is_curie(curie)
        assert not converter.is_curie(uri)
        assert not converter.is_uri(curie)
        assert converter.compress(uri) == curie
        assert converter.compress_strict(uri) == curie
        assert converter.expand(curie) == uri
        assert converter.expand_strict(curie) == uri

    missing_uri = "http://example.org/missing:00000"
    assert converter.compress(missing_uri) is None
    assert converter.compress(missing_uri, passthrough=True) == missing_uri
    with pytest.raises(CompressionError):
        converter.compress_strict(missing_uri)

    assert converter.expand("missing:00000") is None
    assert converter.expand("missing:00000", passthrough=True) == "missing:00000"
    with pytest.raises(ExpansionError):
        converter.expand_strict("missing:00000")

    assert converter.get_record("nope") is None
    assert converter.get_record("GO", strict=True).prefix == "GO"


def test_longest_prefix_match(converter: Converter) -> None:
    # reference api.py:1762-1769 documented guarantee
    assert converter.compress("http://purl.obolibrary.org/obo/GO_0032571") == "GO:0032571"
    assert converter.compress("http://purl.obolibrary.org/obo/go.owl") == "OBO:go.owl"
    assert converter.parse_uri("http://purl.obolibrary.org/obo/CHEBI_138488") == ReferenceTuple(
        "CHEBI", "138488"
    )
    # exact prefix hit → empty identifier
    assert converter.compress(CHEBI_URI_PREFIX) == "CHEBI:"


def test_predicates_edge_cases() -> None:
    # reference tests/test_api.py:299-306
    converter = Converter.from_extended_prefix_map(
        [
            {
                "prefix": "CHEBI",
                "prefix_synonyms": ["p"],
                "uri_prefix": CHEBI_URI_PREFIX,
                "uri_prefix_synonyms": ["u"],
            }
        ]
    )
    assert not converter.is_uri("")
    assert not converter.is_uri("nope")
    assert not converter.is_curie("")
    assert not converter.is_curie("nope")
    assert not converter.is_curie(":nope")
    assert not converter.is_curie("nope:")


def test_struct_parsing() -> None:
    # reference tests/test_struct.py:26-60
    assert ReferenceTuple.from_curie("a1:b2:c3") == ReferenceTuple("a1", "b2:c3")
    assert ReferenceTuple.from_curie(":something") == ReferenceTuple("", "something")
    assert ReferenceTuple.from_curie("p1:") == ReferenceTuple("p1", "")
    assert ReferenceTuple("mesh", "C000089").curie == "mesh:C000089"


def test_no_delimiter_raises(converter: Converter) -> None:
    # reference utils.py:22-27
    with pytest.raises(NoCURIEDelimiterError):
        converter.parse_curie("nodelimiter")


def test_synonym_standardization() -> None:
    # reference tests/test_api.py:494-554
    converter = Converter.from_extended_prefix_map(
        [
            {
                "prefix": "CHEBI",
                "prefix_synonyms": ["chebi"],
                "uri_prefix": CHEBI_URI_PREFIX,
                "uri_prefix_synonyms": [
                    "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=CHEBI:"
                ],
            }
        ]
    )
    assert converter.standardize_prefix("chebi") == "CHEBI"
    assert converter.standardize_prefix("CHEBI") == "CHEBI"
    assert converter.standardize_prefix("NOPE") is None
    assert converter.standardize_prefix("NOPE", passthrough=True) == "NOPE"

    assert converter.standardize_curie("chebi:138488") == "CHEBI:138488"
    assert converter.standardize_curie("CHEBI:138488") == "CHEBI:138488"
    assert converter.standardize_curie("NOPE:NOPE") is None
    assert converter.standardize_curie("NOPE:NOPE", passthrough=True) == "NOPE:NOPE"

    assert (
        converter.standardize_uri(
            "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=CHEBI:138488"
        )
        == "http://purl.obolibrary.org/obo/CHEBI_138488"
    )
    assert (
        converter.standardize_uri("http://purl.obolibrary.org/obo/CHEBI_138488")
        == "http://purl.obolibrary.org/obo/CHEBI_138488"
    )
    assert converter.standardize_uri("http://example.org/NOPE") is None
    assert (
        converter.standardize_uri("http://example.org/NOPE", passthrough=True)
        == "http://example.org/NOPE"
    )

    # expand via synonym prefix
    assert converter.expand("chebi:138488") == "http://purl.obolibrary.org/obo/CHEBI_138488"
    # compress via synonym URI prefix returns canonical CURIE
    assert (
        converter.compress("https://www.ebi.ac.uk/chebi/searchId.do?chebiId=CHEBI:138488")
        == "CHEBI:138488"
    )


def test_expand_all() -> None:
    # reference api.py:1995-2027 doctest
    converter = Converter.from_priority_prefix_map(
        {
            "CHEBI": [
                CHEBI_URI_PREFIX,
                "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=CHEBI:",
            ]
        }
    )
    assert list(converter.expand_all("CHEBI:138488")) == [
        "http://purl.obolibrary.org/obo/CHEBI_138488",
        "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=CHEBI:138488",
    ]
    assert converter.expand_all("NOPE:NOPE") is None


def test_compress_or_standardize_and_expand_or_standardize() -> None:
    # reference api.py:1637-1686, 1876-1925 doctests
    converter = Converter.from_extended_prefix_map(
        [
            {
                "prefix": "CHEBI",
                "prefix_synonyms": ["chebi"],
                "uri_prefix": CHEBI_URI_PREFIX,
                "uri_prefix_synonyms": ["https://identifiers.org/chebi:"],
            }
        ]
    )
    assert (
        converter.compress_or_standardize("http://purl.obolibrary.org/obo/CHEBI_138488")
        == "CHEBI:138488"
    )
    assert (
        converter.compress_or_standardize("https://identifiers.org/chebi:138488")
        == "CHEBI:138488"
    )
    assert converter.compress_or_standardize("CHEBI:138488") == "CHEBI:138488"
    assert converter.compress_or_standardize("chebi:138488") == "CHEBI:138488"
    assert converter.compress_or_standardize("missing:0000000") is None
    assert converter.compress_or_standardize("https://example.com/missing:0000000") is None

    assert (
        converter.expand_or_standardize("CHEBI:138488")
        == "http://purl.obolibrary.org/obo/CHEBI_138488"
    )
    assert (
        converter.expand_or_standardize("chebi:138488")
        == "http://purl.obolibrary.org/obo/CHEBI_138488"
    )
    assert (
        converter.expand_or_standardize("https://identifiers.org/chebi:138488")
        == "http://purl.obolibrary.org/obo/CHEBI_138488"
    )
    assert converter.expand_or_standardize("missing:0000000") is None
    assert converter.expand_or_standardize("https://example.com/missing:0000000") is None


def test_chain_priority() -> None:
    # reference tests/test_api.py:556-632
    with pytest.raises(ValueError):
        chain([])

    c1 = Converter.from_priority_prefix_map(
        {
            "CHEBI": [CHEBI_URI_PREFIX, "https://bioregistry.io/chebi:"],
            "MONDO": ["http://purl.obolibrary.org/obo/MONDO_"],
        }
    )
    c2 = Converter.from_priority_prefix_map(
        {
            "CHEBI": [
                "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=",
                "http://identifiers.org/chebi/",
                CHEBI_URI_PREFIX,
            ],
            "GO": [GO_URI_PREFIX],
            "OBO": ["http://purl.obolibrary.org/obo/"],
        }
    )
    converter = chain([c1, c2], case_sensitive=True)

    assert converter.get_record("CHEBI").prefix == "CHEBI"
    for url in [
        "http://purl.obolibrary.org/obo/CHEBI_138488",
        "https://bioregistry.io/chebi:138488",
        "http://identifiers.org/chebi/138488",
        "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=138488",
    ]:
        assert converter.compress(url) == "CHEBI:138488"

    assert converter.compress("http://purl.obolibrary.org/obo/GO_0000001") == "GO:0000001"
    # first converter's URI prefix stays canonical
    assert converter.get_record("CHEBI").uri_prefix == CHEBI_URI_PREFIX
    assert converter.prefix_map["CHEBI"] == CHEBI_URI_PREFIX
    assert converter.expand("CHEBI:138488") == "http://purl.obolibrary.org/obo/CHEBI_138488"
    # chain must not mutate its inputs
    assert c2.get_record("CHEBI").uri_prefix == "https://www.ebi.ac.uk/chebi/searchId.do?chebiId="


def test_chain_merge_synonyms() -> None:
    # reference tests/test_api.py:606-632 (test_combine_with_synonyms)
    r1 = Record(prefix="GO", uri_prefix=GO_URI_PREFIX)
    r2 = Record(prefix="go", prefix_synonyms=["GO"], uri_prefix="https://identifiers.org/go:")

    c1 = Converter([])
    c1.add_record(r1)
    c1.add_record(r2, merge=True)
    assert len(c1.records) == 1
    r = c1.records[0]
    assert r.prefix == "GO"
    assert set(r.prefix_synonyms) == {"go"}
    assert r.uri_prefix == GO_URI_PREFIX
    assert set(r.uri_prefix_synonyms) == {"https://identifiers.org/go:"}

    c3 = chain([Converter([r1]), Converter([r2])])
    assert len(c3.records) == 1
    assert "GO" in c3.prefix_map
    assert "go" in c3.prefix_map
    assert "go" not in c3.bimap
    assert "GO" in c3.bimap
    assert c3.has_prefix("go") and c3.has_prefix("GO") and not c3.has_prefix("nope")


def test_add_record_clash_raises() -> None:
    # reference tests/test_api.py:65-70
    converter = Converter.from_extended_prefix_map(
        [
            {
                "prefix": "CHEBI",
                "prefix_synonyms": ["p"],
                "uri_prefix": CHEBI_URI_PREFIX,
                "uri_prefix_synonyms": ["u"],
            }
        ]
    )
    converter.add_prefix("GO", GO_URI_PREFIX)
    with pytest.raises(ValueError):
        # matches two different records → always an error
        converter.add_record(Record(prefix="GO", uri_prefix=CHEBI_URI_PREFIX))


def test_duplicate_detection() -> None:
    # reference api.py:886-908
    from curies_spark.core import DuplicatePrefixes, DuplicateURIPrefixes

    with pytest.raises(DuplicateURIPrefixes):
        Converter(
            [
                Record(prefix="a", uri_prefix="https://example.com/"),
                Record(prefix="b", uri_prefix="https://example.com/"),
            ]
        )
    with pytest.raises(DuplicatePrefixes):
        Converter(
            [
                Record(prefix="a", uri_prefix="https://example.com/a/"),
                Record(prefix="a", uri_prefix="https://example.com/b/"),
            ]
        )
    # non-strict mode tolerates duplicates
    assert (
        len(
            Converter(
                [
                    Record(prefix="a", uri_prefix="https://example.com/"),
                    Record(prefix="b", uri_prefix="https://example.com/"),
                ],
                strict=False,
            ).records
        )
        == 2
    )


def test_from_reverse_prefix_map() -> None:
    # reference api.py:1321-1365 doctest: shortest URI prefix is canonical
    converter = Converter.from_reverse_prefix_map(
        {
            CHEBI_URI_PREFIX: "CHEBI",
            "https://www.ebi.ac.uk/chebi/searchId.do?chebiId=": "CHEBI",
            "http://purl.obolibrary.org/obo/MONDO_": "MONDO",
        }
    )
    assert converter.expand("CHEBI:138488") == "http://purl.obolibrary.org/obo/CHEBI_138488"
    assert converter.compress("http://purl.obolibrary.org/obo/CHEBI_138488") == "CHEBI:138488"
    assert (
        converter.compress("https://www.ebi.ac.uk/chebi/searchId.do?chebiId=138488")
        == "CHEBI:138488"
    )


def test_upgrade_prefix_map() -> None:
    # reference api.py:3211-3302 doctest
    pm = {"a": "https://example.com/a/", "b": "https://example.com/a/"}
    records = upgrade_prefix_map(pm)
    converter = Converter(records)
    assert converter.expand("a:1") == "https://example.com/a/1"
    assert converter.expand("b:1") == "https://example.com/a/1"
    assert converter.compress("https://example.com/a/1") == "a:1"


def test_from_jsonld() -> None:
    # reference api.py:1367-1404
    converter = Converter.from_jsonld(
        {
            "@context": {
                "": "https://example.com/empty/",
                "@base": "https://example.com/base/",
                "GO": GO_URI_PREFIX,
                "CHEBI": {"@prefix": True, "@id": CHEBI_URI_PREFIX},
                "ignored": {"@id": "https://example.com/noprefix/"},
            }
        }
    )
    assert converter.get_prefixes() == {"GO", "CHEBI"}


def test_subconverter() -> None:
    # reference tests/test_api.py:280-297
    converter = Converter.from_prefix_map(
        {"CHEBI": CHEBI_URI_PREFIX, "GO": GO_URI_PREFIX}
    )
    sub = converter.get_subconverter(["CHEBI"])
    assert len(sub.records) == 1
    assert sub.has_prefix("CHEBI")
    assert not sub.has_prefix("GO")


def test_expand_pair_and_format() -> None:
    converter = Converter.from_prefix_map({"CHEBI": CHEBI_URI_PREFIX})
    assert converter.expand_pair("CHEBI", "138488") == f"{CHEBI_URI_PREFIX}138488"
    assert converter.expand_pair("missing", "0") is None
    assert converter.format_curie("a", "b:c") == "a:b:c"


def test_hash_triple_vector() -> None:
    """Known SHA-256 vector from reference triples/hash_utils.py:40-45."""
    converter = Converter.from_prefix_map(
        {
            "mesh": "http://id.nlm.nih.gov/mesh/",
            "skos": "http://www.w3.org/2004/02/skos/core#",
            "CHEBI": CHEBI_URI_PREFIX,
        }
    )
    uris = [
        converter.expand_strict(c)
        for c in ("mesh:C000089", "skos:exactMatch", "CHEBI:28646")
    ]
    digest = hashlib.sha256(" ".join(uris).encode("utf-8")).hexdigest()
    assert digest == "36a1f9244ea7641a90987c82f33c25c0c13712ee8f48207b2a0825f8a4e4e26a"


def test_incremental_build() -> None:
    # reference tests/test_api.py:783-814
    converter = Converter([])
    converter.add_prefix("hgnc", "https://bioregistry.io/hgnc:")
    assert converter.expand("hgnc:1234") == "https://bioregistry.io/hgnc:1234"
    converter.add_prefix_synonym("hgnc", "HGNC")
    assert converter.standardize_prefix("HGNC") == "hgnc"
    converter.add_uri_prefix_synonym("hgnc", "https://example.com/hgnc/")
    assert converter.compress("https://example.com/hgnc/1234") == "hgnc:1234"
    with pytest.raises(ValueError):
        converter.add_prefix_synonym("hgnc", "hgnc")


def test_doctests() -> None:
    """Executable docstrings, the reference's xdoctest discipline
    (reference tox.ini:61-64)."""
    import doctest

    from curies_spark.core import converter as converter_module

    results = doctest.testmod(converter_module)
    assert results.failed == 0 and results.attempted >= 8


def test_shacl_round_trip(tmp_path) -> None:
    """write_shacl → from_shacl reproduces (prefix, uri_prefix, pattern),
    including turtle backslash escaping (reference api.py:1508-1545 +
    api.py:3104-3162 semantics)."""
    from curies_spark.core.record import Record
    from curies_spark.sources.loaders import from_shacl, write_shacl

    converter = Converter(
        [
            Record(prefix="CHEBI", uri_prefix=CHEBI_URI_PREFIX, pattern=r"^\d+$"),
            Record(prefix="GO", uri_prefix=GO_URI_PREFIX),
        ]
    )
    path = tmp_path / "prefixes.ttl"
    write_shacl(converter, path)

    back = from_shacl(path)
    assert [(r.prefix, r.uri_prefix, r.pattern) for r in back.records] == [
        ("CHEBI", CHEBI_URI_PREFIX, r"^\d+$"),
        ("GO", GO_URI_PREFIX, None),
    ]
    assert back.compress(f"{CHEBI_URI_PREFIX}42") == "CHEBI:42"

    # classmethod form + text form + synonym rows as extra records
    write_shacl(converter, path, include_synonyms=True)
    assert Converter.from_shacl(path.read_text()).get_prefixes() == {"CHEBI", "GO"}


def test_url_loader_with_injected_fetcher() -> None:
    """Remote-URL loader polymorphism without network: an injected
    fetcher serves the JSON-LD context (reference api.py:826-844 +
    from_jsonld_github api.py:1406-1438, incl. expanded-term handling)."""
    import json as _json

    from curies_spark.core.converter import set_url_fetcher

    served: dict[str, str] = {}

    def fake_fetcher(url: str) -> str:
        served["url"] = url
        return _json.dumps(
            {
                "@context": {
                    "GO": GO_URI_PREFIX,
                    "CHEBI": {"@prefix": True, "@id": CHEBI_URI_PREFIX},
                    "ignored": {"@id": "https://example.com/noprefix/"},
                }
            }
        )

    previous = set_url_fetcher(fake_fetcher)
    try:
        converter = Converter.from_jsonld_github(
            "biopragmatics", "bioregistry", "exports", "semweb.context.jsonld"
        )
        assert served["url"] == (
            "https://raw.githubusercontent.com/biopragmatics/bioregistry/"
            "main/exports/semweb.context.jsonld"
        )
        assert converter.get_prefixes() == {"GO", "CHEBI"}
    finally:
        set_url_fetcher(previous)

    # without a fetcher, remote inputs fail loudly instead of hanging
    with pytest.raises(ValueError, match="no URL fetcher"):
        Converter.from_jsonld("https://example.com/ctx.jsonld")
    with pytest.raises(ValueError, match="jsonld"):
        Converter.from_jsonld_github("o", "r", "not-a-context.txt")


def test_pd_and_file_helpers_match_reference_semantics(tmp_path):
    """Driver-scale pandas/file helpers (reference api.py:2445-2666):
    in-place conversion, ambiguous mode, target_column."""
    import pandas as pd

    c = Converter.from_prefix_map(
        {"CHEBI": "http://purl.obolibrary.org/obo/CHEBI_"}
    )
    df = pd.DataFrame({"u": ["http://purl.obolibrary.org/obo/CHEBI_1", "nope:x"]})
    c.pd_compress(df, "u", passthrough=True)
    assert list(df["u"]) == ["CHEBI:1", "nope:x"]
    c.pd_expand(df, "u", target_column="x", passthrough=True)
    assert list(df["x"]) == ["http://purl.obolibrary.org/obo/CHEBI_1", "nope:x"]
    df2 = pd.DataFrame({"p": ["CHEBI", "CHEBI"]})
    c.pd_standardize_prefix(df2, "p")
    assert list(df2["p"]) == ["CHEBI", "CHEBI"]

    path = tmp_path / "t.tsv"
    path.write_text("col\nhttp://purl.obolibrary.org/obo/CHEBI_5\n")
    c.file_compress(str(path), 0)
    assert path.read_text() == "col\nCHEBI:5\n"
    c.file_expand(str(path), 0)
    assert path.read_text() == "col\nhttp://purl.obolibrary.org/obo/CHEBI_5\n"


def test_driver_hash_triple_matches_reference_vector():
    """The reference's own doctest vector (api.py:2735-2766)."""
    import curies_spark as cs

    c = Converter.from_prefix_map(
        {
            "mesh": "http://id.nlm.nih.gov/mesh/",
            "skos": "http://www.w3.org/2004/02/skos/core#",
            "CHEBI": "http://purl.obolibrary.org/obo/CHEBI_",
        }
    )
    t = cs.Triple.from_curies("mesh:C000089", "skos:exactMatch", "CHEBI:28646")
    assert (
        c.hash_triple(t)
        == "36a1f9244ea7641a90987c82f33c25c0c13712ee8f48207b2a0825f8a4e4e26a"
    )
    assert c.hash_triple(t, negate=True).endswith("~")


def test_reference_tuple_to_pydantic_and_record_validators():
    import pytest as _pytest

    import curies_spark as cs

    rt = cs.ReferenceTuple("chebi", "1234")
    assert type(rt.to_pydantic()) is cs.Reference
    named = rt.to_pydantic(name="alcohol")
    assert type(named) is cs.NamedReference and named.name == "alcohol"
    with _pytest.raises(ValueError):
        rt.to_pydantic(name="")
    assert cs.Record.prefix_not_in_synonyms("a", {"prefix_synonyms": ["b"]}) == "a"
    with _pytest.raises(ValueError):
        cs.Record.prefix_not_in_synonyms("a", {"prefix_synonyms": ["a"]})
