"""Validating Prefix/PrefixMap/Reference types — the reference's
tests/test_types.py cases ported (reference api.py:178-384 pydantic
context validation). These run only when pydantic is installed; the
core types themselves do not depend on it (Prefix stays a plain-str
subclass, PrefixMap falls back to dict)."""

from __future__ import annotations

import pickle

import pytest

pydantic = pytest.importorskip("pydantic")
from pydantic import BaseModel, ValidationError  # noqa: E402

from curies_spark import Converter, Prefix, PrefixMap, Reference  # noqa: E402


class WrappedPrefix(BaseModel):
    prefix: Prefix


class WrappedPrefixMap(BaseModel):
    prefix_map: PrefixMap


class WrappedCURIE(BaseModel):
    reference: Reference


@pytest.fixture(scope="module")
def converter() -> Converter:
    return Converter.from_extended_prefix_map(
        [
            {
                "prefix": "CHEBI",
                "prefix_synonyms": ["chebi"],
                "uri_prefix": "http://purl.obolibrary.org/obo/CHEBI_",
                "uri_prefix_synonyms": ["https://identifiers.org/chebi:"],
            }
        ]
    )


def test_prefix_is_a_string():
    p = Prefix("CHEBI")
    assert isinstance(p, str)
    assert p == "CHEBI"
    assert {"CHEBI": "x"}[p] == "x"          # hashes like the bare string
    assert pickle.loads(pickle.dumps(p)) == p  # broadcast shape


def test_prefix(converter):
    """Reference tests/test_types.py:45-80."""
    assert WrappedPrefix.model_validate({"prefix": "hello"}).prefix == "hello"
    assert WrappedPrefix.model_validate({"prefix": "CHEBI"}).prefix == "CHEBI"
    # canonical passes through; synonym standardizes — with the
    # converter given directly or under the "converter" key
    for ctx in (converter, {"converter": converter}):
        m = WrappedPrefix.model_validate({"prefix": "CHEBI"}, context=ctx)
        assert m.prefix == "CHEBI"
        m = WrappedPrefix.model_validate({"prefix": "chebi"}, context=ctx)
        assert m.prefix == "CHEBI"
        with pytest.raises(ValidationError):
            WrappedPrefix.model_validate({"prefix": "nope"}, context=ctx)


def test_prefix_root_model(converter):
    """Reference tests/test_types.py:82-111."""
    dd = {"": "http://example.org", "CHEBI": "http://purl.obolibrary.org/obo/CHEBI_"}
    assert PrefixMap.model_validate(dd).root == dd

    pm = PrefixMap.model_validate(
        {"chebi": "http://purl.obolibrary.org/obo/CHEBI_"}, context=converter
    )
    assert pm.root == {"CHEBI": "http://purl.obolibrary.org/obo/CHEBI_"}

    with pytest.raises(ValidationError):
        PrefixMap.model_validate(
            {"NOPE": "http://purl.obolibrary.org/obo/CHEBI_"}, context=converter
        )


def test_prefix_map_wrapped():
    """Reference tests/test_types.py:113-121."""
    wpm = WrappedPrefixMap.model_validate(
        {"prefix_map": {"CHEBI": "http://purl.obolibrary.org/obo/CHEBI_"}}
    )
    assert "CHEBI" in wpm.prefix_map.root


def test_curie(converter):
    """Reference tests/test_types.py:123-141."""
    wpm = WrappedCURIE.model_validate({"reference": "CHEBI:1234"})
    assert wpm.reference.prefix == "CHEBI"
    assert wpm.reference.identifier == "1234"
    assert wpm.reference.curie == "CHEBI:1234"

    with pytest.raises(ValidationError):
        WrappedCURIE.model_validate({"reference": "NOPENOPENOPE"})

    wpm = WrappedCURIE.model_validate({"reference": "CHEBI:1234"}, context=converter)
    assert wpm.reference.curie == "CHEBI:1234"
    # synonym prefixes standardize inside the reference too
    wpm = WrappedCURIE.model_validate({"reference": "chebi:1234"}, context=converter)
    assert wpm.reference.curie == "CHEBI:1234"

    with pytest.raises(ValidationError):
        WrappedCURIE.model_validate({"reference": "MONDO:1234"}, context=converter)


def test_reference_name_methods():
    """with_name/without_name/__composite_values__ parity (reference
    api.py:462-464, 484-490, 582-588)."""
    from curies_spark import NamableReference, NamedReference

    r = Reference("chebi", "1234")
    assert r.without_name() is r
    named = r.with_name("alcohol")
    assert isinstance(named, NamedReference)
    assert (named.prefix, named.identifier, named.name) == ("chebi", "1234", "alcohol")
    assert named.without_name() == r and type(named.without_name()) is Reference
    renamed = named.with_name("ethanol")
    assert type(renamed) is NamedReference and renamed.name == "ethanol"
    nam = NamableReference("go", "1", None)
    assert type(nam.with_name("x")) is NamableReference
    assert r.__composite_values__() == ("chebi", "1234")


def test_reference_pydantic_missing_fields():
    with pytest.raises(ValidationError):
        WrappedCURIE.model_validate({"reference": {"identifier": "x"}})


def test_from_curie_converter_context(converter):
    """The classmethod constructors accept ``converter=`` like the
    reference (api.py:493-521, 537-575, 604-653): the prefix is
    standardized strictly through it — synonyms canonicalize, unknown
    prefixes raise — outside pydantic model validation."""
    from curies_spark import NamableReference, NamedReference
    from curies_spark.core.converter import PrefixStandardizationError

    assert Reference.from_curie("chebi:1234", converter=converter).curie == (
        "CHEBI:1234"
    )
    assert Reference.from_curie("chebi:1234").curie == "chebi:1234"
    nam = NamableReference.from_curie("chebi:1234", "alcohol", converter=converter)
    assert (nam.prefix, nam.name) == ("CHEBI", "alcohol")
    named = NamedReference.from_curie("chebi:1234", "alcohol", converter=converter)
    assert (named.prefix, named.name) == ("CHEBI", "alcohol")
    with pytest.raises(PrefixStandardizationError):
        Reference.from_curie("MONDO:1234", converter=converter)


def test_from_reference_converter_context(converter):
    from curies_spark import NamableReference, NamedReference

    src = Reference("chebi", "1234")
    assert Reference.from_reference(src, converter=converter).prefix == "CHEBI"
    assert NamableReference.from_reference(src, converter=converter).prefix == "CHEBI"
    named_src = NamedReference("chebi", "1234", "alcohol")
    out = NamedReference.from_reference(named_src, converter=converter)
    assert (out.prefix, out.name) == ("CHEBI", "alcohol")
