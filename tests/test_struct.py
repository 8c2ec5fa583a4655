"""Reference tests/test_struct.py ported: the reference-data-model
contract (strict from_curie, pair-only equality, name carrying on
from_reference, Records validation)."""

from __future__ import annotations

import pytest

import curies_spark as cs
from curies_spark import (
    Converter,
    NamableReference,
    NamedReference,
    Records,
    Reference,
    ReferenceTuple,
)
from curies_spark.utils import NoCURIEDelimiterError

CHEBI_URI_PREFIX = "http://purl.obolibrary.org/obo/CHEBI_"


def test_not_curie():
    with pytest.raises(NoCURIEDelimiterError, match="does not appear to be a CURIE"):
        Reference.from_curie("not a curie")
    with pytest.raises(NoCURIEDelimiterError):
        ReferenceTuple.from_curie("nope")
    with pytest.raises(NoCURIEDelimiterError):
        NamedReference.from_curie("nope", "name")


def test_default_prefix_and_identifier():
    ref = Reference.from_curie(":something")
    assert (ref.prefix, ref.identifier) == ("", "something")
    ref = Reference.from_curie("p1:")
    assert (ref.prefix, ref.identifier) == ("p1", "")
    ref = Reference.from_curie("a1:b2:c3")
    assert (ref.prefix, ref.identifier) == ("a1", "b2:c3")


def test_records():
    pytest.importorskip("pydantic")
    records = Records.model_validate(
        [{"prefix": "chebi", "uri_prefix": CHEBI_URI_PREFIX}]
    )
    converter = Converter(records=records)
    assert converter.get_prefixes() == {"chebi"}


def test_sort_and_set_membership():
    start = [Reference.from_curie(c) for c in ("def:1234", "abc:1234", "abc:1235")]
    assert sorted(start) == [
        Reference.from_curie(c) for c in ("abc:1234", "abc:1235", "def:1234")
    ]
    collection = set(start)
    assert Reference.from_curie("def:1234") in collection
    assert Reference.from_curie("xyz:1234") not in collection
    assert Reference.from_curie(":1234") not in collection
    assert Reference.from_curie("abc:") not in collection


def test_named_set_membership():
    references = {
        NamedReference.from_curie("a:1", "name1"),
        NamedReference.from_curie("a:2", "name2"),
    }
    assert Reference.from_curie("a:1") in references
    assert NamableReference.from_curie("a:1") in references
    assert NamedReference.from_curie("a:1", "name1") in references
    assert NamableReference.from_curie("a:1", "name1") in references
    # pair-only equality: a different name still matches
    assert NamedReference.from_curie("a:1", "name2") in references

    references_2 = {Reference.from_curie("a:1"), Reference.from_curie("a:2")}
    assert NamableReference.from_curie("a:1", "name1") in references_2
    assert NamedReference.from_curie("a:1", "name1") in references_2


def test_reference_constructor_and_from_reference():
    r1 = Reference("a", "1")
    r2 = NamableReference("a", "2")
    r3 = NamableReference("a", "3", "item 3")
    r4 = NamedReference("a", "4", "item 4")

    for r in (r1, r2, r3, r4):
        plain = Reference.from_reference(r)
        assert type(plain) is Reference
        assert plain == Reference(r.prefix, r.identifier)

    assert NamableReference.from_reference(r1) == NamableReference("a", "1", None)
    assert NamableReference.from_reference(r1).name is None
    assert NamableReference.from_reference(r3).name == "item 3"
    assert NamableReference.from_reference(r4).name == "item 4"

    with pytest.raises(TypeError):
        NamedReference.from_reference(r1)  # no name attribute at all
    with pytest.raises(ValueError):
        NamedReference.from_reference(r2)  # name=None fails validation
    assert NamedReference.from_reference(r3).name == "item 3"
    assert NamedReference.from_reference(r4).name == "item 4"

    with pytest.raises(ValueError):
        NamedReference("a", "5", None)


def test_without_name_types():
    c1 = Reference.from_curie("a:1")
    c2 = NamableReference.from_curie("a:1")
    c3 = NamableReference.from_curie("a:1", name="test")
    c4 = NamedReference.from_curie("a:1", name="test")
    for reference in (c1, c2, c3, c4):
        new = reference.without_name()
        assert isinstance(new, Reference)
        assert not isinstance(new, NamableReference)


def test_with_name_round_trip():
    r1 = cs.Reference.from_curie("chebi:1234")
    r2 = r1.with_name("test")
    assert isinstance(r2, NamedReference)
    r3 = r2.without_name()
    assert isinstance(r3, Reference) and not isinstance(r3, NamableReference)


def test_named_reference_name_required():
    """The reference's name field is required: omitted or None fails;
    an explicit empty string is allowed (it is a valid str there)."""
    with pytest.raises(ValueError):
        NamedReference("a", "1")
    with pytest.raises(ValueError):
        NamedReference("a", "1", None)
    assert NamedReference("a", "1", "").name == ""
    with pytest.raises(TypeError):
        NamedReference.from_curie("a:1")  # name is a required argument
