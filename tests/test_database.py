"""SQLAlchemy adapter semantics (reference tests/test_database.py shape).

sqlalchemy is not installed in this container, so the conversion logic
is tested directly and the SA glue is tested for its lazy ImportError;
the full round-trip test runs wherever sqlalchemy is available.
"""

from __future__ import annotations

import pytest

from curies_spark import database
from curies_spark.core.record import Reference


def test_reference_text_round_trip():
    ref = Reference(prefix="CHEBI", identifier="16236")
    assert database.bind_reference(ref) == "CHEBI:16236"
    assert database.bind_reference("GO:1") == "GO:1"
    assert database.bind_reference(None) is None
    assert database.result_reference("CHEBI:16236") == ref
    assert database.result_reference(None) is None
    # multi-colon identifiers split on the FIRST delimiter
    assert database.result_reference("a:b:c") == Reference("a", "b:c")


def test_reference_list_json_round_trip():
    refs = [Reference("a", "1"), Reference("b", "2")]
    assert database.bind_reference_list(refs) == ["a:1", "b:2"]
    assert database.bind_reference_list(refs[0]) == ["a:1"]
    assert database.bind_reference_list("c:3") == ["c:3"]
    assert database.bind_reference_list(None) is None
    assert database.result_reference_list(["a:1", "b:2"]) == refs
    assert database.result_reference_list(None) is None


def test_sa_names_require_sqlalchemy():
    try:
        import sqlalchemy  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="sqlalchemy"):
            database.SAReferenceTypeDecorator  # noqa: B018
        return
    # sqlalchemy present: the full round-trip must work
    import sqlalchemy as sa

    engine = sa.create_engine("sqlite://")
    metadata = sa.MetaData()
    table = sa.Table(
        "t",
        metadata,
        sa.Column("id", sa.Integer, primary_key=True),
        sa.Column("ref", database.SAReferenceTypeDecorator),
        sa.Column("refs", database.SAReferenceListTypeDecorator),
    )
    metadata.create_all(engine)
    with engine.begin() as conn:
        conn.execute(
            table.insert().values(
                id=1,
                ref=Reference("CHEBI", "1"),
                refs=[Reference("a", "1"), Reference("b", "2")],
            )
        )
        row = conn.execute(sa.select(table)).one()
    assert row.ref == Reference("CHEBI", "1")
    assert row.refs == [Reference("a", "1"), Reference("b", "2")]


def test_unknown_attribute_raises_attribute_error():
    with pytest.raises(AttributeError):
        database.not_a_real_name  # noqa: B018