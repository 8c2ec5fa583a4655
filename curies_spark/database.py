"""SQLAlchemy adapters: store :class:`Reference` columns as TEXT/JSON.

Semantics from reference database.py:213-375 — a Reference column binds
as its CURIE string (TEXT), a list column as a JSON array of CURIEs,
and a two-column (prefix, identifier) pair maps through an ORM
composite. The conversion logic is factored into plain functions
(tested without sqlalchemy); the TypeDecorator/Column/composite glue is
created lazily because sqlalchemy is not installed in this container —
importing any ``SA*`` name without sqlalchemy raises a clear
ImportError rather than failing at module import.

These adapters also document the engine's triple-schema choice: the
data-scale tables use single-string CURIE columns (the TEXT decorator's
wire format), with the (prefix, identifier) composite as the normalized
two-column alternative.
"""

from __future__ import annotations

from typing import Any

from .core.record import Reference

__all__ = [
    "SAReferenceListTypeDecorator",
    "SAReferenceTypeDecorator",
    "get_reference_list_sa_column",
    "get_reference_sa_column",
    "get_reference_sa_composite",
]


# ---------------------------------------------------------------------------
# conversion logic (reference database.py:229-271), sqlalchemy-free
# ---------------------------------------------------------------------------


def bind_reference(value: "str | Reference | None") -> "str | None":
    """Python value → database TEXT (a CURIE string)."""
    if value is None:
        return None
    if isinstance(value, str):
        return value
    return value.curie


def result_reference(value: "str | None") -> "Reference | None":
    """Database TEXT → :class:`Reference`."""
    if value is None:
        return None
    return Reference.from_curie(value)


def bind_reference_list(
    value: "str | Reference | list[Reference] | None",
) -> "list[str] | None":
    """Python value → database JSON (a list of CURIE strings)."""
    if value is None:
        return None
    if isinstance(value, str):
        return [value]
    if isinstance(value, Reference):
        return [value.curie]
    return [v.curie for v in value]


def result_reference_list(value: "list[str] | None") -> "list[Reference] | None":
    """Database JSON → list of :class:`Reference`."""
    if value is None:
        return None
    return [Reference.from_curie(v) for v in value]


# ---------------------------------------------------------------------------
# sqlalchemy glue, created on first attribute access
# ---------------------------------------------------------------------------

_SA_CACHE: "dict[str, Any]" = {}


def _build_sa_namespace() -> "dict[str, Any]":
    try:
        import sqlalchemy
        from sqlalchemy import JSON, TEXT, Column
        from sqlalchemy.orm import composite
        from sqlalchemy.types import TypeDecorator
    except ImportError as e:  # pragma: no cover - sqlalchemy absent here
        raise ImportError(
            "curies_spark.database requires sqlalchemy "
            "(pip install sqlalchemy) for the SA* adapters; the plain "
            "conversion functions (bind_reference etc.) work without it"
        ) from e

    class SAReferenceTypeDecorator(TypeDecorator):
        """Reference ↔ TEXT CURIE (reference database.py:251-271)."""

        impl = TEXT
        cache_ok = True

        def process_bind_param(self, value, dialect):
            return bind_reference(value)

        def process_result_value(self, value, dialect):
            return result_reference(value)

    class SAReferenceListTypeDecorator(TypeDecorator):
        """list[Reference] ↔ JSON CURIE array (reference database.py:222-248)."""

        impl = JSON
        cache_ok = True

        def process_bind_param(self, value, dialect):
            return bind_reference_list(value)

        def process_result_value(self, value, dialect):
            return result_reference_list(value)

    def get_reference_sa_column(*args: Any, **kwargs: Any):
        """Column typed as a single Reference (reference database.py:275-299)."""
        return Column(*args, SAReferenceTypeDecorator, **kwargs)

    def get_reference_list_sa_column(*args: Any, **kwargs: Any):
        """Column typed as a Reference list (reference database.py:302-325)."""
        return Column(*args, SAReferenceListTypeDecorator, **kwargs)

    class _ReferenceAdapter(Reference):
        """composite() needs a positional (prefix, identifier) ctor
        (reference database.py:328-333)."""

        def __init__(self, prefix: str, identifier: str) -> None:
            super().__init__(prefix=prefix, identifier=identifier)

    def get_reference_sa_composite(prefix_column, identifier_column, **kwargs: Any):
        """ORM composite over two-column (prefix, identifier) storage
        (reference database.py:336-375)."""
        return composite(_ReferenceAdapter, prefix_column, identifier_column, **kwargs)

    return {
        "SAReferenceTypeDecorator": SAReferenceTypeDecorator,
        "SAReferenceListTypeDecorator": SAReferenceListTypeDecorator,
        "get_reference_sa_column": get_reference_sa_column,
        "get_reference_list_sa_column": get_reference_list_sa_column,
        "get_reference_sa_composite": get_reference_sa_composite,
    }


def __getattr__(name: str) -> Any:
    if name in __all__:
        if not _SA_CACHE:
            _SA_CACHE.update(_build_sa_namespace())
        return _SA_CACHE[name]
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
