"""Core data model: references and extended-prefix-map records.

Semantics re-expressed from the reference library ``curies``
(/root/reference/src/curies/api.py:85-175 ``ReferenceTuple``,
api.py:659-737 ``Record``/``Records``) as plain, picklable Python
structures suitable for ``SparkContext.broadcast``.

Everything here is driver-scale (an extended prefix map is KBs-MBs);
data-scale equivalents live in :mod:`curies_spark.functions`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable, NamedTuple

__all__ = [
    "NamableReference",
    "NamedReference",
    "Prefix",
    "PrefixMap",
    "Record",
    "Records",
    "Reference",
    "ReferenceTuple",
    "Triple",
    "records_from_dicts",
    "records_to_dicts",
]

def _split_strict(curie: str, sep: str) -> "tuple[str, str]":
    """First-delimiter split that REQUIRES the delimiter (reference
    utils.py:22-27 — ``Reference.from_curie("not a curie")`` is an
    error, not a ``("not a curie", "")`` pair). Delegates to the ONE
    ``_split`` definition in the converter module, imported lazily to
    avoid the record ↔ converter module cycle."""
    from .converter import _split

    return _split(curie, sep=sep)


def _converter_from_context(context: Any) -> Any:
    """Resolve a converter from a pydantic validation context: either
    the converter itself or a ``{"converter": ...}`` dict (reference
    api.py:3305-3310)."""
    if context is None:
        return None
    if isinstance(context, dict):
        return context.get("converter")
    return context if hasattr(context, "standardize_prefix") else None


def _standardize_prefix(prefix: str, converter: Any) -> str:
    """Converter-context prefix standardization for the ``from_curie`` /
    ``from_reference`` classmethods — the reference routes these through
    ``model_validate(..., context=converter)`` (api.py:493-521, 537-575,
    604-653), which canonicalizes synonyms and raises on unknown
    prefixes; without a converter the prefix passes through unchanged."""
    if converter is None:
        return prefix
    return converter.standardize_prefix(prefix, strict=True)


class Prefix(str):
    """A CURIE prefix: a plain ``str`` subclass (picklable, broadcast-
    safe, usable anywhere a string is) that carries the reference's
    pydantic validation hook (api.py:178-336): when validated inside a
    pydantic model with ``context=converter`` (or
    ``context={"converter": converter}``), the value is standardized
    via ``converter.standardize_prefix(..., strict=True)`` — synonyms
    canonicalize, unknown prefixes raise a ``ValidationError``. Without
    a context (or outside pydantic entirely — pydantic is NOT a core
    dependency) it behaves as the bare string.
    """

    __slots__ = ()

    @classmethod
    def __get_pydantic_core_schema__(cls, source: Any, handler: Any) -> Any:
        # only ever invoked by pydantic itself, so the import is safe here
        from pydantic_core import core_schema

        return core_schema.with_info_after_validator_function(
            cls._validate, core_schema.str_schema(strict=False)
        )

    @classmethod
    def _validate(cls, value: str, info: Any) -> "Prefix":
        converter = _converter_from_context(getattr(info, "context", None))
        if converter is None:
            return cls(value)
        # PrefixStandardizationError is a ValueError, which pydantic
        # surfaces as a ValidationError on the field
        return cls(converter.standardize_prefix(value, strict=True))


try:  # pragma: no cover - exercised whenever pydantic is installed
    from pydantic import RootModel as _RootModel

    class PrefixMap(_RootModel[dict[Prefix, str]]):  # type: ignore[misc]
        """``prefix → uri_prefix`` mapping as a pydantic root model
        (reference api.py:339-384): ``PrefixMap.model_validate({...},
        context=converter)`` standardizes every key through
        :class:`Prefix` and rejects unknown prefixes. Unpack with
        ``.root``."""

except ImportError:  # pydantic absent: plain-dict fallback, keys unvalidated
    PrefixMap = dict  # type: ignore[assignment,misc]


class ReferenceTuple(NamedTuple):
    """A pair of a CURIE prefix and local unique identifier.

    Mirrors reference api.py:85-175.
    """

    prefix: str
    identifier: str

    @property
    def curie(self) -> str:
        """Format as ``prefix:identifier`` (reference api.py:134-142)."""
        return f"{self.prefix}:{self.identifier}"

    @classmethod
    def from_curie(cls, curie: str, *, sep: str = ":") -> "ReferenceTuple":
        """Parse from a CURIE string, splitting on the first delimiter;
        a string WITHOUT the delimiter raises ``NoCURIEDelimiterError``
        (reference api.py:144-157 via utils ``_split``)."""
        return cls(*_split_strict(curie, sep))

    def to_pydantic(self, *, name: "str | None" = None) -> "Reference":
        """Promote to a full reference object — named when a non-empty
        ``name`` is given (reference api.py:155-175; an empty string is
        an error, matching the reference)."""
        if name is None:
            return Reference(self.prefix, self.identifier)
        if not name:
            raise ValueError(
                f"tried to construct a pydantic named reference with a "
                f"missing name from {self.curie}"
            )
        return NamedReference(self.prefix, self.identifier, name)


@dataclass(frozen=True, eq=False)
class Reference:
    """A hashable, lexically-ordered (prefix, identifier) reference.

    Equality, hashing, and ordering cover (prefix, identifier) ONLY and
    accept any Reference subclass — reference api.py:447-459 semantics,
    where ``Reference("skos", "broadMatch")`` equals (and looks up, in
    dicts) the ``NamedReference`` vocabulary constant regardless of its
    name. Dataclass-generated eq/order would instead compare exact class
    + every field, breaking e.g. ``vocabulary.inversions[ref]``.
    """

    prefix: str
    identifier: str

    def __hash__(self) -> int:
        return hash((self.prefix, self.identifier))

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, Reference)
            and self.prefix == other.prefix
            and self.identifier == other.identifier
        )

    def __lt__(self, other: "Reference") -> bool:
        return self.pair < other.pair

    def __le__(self, other: "Reference") -> bool:
        return self.pair <= other.pair

    def __gt__(self, other: "Reference") -> bool:
        return self.pair > other.pair

    def __ge__(self, other: "Reference") -> bool:
        return self.pair >= other.pair

    @property
    def curie(self) -> str:
        return f"{self.prefix}:{self.identifier}"

    @property
    def pair(self) -> ReferenceTuple:
        return ReferenceTuple(self.prefix, self.identifier)

    def __composite_values__(self) -> "tuple[str, str]":
        """Values for :func:`sqlalchemy.orm.composite` (reference
        api.py:462-464)."""
        return self.prefix, self.identifier

    def without_name(self) -> "Reference":
        """This reference — it already has no name (reference
        api.py:484-486; overridden by the namable subclasses)."""
        return self

    def with_name(self, name: str) -> "NamableReference":
        """This reference, with a name (reference api.py:488-490)."""
        return NamedReference(self.prefix, self.identifier, name)

    @classmethod
    def from_curie(
        cls, curie: str, *, sep: str = ":", converter: Any = None
    ) -> "Reference":
        """Delimiter required — raises ``NoCURIEDelimiterError``
        otherwise (reference api.py:493-506). ``converter`` provides the
        validation context: the prefix is standardized strictly through
        it (synonyms canonicalize, unknown prefixes raise)."""
        prefix, identifier = _split_strict(curie, sep)
        return cls(_standardize_prefix(prefix, converter), identifier)

    @classmethod
    def from_reference(
        cls, reference: "ReferenceTuple | Reference", *, converter: Any = None
    ) -> "Reference":
        """A plain reference from any reference-shaped value — names are
        deliberately dropped (reference api.py:508-521; the namable
        subclasses override to carry them)."""
        return cls(
            _standardize_prefix(reference.prefix, converter), reference.identifier
        )

    @classmethod
    def __get_pydantic_core_schema__(cls, source: Any, handler: Any) -> Any:
        """Pydantic hook (reference api.py:440-459 semantics): a model
        field of this type accepts a CURIE string (delimiter required),
        a ``{"prefix": ..., "identifier": ...}`` dict, or an instance;
        with ``context=converter`` the prefix is standardized strictly
        (unknown prefix → ``ValidationError``). Only invoked by
        pydantic, which is not a core dependency."""
        from pydantic_core import core_schema

        return core_schema.with_info_plain_validator_function(cls._pydantic_validate)

    @classmethod
    def _pydantic_validate(cls, value: Any, info: Any) -> "Reference":
        import dataclasses

        name = None
        if isinstance(value, Reference):
            prefix, identifier = value.prefix, value.identifier
            name = getattr(value, "name", None)
        elif isinstance(value, str):
            if ":" not in value:
                raise ValueError(f"no CURIE delimiter ':' in {value!r}")
            prefix, _, identifier = value.partition(":")
        elif isinstance(value, dict):
            try:
                prefix, identifier = value["prefix"], value["identifier"]
            except KeyError as exc:  # ValueError → pydantic field error
                raise ValueError(f"missing reference field {exc}") from exc
            name = value.get("name")
        else:
            raise ValueError(f"cannot build a {cls.__name__} from {type(value)}")
        converter = _converter_from_context(getattr(info, "context", None))
        if converter is not None:
            prefix = converter.standardize_prefix(prefix, strict=True)
        kwargs: dict[str, Any] = {"prefix": prefix, "identifier": identifier}
        if name is not None and any(f.name == "name" for f in dataclasses.fields(cls)):
            kwargs["name"] = name
        return cls(**kwargs)


@dataclass(frozen=True, eq=False)
class NamableReference(Reference):
    """A reference, maybe with a name (reference api.py:524-599).
    Inherits pair-only equality/ordering: the name never distinguishes
    two references."""

    name: "str | None" = None

    def without_name(self) -> Reference:
        """A plain :class:`Reference`, the name stripped (reference
        api.py:582-584)."""
        return Reference(self.prefix, self.identifier)

    def with_name(self, name: str) -> "NamableReference":
        """The same reference class with the name replaced (reference
        api.py:586-588)."""
        return type(self)(self.prefix, self.identifier, name)

    @classmethod
    def from_curie(  # type: ignore[override]
        cls,
        curie: str,
        name: "str | None" = None,
        *,
        sep: str = ":",
        converter: Any = None,
    ) -> "NamableReference":
        prefix, identifier = _split_strict(curie, sep)
        return cls(_standardize_prefix(prefix, converter), identifier, name)

    @classmethod
    def from_reference(  # type: ignore[override]
        cls, reference: "ReferenceTuple | Reference", *, converter: Any = None
    ) -> "NamableReference":
        """Carries the source's name when it has one (reference
        test_struct.py:113-142 semantics)."""
        return cls(
            _standardize_prefix(reference.prefix, converter),
            reference.identifier,
            getattr(reference, "name", None),
        )


@dataclass(frozen=True, eq=False)
class NamedReference(NamableReference):
    """A reference with a required human-readable label
    (reference api.py:601-653 ``NamedReference``): ``name=None`` is an
    error (the pydantic original fails validation)."""

    #: None is only the dataclass-inheritance sentinel (a field after the
    #: parent's defaulted one must have a default); the reference field
    #: is REQUIRED, so construction without a real string name raises
    name: str = None  # type: ignore[assignment]

    def __post_init__(self) -> None:
        if self.name is None:
            raise ValueError(
                "NamedReference requires a name (the reference model's "
                "name field is required; '' is allowed, None/omitted is not)"
            )

    @classmethod
    def from_curie(  # type: ignore[override]
        cls, curie: str, name: str, *, sep: str = ":", converter: Any = None
    ) -> "NamedReference":
        prefix, identifier = _split_strict(curie, sep)
        return cls(_standardize_prefix(prefix, converter), identifier, name)

    @classmethod
    def from_reference(  # type: ignore[override]
        cls, reference: "ReferenceTuple | Reference", *, converter: Any = None
    ) -> "NamedReference":
        """Requires a named source: a bare tuple/Reference has no name
        to carry (TypeError), and ``name=None`` fails like the pydantic
        original's validation (reference test_struct.py:136-142)."""
        try:
            name = reference.name  # type: ignore[union-attr]
        except AttributeError as exc:
            raise TypeError(
                f"cannot build a NamedReference from a "
                f"{type(reference).__name__} without a name"
            ) from exc
        return cls(
            _standardize_prefix(reference.prefix, converter), reference.identifier, name
        )


@dataclass
class Record:
    """One extended-prefix-map entry (reference api.py:659-727).

    The canonical prefix must not appear in its own synonym list
    (validators at reference api.py:691-709); same for URI prefixes.
    """

    prefix: str
    uri_prefix: str
    prefix_synonyms: list[str] = field(default_factory=list)
    uri_prefix_synonyms: list[str] = field(default_factory=list)
    pattern: str | None = None

    def __post_init__(self) -> None:
        if not isinstance(self.prefix, str) or not isinstance(self.uri_prefix, str):
            raise TypeError("prefix and uri_prefix must be strings")
        self.prefix_not_in_synonyms(self.prefix, {"prefix_synonyms": self.prefix_synonyms})
        self.uri_prefix_not_in_synonyms(
            self.uri_prefix, {"uri_prefix_synonyms": self.uri_prefix_synonyms}
        )

    @classmethod
    def prefix_not_in_synonyms(cls, v: str, values: "dict[str, Any]") -> str:
        """Validator: the canonical prefix must not appear in its own
        synonym list (reference api.py:691-700)."""
        if v in values.get("prefix_synonyms", []):
            raise ValueError(
                f"Duplicate of canonical prefix `{v}` in prefix synonyms"
            )
        return v

    @classmethod
    def uri_prefix_not_in_synonyms(cls, v: str, values: "dict[str, Any]") -> str:
        """Validator: the canonical URI prefix must not appear in its
        own synonym list (reference api.py:702-711)."""
        if v in values.get("uri_prefix_synonyms", []):
            raise ValueError(
                f"Duplicate of canonical URI prefix `{v}` in URI prefix synonyms"
            )
        return v

    @property
    def _all_prefixes(self) -> list[str]:
        return [self.prefix, *self.prefix_synonyms]

    @property
    def _all_uri_prefixes(self) -> list[str]:
        return [self.uri_prefix, *self.uri_prefix_synonyms]

    @property
    def _key(self) -> tuple[str, str, str, str]:
        return (
            self.prefix,
            self.uri_prefix,
            ",".join(sorted(self.prefix_synonyms)),
            ",".join(sorted(self.uri_prefix_synonyms)),
        )

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Record):
            return NotImplemented
        return (
            self.prefix == other.prefix
            and self.uri_prefix == other.uri_prefix
            and self.prefix_synonyms == other.prefix_synonyms
            and self.uri_prefix_synonyms == other.uri_prefix_synonyms
            and self.pattern == other.pattern
        )

    def to_dict(self) -> dict[str, Any]:
        rv: dict[str, Any] = {"prefix": self.prefix, "uri_prefix": self.uri_prefix}
        if self.prefix_synonyms:
            rv["prefix_synonyms"] = list(self.prefix_synonyms)
        if self.uri_prefix_synonyms:
            rv["uri_prefix_synonyms"] = list(self.uri_prefix_synonyms)
        if self.pattern is not None:
            rv["pattern"] = self.pattern
        return rv


def records_from_dicts(dicts: Iterable["dict[str, Any] | Record"]) -> list[Record]:
    """Build records from EPM-style dictionaries (reference api.py:1166-1243)."""
    rv = []
    for d in dicts:
        if isinstance(d, Record):
            rv.append(d)
        else:
            rv.append(
                Record(
                    prefix=d["prefix"],
                    uri_prefix=d["uri_prefix"],
                    prefix_synonyms=list(d.get("prefix_synonyms") or []),
                    uri_prefix_synonyms=list(d.get("uri_prefix_synonyms") or []),
                    pattern=d.get("pattern"),
                )
            )
    return rv


def records_to_dicts(records: Iterable[Record]) -> list[dict[str, Any]]:
    return [r.to_dict() for r in records]


try:  # pragma: no cover - exercised whenever pydantic is installed
    from pydantic import RootModel as _RecordsRootModel

    class Records(_RecordsRootModel[list[Record]]):  # type: ignore[misc]
        """A list of extended-prefix-map records as a pydantic root
        model (reference api.py:732-760): ``Records.model_validate(
        [{"prefix": ..., "uri_prefix": ...}, ...])`` coerces dicts to
        :class:`Record`. The Converter accepts either this (unwrapped
        via ``.root``) or a plain record list."""

        def __iter__(self):  # iterate the records, not the model fields
            return iter(self.root)

        def __len__(self) -> int:
            return len(self.root)

except ImportError:  # pydantic absent: plain-list fallback
    Records = list  # type: ignore[assignment,misc]


def _as_reference(value: "str | Reference") -> Reference:
    return Reference.from_curie(value) if isinstance(value, str) else value


@dataclass(frozen=True)
class Triple:
    """A driver-side (subject, predicate, object) triple of references
    (reference triples/model.py:29-111).

    Accepts CURIE strings or :class:`Reference` objects for each slot.
    The engine's data-scale triple representation is the 3-string-column
    DataFrame (see :mod:`curies_spark.operators.triples`); this class is
    the record-scale counterpart for driver code and tests.
    """

    subject: Reference
    predicate: Reference
    object: Reference

    def __post_init__(self) -> None:
        for slot in ("subject", "predicate", "object"):
            object.__setattr__(self, slot, _as_reference(getattr(self, slot)))

    def as_str_triple(self) -> "tuple[str, str, str]":
        return (self.subject.curie, self.predicate.curie, self.object.curie)

    def as_uri_triple(self, converter: Any) -> "tuple[str, str, str]":
        return (
            converter.expand_reference(self.subject, strict=True),
            converter.expand_reference(self.predicate, strict=True),
            converter.expand_reference(self.object, strict=True),
        )

    def __lt__(self, other: "Triple") -> bool:
        return self.as_str_triple() < other.as_str_triple()

    @classmethod
    def from_curies(
        cls, subject_curie: str, predicate_curie: str, object_curie: str
    ) -> "Triple":
        return cls(
            Reference.from_curie(subject_curie),
            Reference.from_curie(predicate_curie),
            Reference.from_curie(object_curie),
        )

    @classmethod
    def from_uris(
        cls, subject: str, predicate: str, object: str, *, converter: Any
    ) -> "Triple":
        return cls(
            Reference.from_reference(converter.parse_uri(subject, strict=True)),
            Reference.from_reference(converter.parse_uri(predicate, strict=True)),
            Reference.from_reference(converter.parse_uri(object, strict=True)),
        )
