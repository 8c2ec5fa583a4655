"""Driver-side converter: the semantic nucleus of the engine.

Re-expresses the ``curies.Converter`` semantics
(/root/reference/src/curies/api.py:847-2766) as a plain, picklable
Python object. Prefix maps are driver-scale (KB-MB); this object is
built once on the driver and shipped to executors via
``SparkContext.broadcast`` — all data-scale work happens in
:mod:`curies_spark.functions` (vectorized kernels) against this
broadcast. Nothing here touches a DataFrame.

Strictness model (matches reference exactly):
- default: miss → ``None``
- ``strict=True``: miss → raise the matching ``ConversionError``
- ``passthrough=True``: miss → return the input unchanged
"""

from __future__ import annotations

import itertools as itt
import json
from collections import defaultdict
from pathlib import Path
from typing import Any, Collection, Iterable, Iterator, Mapping, NamedTuple, Sequence

from .record import Record, ReferenceTuple, records_from_dicts
from .trie import PrefixTrie

__all__ = [
    "CURIEStandardizationError",
    "CompressionError",
    "ConversionError",
    "Converter",
    "DuplicatePrefixes",
    "DuplicateSummary",
    "DuplicateURIPrefixes",
    "DuplicateValueError",
    "ExpansionError",
    "IdentifierStandardizationError",
    "NoCURIEDelimiterError",
    "PrefixStandardizationError",
    "StandardizationError",
    "URIStandardizationError",
    "chain",
    "upgrade_prefix_map",
]


class NoCURIEDelimiterError(ValueError):
    """Thrown on a string with no CURIE delimiter (reference utils.py:11-19)."""

    def __init__(self, curie: str):
        self.curie = curie

    def __str__(self) -> str:
        return f"{self.curie} does not appear to be a CURIE - missing a delimiter"


def _split(curie: str, *, sep: str = ":") -> tuple[str, str]:
    """Split on the *first* delimiter; identifier may contain further
    delimiters, e.g. ``a1:b2:c3 → ("a1", "b2:c3")`` (reference utils.py:22-27)."""
    prefix, delimiter, identifier = curie.partition(sep)
    if not delimiter:
        raise NoCURIEDelimiterError(curie)
    return prefix, identifier


class DuplicateSummary(NamedTuple):
    """Two records duplicated on a CURIE or URI prefix (reference api.py:740-746)."""

    record_1: Record
    record_2: Record
    prefix: str


class DuplicateValueError(ValueError):
    """Duplicate values among converter records (reference api.py:749-760)."""

    def __init__(self, duplicates: list[DuplicateSummary]) -> None:
        self.duplicates = duplicates


class DuplicateURIPrefixes(DuplicateValueError):
    """Duplicate URI prefixes (reference api.py:763-767)."""


class DuplicatePrefixes(DuplicateValueError):
    """Duplicate CURIE prefixes (reference api.py:770-774)."""


class ConversionError(ValueError):
    """An error raised on conversion (reference api.py:777)."""


class ExpansionError(ConversionError):
    """Prefix can't be looked up on expansion (reference api.py:781)."""


class CompressionError(ConversionError):
    """URI prefix can't be matched on compression (reference api.py:785)."""


class StandardizationError(ValueError):
    """An error raised on standardization (reference api.py:789)."""


class PrefixStandardizationError(StandardizationError):
    """A prefix can't be standardized (reference api.py:793)."""


class IdentifierStandardizationError(StandardizationError):
    """An identifier can't be standardized (reference api.py:797)."""


class CURIEStandardizationError(StandardizationError):
    """A CURIE can't be standardized (reference api.py:801)."""


class URIStandardizationError(StandardizationError):
    """A URI can't be standardized (reference api.py:805)."""


def _get_duplicate_uri_prefixes(records: list[Record]) -> list[DuplicateSummary]:
    # pairwise scan, reference api.py:808-815
    return [
        DuplicateSummary(r1, r2, uri_prefix)
        for r1, r2 in itt.combinations(records, 2)
        for uri_prefix, up2 in itt.product(r1._all_uri_prefixes, r2._all_uri_prefixes)
        if uri_prefix == up2
    ]


def _get_duplicate_prefixes(records: list[Record]) -> list[DuplicateSummary]:
    # reference api.py:817-823
    return [
        DuplicateSummary(r1, r2, prefix)
        for r1, r2 in itt.combinations(records, 2)
        for prefix, p2 in itt.product(r1._all_prefixes, r2._all_prefixes)
        if prefix == p2
    ]


#: injectable URL fetcher (url → response text). The engine core never
#: opens network connections itself; production callers install one via
#: :func:`set_url_fetcher` (e.g. urllib/requests), tests inject fakes.
_URL_FETCHER: "Any" = None

_URL_SCHEMES = ("https://", "http://", "ftp://")


def set_url_fetcher(fetcher: Any) -> Any:
    """Install the ``url -> text`` callable used by :func:`_prepare` for
    remote inputs (the reference fetches inline with urllib,
    api.py:840-844; the engine makes that dependency injectable so the
    loader polymorphism works without ambient network access). Returns
    the previous fetcher so callers can restore it."""
    global _URL_FETCHER
    previous, _URL_FETCHER = _URL_FETCHER, fetcher
    return previous


def _prepare(data: Any) -> Any:
    """Polymorphic load: Path → JSON file, URL string → fetched JSON (via
    the injected fetcher), str path → JSON file, else literal
    (reference api.py:826-844)."""
    if isinstance(data, Path):
        with data.open() as file:
            return json.load(file)
    if isinstance(data, str):
        if data.startswith(_URL_SCHEMES):
            if _URL_FETCHER is None:
                raise ValueError(
                    f"cannot load remote input {data!r}: no URL fetcher installed "
                    "(call curies_spark.core.converter.set_url_fetcher first; the "
                    "engine core performs no ambient network I/O)"
                )
            return json.loads(_URL_FETCHER(data))
        with open(data) as file:
            return json.load(file)
    return data


class Converter:
    """A prefix-map data structure with O(1) prefix lookup and
    longest-prefix URI matching (reference api.py:847-921).

    Picklable; intended to be shipped once per executor via
    ``SparkContext.broadcast`` and probed inside Arrow-batched pandas UDFs.
    """

    def __init__(
        self,
        records: Iterable[Record] | None = None,
        *,
        delimiter: str = ":",
        strict: bool = True,
    ) -> None:
        if hasattr(records, "root"):  # a Records root model — unwrap
            records = records.root
        records = sorted(records or [], key=lambda r: r.prefix)
        if strict:
            duplicate_uri_prefixes = _get_duplicate_uri_prefixes(records)
            if duplicate_uri_prefixes:
                raise DuplicateURIPrefixes(duplicate_uri_prefixes)
            duplicate_prefixes = _get_duplicate_prefixes(records)
            if duplicate_prefixes:
                raise DuplicatePrefixes(duplicate_prefixes)

        self.delimiter = delimiter
        self.records: list[Record] = records

        self._prefix_to_record: dict[str, Record] = {}
        self._prefix_ci_to_record: dict[str, Record] = {}
        self._uri_prefix_to_record: dict[str, Record] = {}
        self._uri_prefix_ci_to_record: dict[str, Record] = {}
        self.trie = PrefixTrie()
        self.pattern_map: dict[str, str] = {}

        for record in records:
            self._index(record)

    # ------------------------------------------------------------------
    # indexing / mutation (reference api.py:961-1109)
    # ------------------------------------------------------------------

    def _index(self, record: Record) -> None:
        for prefix in record._all_prefixes:
            self._prefix_to_record[prefix] = record
            self._prefix_ci_to_record[prefix.casefold()] = record
        for uri_prefix in record._all_uri_prefixes:
            self._uri_prefix_to_record[uri_prefix] = record
            self._uri_prefix_ci_to_record[uri_prefix.casefold()] = record
            self.trie.insert(uri_prefix, record.prefix)
        if record.pattern and record.prefix not in self.pattern_map:
            self.pattern_map[record.prefix] = record.pattern

    @staticmethod
    def _label(x: bool) -> str:
        return "primary" if x else "secondary"

    def _match_record(
        self, external: Record, case_sensitive: bool = True
    ) -> Mapping[str, list[str]]:
        """Match an incoming record against existing ones (reference api.py:961-994)."""
        rv: defaultdict[str, list[str]] = defaultdict(list)
        if case_sensitive:
            if record := self._prefix_to_record.get(external.prefix):
                rv[record.prefix].append(
                    f"primary prefix ({external.prefix}) match to "
                    f"{self._label(external.prefix == record.prefix)} prefix for {record.prefix}"
                )
            for prefix in external.prefix_synonyms:
                if record := self._prefix_to_record.get(prefix):
                    rv[record.prefix].append(
                        f"secondary prefix ({prefix}) matched "
                        f"{self._label(prefix == record.prefix)} prefix for {record.prefix}"
                    )
            if record := self._uri_prefix_to_record.get(external.uri_prefix):
                rv[record.prefix].append(
                    f"primary URI prefix ({external.uri_prefix}) matched "
                    f"{self._label(record.uri_prefix == external.uri_prefix)} "
                    f"URI prefix for {record.prefix}"
                )
            for uri_prefix in external.uri_prefix_synonyms:
                if record := self._uri_prefix_to_record.get(uri_prefix):
                    rv[record.prefix].append(
                        f"secondary URI prefix ({uri_prefix}) matched "
                        f"{self._label(record.uri_prefix == uri_prefix)} "
                        f"URI prefix for {record.prefix}"
                    )
        else:
            for prefix in external._all_prefixes:
                if record := self._prefix_ci_to_record.get(prefix.casefold()):
                    rv[record.prefix].append("prefix case-insensitive match")
            for uri_prefix in external._all_uri_prefixes:
                if record := self._uri_prefix_ci_to_record.get(uri_prefix.casefold()):
                    rv[record.prefix].append("URI case-insensitive prefix match")
        return dict(rv)

    def add_record(
        self, record: Record, *, case_sensitive: bool = True, merge: bool = False
    ) -> None:
        """Append a record, merging into a unique overlap when ``merge=True``
        (reference api.py:996-1036)."""
        matched = self._match_record(record, case_sensitive=case_sensitive)
        if len(matched) > 1:
            msg = "".join(f"\n  {m} -> {v}" for m, v in matched.items())
            raise ValueError(f"new record has duplicates:{msg}")
        if len(matched) == 1:
            prefix, values = next(iter(matched.items()))
            if not merge:
                msg = "\n".join(f"- {v}" for v in values)
                raise ValueError(
                    f"failed to add {record.prefix} because of overlaps:\n{msg}"
                )
            existing_record = self._prefix_to_record[prefix]
            self._merge(record, into=existing_record)
            self._index(existing_record)
        else:
            self.records.append(record)
            self._index(record)

    @staticmethod
    def _merge(record: Record, into: Record) -> None:
        # reference api.py:1024-1036: union of prefixes as sorted synonyms
        existing = set(into._all_prefixes)
        for prefix in record._all_prefixes:
            if prefix not in existing:
                into.prefix_synonyms.append(prefix)
        into.prefix_synonyms.sort()
        existing_uri = set(into._all_uri_prefixes)
        for uri_prefix in record._all_uri_prefixes:
            if uri_prefix not in existing_uri:
                into.uri_prefix_synonyms.append(uri_prefix)
        into.uri_prefix_synonyms.sort()

    def add_prefix(
        self,
        prefix: str,
        uri_prefix: str,
        prefix_synonyms: Collection[str] | None = None,
        uri_prefix_synonyms: Collection[str] | None = None,
        *,
        pattern: str | None = None,
        case_sensitive: bool = True,
        merge: bool = False,
    ) -> None:
        """Append a prefix (reference api.py:1111-1164)."""
        record = Record(
            prefix=prefix,
            uri_prefix=uri_prefix,
            prefix_synonyms=sorted(prefix_synonyms or []),
            uri_prefix_synonyms=sorted(uri_prefix_synonyms or []),
            pattern=pattern,
        )
        self.add_record(record, case_sensitive=case_sensitive, merge=merge)

    def add_prefix_synonym(self, prefix: str, prefix_synonym: str) -> None:
        """Attach a prefix synonym to an existing record, rejecting clashes
        (reference api.py:1057-1082)."""
        record = self.get_record(prefix, strict=True)
        if prefix_synonym in self._prefix_to_record:
            raise ValueError(f"prefix synonym {prefix_synonym} clashes with existing prefix")
        record.prefix_synonyms.append(prefix_synonym)
        record.prefix_synonyms.sort()
        self._index(record)

    def add_uri_prefix_synonym(self, prefix: str, uri_prefix_synonym: str) -> None:
        """Attach a URI prefix synonym (reference api.py:1084-1109)."""
        record = self.get_record(prefix, strict=True)
        if uri_prefix_synonym in self._uri_prefix_to_record:
            raise ValueError(
                f"URI prefix synonym {uri_prefix_synonym} clashes with existing URI prefix"
            )
        record.uri_prefix_synonyms.append(uri_prefix_synonym)
        record.uri_prefix_synonyms.sort()
        self._index(record)

    # ------------------------------------------------------------------
    # constructors (reference api.py:1166-1438)
    # ------------------------------------------------------------------

    @classmethod
    def from_extended_prefix_map(
        cls, records: "Iterable[Record | dict[str, Any]] | str | Path", **kwargs: Any
    ) -> "Converter":
        """EPM (list of record dicts) → Converter (reference api.py:1166-1243)."""
        return cls(records_from_dicts(_prepare(records)), **kwargs)

    @classmethod
    def from_prefix_map(
        cls, prefix_map: "Mapping[str, str] | str | Path", **kwargs: Any
    ) -> "Converter":
        """Simple ``{prefix: uri_prefix}`` → Converter (reference api.py:1285-1319)."""
        return cls(
            [
                Record(prefix=prefix, uri_prefix=uri_prefix)
                for prefix, uri_prefix in _prepare(prefix_map).items()
            ],
            **kwargs,
        )

    @classmethod
    def from_priority_prefix_map(
        cls, data: "Mapping[str, list[str]] | str | Path", **kwargs: Any
    ) -> "Converter":
        """``{prefix: [uri_prefixes...]}``; first is canonical, rest synonyms
        (reference api.py:1245-1283)."""
        return cls(
            [
                Record(
                    prefix=prefix,
                    uri_prefix=uri_prefixes[0],
                    uri_prefix_synonyms=list(uri_prefixes[1:]),
                )
                for prefix, uri_prefixes in _prepare(data).items()
            ],
            **kwargs,
        )

    @classmethod
    def from_reverse_prefix_map(
        cls, reverse_prefix_map: "Mapping[str, str] | str | Path", **kwargs: Any
    ) -> "Converter":
        """``{uri_prefix: prefix}``; shortest URI prefix per prefix becomes
        canonical (reference api.py:1321-1365, sort at :1359)."""
        dd: defaultdict[str, list[str]] = defaultdict(list)
        for uri_prefix, prefix in _prepare(reverse_prefix_map).items():
            dd[prefix].append(uri_prefix)
        records = []
        for prefix, uri_prefixes in dd.items():
            uri_prefix, *uri_prefix_synonyms = sorted(uri_prefixes, key=len)
            records.append(
                Record(
                    prefix=prefix,
                    uri_prefix=uri_prefix,
                    uri_prefix_synonyms=uri_prefix_synonyms,
                )
            )
        return cls(records, **kwargs)

    @classmethod
    def from_jsonld(cls, data: "dict[str, Any] | str | Path", **kwargs: Any) -> "Converter":
        """JSON-LD ``@context`` → Converter; skips empty and ``@``-keys, accepts
        ``{"@prefix": true, "@id": ...}`` expanded terms (reference api.py:1367-1404)."""
        prefix_map = {}
        for key, value in _prepare(data)["@context"].items():
            if not key or key.startswith("@"):
                continue
            if isinstance(value, str):
                prefix_map[key] = value
            elif isinstance(value, dict) and value.get("@prefix") is True:
                prefix_map[key] = value["@id"]
        return cls.from_prefix_map(prefix_map, **kwargs)

    @classmethod
    def from_jsonld_github(
        cls, owner: str, repo: str, *path: str, branch: str = "main", **kwargs: Any
    ) -> "Converter":
        """Construct the raw.githubusercontent URL for a JSON-LD context
        file and load it through :meth:`from_jsonld` (reference
        api.py:1406-1438). Requires an installed URL fetcher
        (:func:`set_url_fetcher`)."""
        if not path or not path[-1].endswith(".jsonld"):
            raise ValueError("final path argument should end with .jsonld")
        rest = "/".join(path)
        url = f"https://raw.githubusercontent.com/{owner}/{repo}/{branch}/{rest}"
        return cls.from_jsonld(url, **kwargs)

    @classmethod
    def from_shacl(cls, source: "str | Path", **kwargs: Any) -> "Converter":
        """SHACL ``sh:declare`` turtle → Converter (reference
        api.py:1508-1545); the parser lives in sources.loaders."""
        from ..sources.loaders import from_shacl

        return from_shacl(source, **kwargs)

    @classmethod
    def from_rdflib(cls, graph_or_manager: Any, **kwargs: Any) -> "Converter":
        """Converter from an rdflib graph or namespace manager — anything
        exposing ``namespaces()`` yielding (prefix, namespace) pairs
        (reference api.py:1441-1473). Namespaces are stringified, since
        rdflib yields URIRef objects."""
        namespaces = getattr(graph_or_manager, "namespaces", None)
        if namespaces is None:  # a Graph wraps its manager
            namespaces = graph_or_manager.namespace_manager.namespaces
        prefix_map = {prefix: str(namespace) for prefix, namespace in namespaces()}
        return cls.from_prefix_map(prefix_map, **kwargs)

    def bind_rdflib(self, graph_or_manager: Any, synonyms: bool = False) -> None:
        """Bind this converter's prefix map into an rdflib graph or
        namespace manager via its ``bind(prefix, namespace)``
        (reference api.py:1475-1506). Namespaces are bound as plain
        strings — rdflib coerces them to ``Namespace`` internally."""
        for record in self.records:
            graph_or_manager.bind(record.prefix, record.uri_prefix)
            if synonyms:
                for synonym in record.prefix_synonyms:
                    graph_or_manager.bind(synonym, record.uri_prefix)

    # ------------------------------------------------------------------
    # derived maps (reference api.py:923-959)
    # ------------------------------------------------------------------

    @property
    def prefix_map(self) -> dict[str, str]:
        """All prefixes (canonical + synonyms) → canonical URI prefix."""
        return {
            prefix: record.uri_prefix
            for record in self.records
            for prefix in record._all_prefixes
        }

    @property
    def reverse_prefix_map(self) -> dict[str, str]:
        """All URI prefixes (canonical + synonyms) → canonical prefix."""
        return {
            uri_prefix: record.prefix
            for record in self.records
            for uri_prefix in record._all_uri_prefixes
        }

    @property
    def bimap(self) -> dict[str, str]:
        """Bijection canonical prefix → canonical URI prefix."""
        return {r.prefix: r.uri_prefix for r in self.records}

    @property
    def reverse_bimap(self) -> dict[str, str]:
        """Bijection canonical URI prefix → canonical prefix."""
        return {r.uri_prefix: r.prefix for r in self.records}

    @property
    def synonym_to_prefix(self) -> dict[str, str]:
        """All prefixes (canonical + synonyms) → canonical prefix."""
        return {
            prefix: record.prefix
            for record in self.records
            for prefix in record._all_prefixes
        }

    def __len__(self) -> int:
        return len(self.records)

    def __iter__(self) -> Iterator[Record]:
        return iter(self.records)

    def has_prefix(self, prefix: str) -> bool:
        return prefix in self._prefix_to_record

    def get_record(self, prefix: str, *, strict: bool = False) -> Record | None:
        """Get the record for a (possibly synonym) prefix (reference api.py:2676-2684)."""
        for record in self.records:
            if record.prefix == prefix or prefix in record.prefix_synonyms:
                return record
        if strict:
            raise KeyError(f"could not find prefix: {prefix}")
        return None

    def get_prefixes(self, *, include_synonyms: bool = False) -> set[str]:
        rv = {record.prefix for record in self.records}
        if include_synonyms:
            rv.update(s for record in self.records for s in record.prefix_synonyms)
        return rv

    def get_uri_prefixes(self, *, include_synonyms: bool = False) -> set[str]:
        rv = {record.uri_prefix for record in self.records}
        if include_synonyms:
            rv.update(s for record in self.records for s in record.uri_prefix_synonyms)
        return rv

    def get_subconverter(self, prefixes: Iterable[str]) -> "Converter":
        """Filter records to a prefix subset (reference api.py:2686-2733)."""
        prefixes = set(prefixes)
        records = [
            record
            for record in self.records
            if any(prefix in prefixes for prefix in record._all_prefixes)
        ]
        return Converter(records)

    # ------------------------------------------------------------------
    # conversion scalar functions (reference api.py:1583-2443)
    # ------------------------------------------------------------------

    def format_curie(self, prefix: str, identifier: str) -> str:
        return f"{prefix}{self.delimiter}{identifier}"

    def parse_uri(self, uri: str, *, strict: bool = False) -> ReferenceTuple | None:
        """Longest-prefix-match a URI (reference api.py:1793-1821)."""
        rv = self.trie.parse_uri(uri)
        if rv is not None:
            return rv
        if strict:
            raise CompressionError(uri)
        return None

    def compress(
        self, uri: str, *, strict: bool = False, passthrough: bool = False
    ) -> str | None:
        """URI → CURIE with longest-prefix matching (reference api.py:1732-1778).

        >>> conv = Converter.from_extended_prefix_map([
        ...     {"prefix": "GO", "uri_prefix": "http://purl.obolibrary.org/obo/GO_"},
        ...     {"prefix": "OBO", "uri_prefix": "http://purl.obolibrary.org/obo/"},
        ... ])
        >>> conv.compress("http://purl.obolibrary.org/obo/GO_0032571")  # longest wins
        'GO:0032571'
        >>> conv.compress("http://purl.obolibrary.org/obo/go.owl")
        'OBO:go.owl'
        >>> conv.compress("http://example.org/nope") is None
        True
        >>> conv.compress("http://example.org/nope", passthrough=True)
        'http://example.org/nope'
        """
        reference = self.parse_uri(uri)
        if reference:
            return self.format_curie(reference.prefix, reference.identifier)
        if strict:
            raise CompressionError(uri)
        if passthrough:
            return uri
        return None

    def compress_strict(self, uri: str) -> str:
        return self.compress(uri, strict=True)  # type: ignore[return-value]

    def is_uri(self, s: str) -> bool:
        return self.compress(s) is not None

    def is_curie(self, s: str) -> bool:
        """Reference api.py:1823-1848: can the string be expanded?"""
        try:
            return self.expand(s) is not None
        except NoCURIEDelimiterError:
            return False

    def parse_curie(self, curie: str, *, strict: bool = False) -> ReferenceTuple | None:
        """Split on first delimiter, standardize prefix (reference api.py:2039-2052).

        Raises :class:`NoCURIEDelimiterError` when there is no delimiter,
        matching the reference's eager ``_split``.
        """
        prefix, identifier = _split(curie, sep=self.delimiter)
        norm_prefix = self.standardize_prefix(prefix, strict=False)
        if norm_prefix is None:
            if strict:
                raise PrefixStandardizationError(prefix)
            return None
        norm_identifier = self.standardize_identifier(norm_prefix, identifier)
        if norm_identifier is None:
            if strict:
                raise IdentifierStandardizationError(curie)
            return None
        return ReferenceTuple(norm_prefix, norm_identifier)

    def standardize_identifier(self, standard_prefix: str, identifier: str) -> str | None:
        """No-op hook (reference api.py:2066-2083); subclass to validate."""
        return identifier

    def standardize_prefix(
        self, prefix: str, *, strict: bool = False, passthrough: bool = False
    ) -> str | None:
        """Synonym → canonical prefix (reference api.py:2239-2278)."""
        record = self._prefix_to_record.get(prefix)
        if record:
            return record.prefix
        if strict:
            raise PrefixStandardizationError(prefix)
        if passthrough:
            return prefix
        return None

    def standardize_curie(
        self, curie: str, *, strict: bool = False, passthrough: bool = False
    ) -> str | None:
        """Idempotent CURIE standardization (reference api.py:2298-2343)."""
        rt = self.parse_curie(curie)
        if rt is not None:
            return self.format_curie(rt.prefix, rt.identifier)
        if strict:
            raise CURIEStandardizationError(curie)
        if passthrough:
            return curie
        return None

    def standardize_uri(
        self, uri: str, *, strict: bool = False, passthrough: bool = False
    ) -> str | None:
        """Idempotent URI standardization (reference api.py:2363-2413)."""
        reference = self.parse_uri(uri, strict=False)
        if reference is not None:
            # prefix is canonical after a successful parse (reference api.py:2407-2409)
            return self._prefix_to_record[reference.prefix].uri_prefix + reference.identifier
        if strict:
            raise URIStandardizationError(uri)
        if passthrough:
            return uri
        return None

    def expand_reference(
        self,
        reference: ReferenceTuple,
        *,
        strict: bool = False,
        passthrough: bool = False,
    ) -> str | None:
        """(prefix, identifier) → URI (reference api.py:2105-2120)."""
        record = self._prefix_to_record.get(reference.prefix)
        if record is not None:
            return record.uri_prefix + reference.identifier
        if strict:
            raise ExpansionError(reference.prefix)
        if passthrough:
            return self.format_curie(reference.prefix, reference.identifier)
        return None

    def expand_pair(
        self,
        prefix: str,
        identifier: str,
        *,
        strict: bool = False,
        passthrough: bool = False,
    ) -> str | None:
        """Reference api.py:2139-2168."""
        return self.expand_reference(
            ReferenceTuple(prefix, identifier), strict=strict, passthrough=passthrough
        )

    def expand(
        self, curie: str, *, strict: bool = False, passthrough: bool = False
    ) -> str | None:
        """CURIE → URI (reference api.py:1949-1983).

        >>> conv = Converter.from_extended_prefix_map([{
        ...     "prefix": "CHEBI", "prefix_synonyms": ["chebi"],
        ...     "uri_prefix": "http://purl.obolibrary.org/obo/CHEBI_",
        ... }])
        >>> conv.expand("chebi:138488")  # synonym prefix standardized
        'http://purl.obolibrary.org/obo/CHEBI_138488'
        >>> conv.expand("missing:1") is None
        True
        >>> conv.expand("a1:b2:c3") is None  # split on FIRST delimiter
        True
        """
        reference = self.parse_curie(curie, strict=False)
        if reference is not None:
            return self.expand_reference(reference, strict=strict, passthrough=passthrough)
        if strict:
            raise ExpansionError(curie)
        if passthrough:
            return curie
        return None

    def expand_strict(self, curie: str) -> str:
        return self.expand(curie, strict=True)  # type: ignore[return-value]

    def expand_all(self, curie: str, *, strict: bool = False) -> Collection[str] | None:
        """Canonical URI first, then one per synonym (reference api.py:1995-2027)."""
        reference = self.parse_curie(curie, strict=False)
        if reference is not None:
            return self.expand_pair_all(reference.prefix, reference.identifier)
        if strict:
            raise PrefixStandardizationError(curie)
        return None

    def expand_pair_all(
        self, prefix: str, identifier: str, *, strict: bool = False
    ) -> Collection[str] | None:
        """Reference api.py:2182-2219."""
        record = self._prefix_to_record.get(prefix)
        if record is not None:
            rv = [record.uri_prefix + identifier]
            for uri_prefix_synonym in record.uri_prefix_synonyms:
                rv.append(uri_prefix_synonym + identifier)
            return rv
        if strict:
            raise ExpansionError(prefix)
        return None

    def parse(self, s: str, *, strict: bool = False) -> ReferenceTuple | None:
        """URI else CURIE else None (reference api.py:1700-1708)."""
        if self.is_uri(s):
            return self.parse_uri(s, strict=strict)
        if self.is_curie(s):
            return self.parse_curie(s, strict=strict)
        if strict:
            raise CompressionError(s)
        return None

    def compress_or_standardize(
        self, uri_or_curie: str, *, strict: bool = False, passthrough: bool = False
    ) -> str | None:
        """Reference api.py:1637-1686."""
        reference = self.parse(uri_or_curie, strict=False)
        if reference is not None:
            return self.format_curie(reference.prefix, reference.identifier)
        if strict:
            raise CompressionError(uri_or_curie)
        if passthrough:
            return uri_or_curie
        return None

    def expand_or_standardize(
        self, curie_or_uri: str, *, strict: bool = False, passthrough: bool = False
    ) -> str | None:
        """Reference api.py:1876-1925."""
        reference = self.parse(curie_or_uri, strict=False)
        if reference is not None:
            return self.expand_reference(reference, strict=strict, passthrough=passthrough)
        if strict:
            raise ExpansionError(curie_or_uri)
        if passthrough:
            return curie_or_uri
        return None

    def standardize_reference(
        self, reference: ReferenceTuple, *, strict: bool = False
    ) -> ReferenceTuple | None:
        """Reference api.py:2427-2443."""
        st_prefix = self.standardize_prefix(reference.prefix, strict=False)
        if st_prefix is None:
            if strict:
                raise PrefixStandardizationError(reference.prefix)
            return None
        st_identifier = self.standardize_identifier(st_prefix, reference.identifier)
        if st_identifier is None:
            if strict:
                raise IdentifierStandardizationError(reference.curie)
            return None
        return ReferenceTuple(st_prefix, st_identifier)

    # -- driver-scale pandas / file / hash helpers ---------------------
    # (reference api.py:2445-2666, 2735-2766). These operate on
    # in-memory pandas frames and local CSVs — the DISTRIBUTED twins are
    # SparkConverter.df_* (functions/spark_converter.py) and
    # sources.loaders.file_convert_column; these exist so reference
    # call sites port verbatim.

    def _pd_apply(self, df, column, target_column, func) -> None:
        df[column if target_column is None else target_column] = df[column].map(func)

    def pd_compress(
        self,
        df,
        column,
        target_column=None,
        strict: bool = False,
        passthrough: bool = False,
        ambiguous: bool = False,
    ) -> None:
        """In-place URI→CURIE conversion of a pandas column (reference
        api.py:2445-2471)."""
        op = self.compress_or_standardize if ambiguous else self.compress
        self._pd_apply(
            df, column, target_column,
            lambda v: op(v, strict=strict, passthrough=passthrough),
        )

    def pd_expand(
        self,
        df,
        column,
        target_column=None,
        strict: bool = False,
        passthrough: bool = False,
        ambiguous: bool = False,
    ) -> None:
        """In-place CURIE→URI conversion of a pandas column (reference
        api.py:2473-2499)."""
        op = self.expand_or_standardize if ambiguous else self.expand
        self._pd_apply(
            df, column, target_column,
            lambda v: op(v, strict=strict, passthrough=passthrough),
        )

    def pd_standardize_prefix(
        self, df, column, target_column=None,
        strict: bool = False, passthrough: bool = False,
    ) -> None:
        """Reference api.py:2501-2522."""
        self._pd_apply(
            df, column, target_column,
            lambda v: self.standardize_prefix(v, strict=strict, passthrough=passthrough),
        )

    def pd_standardize_curie(
        self, df, column, target_column=None,
        strict: bool = False, passthrough: bool = False,
    ) -> None:
        """Reference api.py:2524-2560."""
        self._pd_apply(
            df, column, target_column,
            lambda v: self.standardize_curie(v, strict=strict, passthrough=passthrough),
        )

    def pd_standardize_uri(
        self, df, column, target_column=None,
        strict: bool = False, passthrough: bool = False,
    ) -> None:
        """Reference api.py:2562-2583."""
        self._pd_apply(
            df, column, target_column,
            lambda v: self.standardize_uri(v, strict=strict, passthrough=passthrough),
        )

    def _file_helper(
        self, func, path, column: int, sep: "str | None" = None, header: bool = True
    ) -> None:
        """In-place CSV column rewrite (reference api.py:2645-2666)."""
        import csv
        from pathlib import Path as _Path

        path = _Path(path).expanduser().resolve()
        delimiter = sep or "\t"
        with path.open() as fh:
            reader = csv.reader(fh, delimiter=delimiter)
            rows = list(reader)
        start = 1 if header else 0
        for row in rows[start:]:
            row[column] = func(row[column])
        with path.open("w", newline="") as fh:
            csv.writer(fh, delimiter=delimiter, lineterminator="\n").writerows(rows)

    def file_compress(
        self,
        path,
        column: int,
        *,
        sep: "str | None" = None,
        header: bool = True,
        strict: bool = False,
        passthrough: bool = False,
        ambiguous: bool = False,
    ) -> None:
        """In-place URI→CURIE rewrite of one CSV column (reference
        api.py:2585-2613)."""
        op = self.compress_or_standardize if ambiguous else self.compress
        self._file_helper(
            lambda v: op(v, strict=strict, passthrough=passthrough),
            path, column, sep, header,
        )

    def file_expand(
        self,
        path,
        column: int,
        *,
        sep: "str | None" = None,
        header: bool = True,
        strict: bool = False,
        passthrough: bool = False,
        ambiguous: bool = False,
    ) -> None:
        """In-place CURIE→URI rewrite of one CSV column (reference
        api.py:2615-2643)."""
        op = self.expand_or_standardize if ambiguous else self.expand
        self._file_helper(
            lambda v: op(v, strict=strict, passthrough=passthrough),
            path, column, sep, header,
        )

    def hash_triple(self, triple, *, negate: bool = False) -> str:
        """SHA-256 of the space-joined strictly-expanded URI triple
        (reference api.py:2735-2766, triples/hash_utils.py:17-115);
        ``negate`` appends ``~``. The columnar twin is
        ``functions.kernels.hash_triple_col``."""
        import hashlib

        uris = triple.as_uri_triple(self)
        digest = hashlib.sha256(" ".join(uris).encode("utf-8")).hexdigest()
        return digest + "~" if negate else digest


def chain(converters: Sequence[Converter], *, case_sensitive: bool = True) -> Converter:
    """Priority-merge converters: earlier wins; later overlapping records merge
    in as synonyms (reference api.py:2769-2840).

    >>> a = Converter.from_prefix_map({"GO": "http://purl.obolibrary.org/obo/GO_"})
    >>> b = Converter.from_prefix_map({"GO": "https://identifiers.org/go:"})
    >>> merged = chain([a, b])
    >>> merged.compress("https://identifiers.org/go:0032571")  # URI synonym of GO now
    'GO:0032571'
    >>> merged.expand("GO:0032571")  # first converter's canonical URI wins
    'http://purl.obolibrary.org/obo/GO_0032571'
    """
    converters = list(converters)
    if not converters:
        raise ValueError
    if len(converters) == 1:
        return converters[0]
    rv = Converter()
    for converter in converters:
        for record in converter.records:
            # deep-copy so merges don't mutate source converters
            rv.add_record(
                Record(
                    prefix=record.prefix,
                    uri_prefix=record.uri_prefix,
                    prefix_synonyms=list(record.prefix_synonyms),
                    uri_prefix_synonyms=list(record.uri_prefix_synonyms),
                    pattern=record.pattern,
                ),
                case_sensitive=case_sensitive,
                merge=True,
            )
    return rv


def upgrade_prefix_map(prefix_map: Mapping[str, str]) -> list[Record]:
    """Non-bijective ``{prefix: uri_prefix}`` → records; lexical sort picks
    the primary prefix per URI prefix (reference api.py:3211-3302)."""
    uri_prefix_to_curie_synonyms: defaultdict[str, list[str]] = defaultdict(list)
    for curie_prefix, uri_prefix in prefix_map.items():
        uri_prefix_to_curie_synonyms[uri_prefix].append(curie_prefix)
    priority_prefix_map = {
        uri_prefix: sorted(curie_prefixes)
        for uri_prefix, curie_prefixes in uri_prefix_to_curie_synonyms.items()
    }
    return [
        Record(prefix=prefix, prefix_synonyms=prefix_synonyms, uri_prefix=uri_prefix)
        for uri_prefix, (prefix, *prefix_synonyms) in sorted(priority_prefix_map.items())
    ]
