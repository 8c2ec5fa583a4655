"""URI-prefix discovery (driver-scale iterable form).

Semantics from the reference (/root/reference/src/curies/discovery.py:138-265):
for each URI, the first delimiter (in priority order ``#``, ``/``, ``_``)
whose rightmost split yields an all-alphanumeric LUID wins; URI prefixes
with ≥ cutoff distinct LUIDs are kept, sorted lexicographically, and
assigned dummy prefixes ``ns1..nsN``.

The distributed DataFrame twin lives in
:mod:`curies_spark.operators.discovery`.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Iterable, Mapping, Sequence

from .converter import Converter
from .record import Record

__all__ = ["DEFAULT_DELIMITERS", "discover"]

#: Reference discovery.py:230
DEFAULT_DELIMITERS = ("#", "/", "_")


def _get_uri_prefix_to_luids(
    *,
    converter: Converter | None = None,
    uris: Iterable[str],
    delimiters: Sequence[str] | None = None,
) -> Mapping[str, set[str]]:
    """Reference discovery.py:236-265 (including the GitHub-issues special case)."""
    if not delimiters:
        delimiters = DEFAULT_DELIMITERS
    uri_prefix_to_luids: defaultdict[str, set[str]] = defaultdict(set)
    for uri in uris:
        if converter is not None and converter.is_uri(uri):
            continue
        if uri.startswith("https://github.com") and "issues" in uri:
            continue
        for delimiter in delimiters:
            if delimiter not in uri:
                continue
            uri_prefix, luid = uri.rsplit(delimiter, maxsplit=1)
            if luid.isalnum():
                uri_prefix_to_luids[uri_prefix + delimiter].add(luid)
                break
    return dict(uri_prefix_to_luids)


def discover(
    uris: Iterable[str],
    *,
    delimiters: Sequence[str] | None = None,
    cutoff: int | None = None,
    metaprefix: str = "ns",
    converter: Converter | None = None,
) -> Converter:
    """Discover URI prefixes, returning a converter with dummy prefixes
    (reference discovery.py:138-228)."""
    uri_prefix_to_luids = _get_uri_prefix_to_luids(
        converter=converter, uris=uris, delimiters=delimiters
    )
    uri_prefixes = [
        uri_prefix
        for uri_prefix, luids in sorted(uri_prefix_to_luids.items())
        if cutoff is None or len(luids) >= cutoff
    ]
    records = [
        Record(prefix=f"{metaprefix}{index}", uri_prefix=uri_prefix)
        for index, uri_prefix in enumerate(uri_prefixes, start=1)
    ]
    return Converter(records)
