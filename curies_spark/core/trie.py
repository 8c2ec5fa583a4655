"""Longest-prefix-match trie over URI prefixes.

Re-expresses the semantics of the reference's character trie
(/root/reference/src/curies/api.py:3315-3385): ``parse_uri`` walks the
URI character-by-character, remembering the deepest node carrying a
value; the remainder of the string becomes the identifier. This
guarantees the documented longest-URI-prefix-wins behavior
(reference api.py:1762-1769: ``GO:0032571`` beats ``OBO:GO_0032571``).

Implementation notes (Spark-first, NOT a copy of the reference's
dict-of-dicts nodes): the structure must be (a) cheap to pickle into a
Spark broadcast and (b) fast to probe vectorized inside a pandas UDF.
We therefore keep a flat ``dict[str, tuple[str, int]]`` of every URI
prefix → (canonical CURIE prefix, prefix length), plus the sorted set
of distinct prefix lengths.  A probe tries candidate slices of the URI
from longest length down and returns on the first dict hit — O(#lengths)
hash probes per URI instead of a per-character pointer chase, which is
substantially faster in CPython for the shallow, wide prefix sets of
real prefix maps, and identical in result to the reference trie.
"""

from __future__ import annotations

from typing import Iterable

from .record import ReferenceTuple

__all__ = ["PrefixTrie"]


class PrefixTrie:
    """Longest-prefix matcher mapping URI prefixes to CURIE prefixes."""

    __slots__ = ("_map", "_lengths", "_max_len")

    def __init__(self, items: "Iterable[tuple[str, str]] | None" = None) -> None:
        # uri_prefix -> canonical CURIE prefix
        self._map: dict[str, str] = {}
        self._lengths: list[int] = []  # distinct lengths, descending
        self._max_len = 0
        if items:
            for uri_prefix, prefix in items:
                self.insert(uri_prefix, prefix)

    def insert(self, uri_prefix: str, prefix: str) -> None:
        self._map[uri_prefix] = prefix
        n = len(uri_prefix)
        if n not in self._lengths:
            self._lengths.append(n)
            self._lengths.sort(reverse=True)
            self._max_len = self._lengths[0]

    def remove(self, uri_prefix: str) -> None:
        self._map.pop(uri_prefix, None)
        lengths = {len(k) for k in self._map}
        self._lengths = sorted(lengths, reverse=True)
        self._max_len = self._lengths[0] if self._lengths else 0

    def __contains__(self, uri_prefix: str) -> bool:
        return uri_prefix in self._map

    def __len__(self) -> int:
        return len(self._map)

    def parse_uri(self, uri: str) -> "ReferenceTuple | None":
        """Longest-prefix match; identifier is the remainder.

        Matches reference ``Trie.parse_uri`` (api.py:3331-3347) including
        the empty-identifier case (URI equals a prefix exactly).
        """
        m = self._map
        n = len(uri)
        for length in self._lengths:
            if length > n:
                continue
            prefix = m.get(uri[:length])
            if prefix is not None:
                return ReferenceTuple(prefix, uri[length:])
        return None

    def longest_match(self, uri: str) -> "tuple[str, str, str] | None":
        """Like :meth:`parse_uri` but also returns the matched URI prefix."""
        m = self._map
        n = len(uri)
        for length in self._lengths:
            if length > n:
                continue
            key = uri[:length]
            prefix = m.get(key)
            if prefix is not None:
                return prefix, uri[length:], key
        return None

    def items(self):
        return self._map.items()
