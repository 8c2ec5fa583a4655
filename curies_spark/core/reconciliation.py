"""Reconciliation: remapping and rewiring converters on the driver.

Semantics from the reference (/root/reference/src/curies/reconciliation.py:39-265).
These operate on the small record list; after reconciliation the caller
re-broadcasts the new converter to executors.

Deliberate deviation: these functions are PURE — records are copied
before modification, so the input converter stays valid. The reference
mutates the input converter's Record objects in place while returning a
new Converter (observable via reconciliation.py:50-86), which would
corrupt an already-broadcast converter here. The RETURNED converter
behaves identically (property-checked against the reference in
tests/test_property_differential.py).
"""

from __future__ import annotations

import logging
from collections import Counter, defaultdict
from typing import Collection, Mapping

from .converter import Converter
from .record import Record

__all__ = [
    "CycleDetected",
    "DuplicateKeys",
    "DuplicateValues",
    "InconsistentMapping",
    "TransitiveError",
    "remap_curie_prefixes",
    "remap_uri_prefixes",
    "rewire",
]

logger = logging.getLogger(__name__)


class TransitiveError(NotImplementedError):
    """Transitive mappings appear in a URI remapping (reference reconciliation.py:20-36)."""

    def __init__(self, intersection: Collection[str]) -> None:
        self.intersection = intersection

    def __str__(self) -> str:
        return (
            "Transitive mapping has not been implemented. The following appear in "
            f"both the keys and values of the remapping: {self.intersection}."
        )


class DuplicateValues(ValueError):
    """Multiple remapping values share a preferred CURIE prefix (reconciliation.py:183-184)."""


class DuplicateKeys(ValueError):
    """Multiple remapping keys share a preferred CURIE prefix (reconciliation.py:187-188)."""


class InconsistentMapping(ValueError):
    """Inconsistent prefixes used in keys and values (reconciliation.py:191-192)."""


class CycleDetected(ValueError):
    """The remapping induces a cycle (reconciliation.py:195-196)."""


def _copy_record(r: Record) -> Record:
    return Record(
        prefix=r.prefix,
        uri_prefix=r.uri_prefix,
        prefix_synonyms=list(r.prefix_synonyms),
        uri_prefix_synonyms=list(r.uri_prefix_synonyms),
        pattern=r.pattern,
    )


def remap_curie_prefixes(converter: Converter, remapping: Mapping[str, str]) -> Converter:
    """Rename CURIE prefixes; old prefixes become synonyms; clashes are skipped;
    chained remappings are ordered topologically (reference reconciliation.py:39-86)."""
    ordering = _order_curie_remapping(converter, remapping)
    intersection = set(remapping).intersection(remapping.values())
    # The reference mutates its records in place and later lookups observe
    # those mutations (reconciliation.py:50-75) — e.g. the swap
    # {"a": "b", "b": "c"} only works because after b→c is applied, looking
    # up "b" finds nothing. We reproduce that on a working set of copies.
    working = [_copy_record(r) for r in converter.records]
    records = {r.prefix: r for r in working}

    def _lookup(prefix: str) -> Record | None:
        for r in working:
            if r.prefix == prefix or prefix in r.prefix_synonyms:
                return r
        return None

    modified_records = []
    for old, new_prefix in ordering:
        _old_record = _lookup(old)
        _old = _old_record.prefix if _old_record else None
        if _old is None:
            logger.debug("Remapping %s->%s skipped; %s absent", old, new_prefix, old)
            continue

        record = records.pop(_old)
        new_record = _lookup(new_prefix)
        if new_record is not None and record != new_record:
            # would create a clash with a different existing record — skip, but
            # the popped record is still re-appended unchanged
            # (reference reconciliation.py:66-75; Record equality is by value)
            logger.debug("Remapping %s->%s clashes with %r", old, new_prefix, new_record)
        elif old in intersection:
            record.prefix_synonyms = sorted(
                set(record.prefix_synonyms).difference({old, new_prefix})
            )
            record.prefix = new_prefix
        else:
            record.prefix_synonyms = sorted(
                set(record.prefix_synonyms).union({record.prefix}).difference({new_prefix})
            )
            record.prefix = new_prefix
        modified_records.append(record)

    return Converter([*records.values(), *modified_records])


def remap_uri_prefixes(converter: Converter, remapping: Mapping[str, str]) -> Converter:
    """Remap URI prefixes; old URI prefixes become synonyms
    (reference reconciliation.py:89-123)."""
    intersection = set(remapping).intersection(remapping.values())
    if intersection:
        raise TransitiveError(intersection)

    reverse_prefix_map = converter.reverse_prefix_map
    records = []
    for original in converter.records:
        record = _copy_record(original)
        new_uri_prefix = _get_uri_preferred_or_synonym(record, remapping)
        if new_uri_prefix is None:
            pass  # nothing to upgrade
        elif (
            new_uri_prefix in reverse_prefix_map
            and new_uri_prefix not in record.uri_prefix_synonyms
        ):
            pass  # would create a clash, don't do anything
        else:
            record.uri_prefix_synonyms = sorted(
                set(record.uri_prefix_synonyms)
                .union({record.uri_prefix})
                .difference({new_uri_prefix})
            )
            record.uri_prefix = new_uri_prefix
        records.append(record)
    return Converter(records)


def rewire(converter: Converter, rewiring: Mapping[str, str]) -> Converter:
    """CURIE prefix → new canonical URI prefix; old URI prefix becomes a
    synonym; clashes are skipped (reference reconciliation.py:126-167)."""
    reverse_prefix_map = converter.reverse_prefix_map
    records = []
    for original in converter.records:
        record = _copy_record(original)
        new_uri_prefix = _get_curie_preferred_or_synonym(record, rewiring)
        if new_uri_prefix is None:
            pass  # nothing to upgrade
        elif new_uri_prefix == record.uri_prefix:
            pass  # already preferred
        elif (
            new_uri_prefix in reverse_prefix_map
            and new_uri_prefix not in record.uri_prefix_synonyms
        ):
            logger.debug("Rewiring %r to %s would clash; skipping", record, new_uri_prefix)
        else:
            record.uri_prefix_synonyms = sorted(
                set(record.uri_prefix_synonyms)
                .union({record.uri_prefix})
                .difference({new_uri_prefix})
            )
            record.uri_prefix = new_uri_prefix
        records.append(record)
    return Converter(records)


def _get_curie_preferred_or_synonym(
    record: Record, upgrades: Mapping[str, str]
) -> str | None:
    if record.prefix in upgrades:
        return upgrades[record.prefix]
    for s in record.prefix_synonyms:
        if s in upgrades:
            return upgrades[s]
    return None


def _get_uri_preferred_or_synonym(record: Record, upgrades: Mapping[str, str]) -> str | None:
    if record.uri_prefix in upgrades:
        return upgrades[record.uri_prefix]
    for s in record.uri_prefix_synonyms:
        if s in upgrades:
            return upgrades[s]
    return None


def _order_curie_remapping(
    converter: Converter, curie_remapping: Mapping[str, str]
) -> list[tuple[str, str]]:
    """Validate and topologically order a CURIE remapping
    (reference reconciliation.py:204-265)."""
    key_counter = defaultdict(list)
    for key in curie_remapping:
        key_counter[converter.standardize_prefix(key)].append(key)
    duplicate_keys = {
        k: Counter(values)
        for k, values in key_counter.items()
        if len(values) > 1 and k is not None
    }
    if duplicate_keys:
        raise DuplicateKeys(f"Duplicate keys in remapping: {duplicate_keys}")

    value_counter = defaultdict(list)
    for value in curie_remapping.values():
        value_counter[converter.standardize_prefix(value)].append(value)
    duplicate_values = {
        k: Counter(values)
        for k, values in value_counter.items()
        if len(values) > 1 and k is not None
    }
    if duplicate_values:
        raise DuplicateValues(f"Duplicate values in remapping: {duplicate_values}")

    correspondence_counter = defaultdict(set)
    for key, value in curie_remapping.items():
        norm_key = converter.standardize_prefix(key)
        norm_val = converter.standardize_prefix(value)
        correspondence_counter[norm_key].add(key)
        if norm_key != norm_val:
            correspondence_counter[norm_val].add(value)
    duplicate_correspondence = {
        k: Counter(values)
        for k, values in correspondence_counter.items()
        if len(values) > 1 and k is not None
    }
    if duplicate_correspondence:
        raise InconsistentMapping(
            f"Inconsistent usage of prefixes in keys and values: {duplicate_correspondence}"
        )

    if not set(curie_remapping).intersection(curie_remapping.values()):
        return sorted(curie_remapping.items())

    # peel sinks iteratively; a step with no sink means a cycle
    rv = []
    d = dict(curie_remapping)
    while d:
        no_outgoing = set(d.values()).difference(d)
        if not no_outgoing:
            raise CycleDetected("cycle detected in remapping")
        edges = sorted((k, v) for k, v in d.items() if v in no_outgoing)
        rv.extend(edges)
        d = {k: v for k, v in d.items() if v not in no_outgoing}
    return rv
