"""Property-based differential: random EPMs + inputs, our core Converter
vs the reference library, exact agreement on every operation.

Complements the corpus differential (test_differential_reference.py)
with adversarial shapes hypothesis finds: overlapping URI prefixes,
synonym collisions with canonical forms, multi-colon identifiers, empty
identifiers, unicode, near-miss URIs.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from curies_spark.core.converter import Converter

from test_differential_reference import _load_reference

try:
    ref = _load_reference()
except Exception:  # pragma: no cover
    ref = None

pytestmark = pytest.mark.skipif(ref is None, reason="reference library unavailable")

_prefix = st.from_regex(r"[A-Za-z][A-Za-z0-9.]{0,8}", fullmatch=True)
_host = st.from_regex(r"[a-z][a-z0-9]{0,8}", fullmatch=True)
_tail = st.sampled_from(["/", "#", "_", ":", "/id/"])
_identifier = st.from_regex(r"[A-Za-z0-9:._\-]{0,12}", fullmatch=True)


@st.composite
def _epm(draw):
    n = draw(st.integers(1, 6))
    prefixes = draw(
        st.lists(_prefix, min_size=n, max_size=n, unique_by=str.lower)
    )
    records = []
    seen_uris: set[str] = set()
    for i, p in enumerate(prefixes):
        host = draw(_host)
        uri_prefix = f"http://{host}.example.org{draw(_tail)}"
        if i % 2 and records:
            # overlap: extend a previous record's URI prefix (longest-match food)
            uri_prefix = records[i - 1]["uri_prefix"] + draw(_prefix) + "_"
        if uri_prefix in seen_uris:
            uri_prefix = f"{uri_prefix}{i}/"
        seen_uris.add(uri_prefix)
        record = {"prefix": p, "uri_prefix": uri_prefix}
        if draw(st.booleans()):
            synonym = f"https://alt{i}.example.net/{draw(_host)}/"
            if synonym not in seen_uris:
                seen_uris.add(synonym)
                record["uri_prefix_synonyms"] = [synonym]
        records.append(record)
    return records


@st.composite
def _probe(draw, records):
    """A probe string: derived from the EPM (hit-shaped) or free noise."""
    kind = draw(st.integers(0, 4))
    record = draw(st.sampled_from(records))
    ident = draw(_identifier)
    if kind == 0:
        return record["uri_prefix"] + ident
    if kind == 1:
        synonyms = record.get("uri_prefix_synonyms") or [record["uri_prefix"]]
        return draw(st.sampled_from(synonyms)) + ident
    if kind == 2:
        return f"{record['prefix']}:{ident}"
    if kind == 3:
        return record["uri_prefix"][:-1]  # one char short of the prefix
    return draw(st.text(min_size=0, max_size=20))


@st.composite
def _case(draw):
    records = draw(_epm())
    probes = draw(st.lists(_probe(records), min_size=1, max_size=8))
    return records, probes


def _build_both(records):
    try:
        ours = Converter.from_extended_prefix_map(records)
        exc_ours = None
    except Exception as e:
        ours, exc_ours = None, type(e).__name__
    try:
        theirs = ref.Converter.from_extended_prefix_map(records)
        exc_theirs = None
    except Exception as e:
        theirs, exc_theirs = None, type(e).__name__
    return ours, theirs, exc_ours, exc_theirs


OPS = (
    "compress",
    "expand",
    "standardize_curie",
    "standardize_uri",
    "compress_or_standardize",
    "expand_or_standardize",
    "expand_all",
)


def _outcome(conv, op, s):
    """Result value, or the exception TYPE NAME — exception parity matters
    too (e.g. both raise NoCURIEDelimiterError on delimiter-less expand,
    reference utils.py:22-27)."""
    try:
        rv = getattr(conv, op)(s)
    except Exception as e:  # noqa: BLE001
        return ("raised", type(e).__name__)
    if op == "expand_all" and rv is not None:
        rv = list(rv)
    return ("ok", rv)


@settings(max_examples=150, deadline=None)
@given(_case())
def test_random_epm_agreement(case):
    records, probes = case
    ours, theirs, exc_ours, exc_theirs = _build_both(records)
    # both reject or both accept (duplicate validation parity)
    assert (ours is None) == (theirs is None), (exc_ours, exc_theirs, records)
    if ours is None:
        return
    for s in probes:
        for op in OPS:
            assert _outcome(ours, op, s) == _outcome(theirs, op, s), (op, s)
