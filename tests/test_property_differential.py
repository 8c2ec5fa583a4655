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


# ---------------------------------------------------------------------------
# chain + reconciliation parity
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(_case(), _epm())
def test_random_chain_agreement(case, records_b):
    """chain(): first-wins priority merge parity on random converter pairs."""
    from curies_spark.core.converter import chain as our_chain

    records_a, probes = case
    ours_a, theirs_a, *_ = _build_both(records_a)
    ours_b, theirs_b, *_ = _build_both(records_b)
    if None in (ours_a, ours_b, theirs_a, theirs_b):
        return
    # exception parity: multi-match merges raise on BOTH sides
    # (reference api.py:1005-1007 "new record has duplicates")
    try:
        ours = our_chain([ours_a, ours_b])
        ours_exc = None
    except Exception as e:  # noqa: BLE001
        ours, ours_exc = None, type(e).__name__
    try:
        theirs = ref.chain([theirs_a, theirs_b])
        theirs_exc = None
    except Exception as e:  # noqa: BLE001
        theirs, theirs_exc = None, type(e).__name__
    assert (ours is None) == (theirs is None), (ours_exc, theirs_exc)
    if ours is None:
        return
    assert {r.prefix for r in ours.records} == {r.prefix for r in theirs.records}
    for record in theirs.records:
        got = ours.get_record(record.prefix)
        assert got is not None, record.prefix
        assert got.uri_prefix == record.uri_prefix, record.prefix
        assert sorted(got.prefix_synonyms) == sorted(record.prefix_synonyms)
        assert sorted(got.uri_prefix_synonyms) == sorted(record.uri_prefix_synonyms)
    for s in probes:
        for op in OPS:
            assert _outcome(ours, op, s) == _outcome(theirs, op, s), (op, s)


@settings(max_examples=60, deadline=None)
@given(_case(), st.data())
def test_random_remap_rewire_agreement(case, data):
    """remap_curie_prefixes / rewire parity on random remappings,
    including clash-skip and error behavior."""
    from curies_spark.core.reconciliation import remap_curie_prefixes, rewire

    import curies.reconciliation as ref_rec

    records, probes = case
    ours, theirs, *_ = _build_both(records)
    if ours is None:
        return
    prefixes = [r["prefix"] for r in records]
    n = data.draw(st.integers(1, min(3, len(prefixes))))
    olds = data.draw(
        st.lists(st.sampled_from(prefixes), min_size=n, max_size=n, unique=True)
    )
    news = data.draw(
        st.lists(_prefix, min_size=n, max_size=n, unique_by=str.lower)
    )
    remapping = dict(zip(olds, news))

    def run(fn, conv, mapping):
        try:
            return ("ok", fn(conv, mapping))
        except Exception as e:  # noqa: BLE001
            return ("raised", type(e).__name__)

    got_kind, got = run(remap_curie_prefixes, ours, remapping)
    want_kind, want = run(ref_rec.remap_curie_prefixes, theirs, remapping)
    assert got_kind == want_kind, (remapping, got, want)
    if got_kind == "ok":
        for s in probes:
            assert _outcome(got, "compress_or_standardize", s) == _outcome(
                want, "compress_or_standardize", s
            ), ("remap", remapping, s)

    # rebuild: the REFERENCE mutates the input converter's records in
    # place during remapping (documented deviation — ours is pure), so
    # `theirs` is unusable after the call above
    ours, theirs, *_ = _build_both(records)
    rewiring = {
        data.draw(st.sampled_from(prefixes)): f"https://rewired.example.org/{data.draw(_host)}/"
    }
    got_kind, got = run(rewire, ours, rewiring)
    want_kind, want = run(ref_rec.rewire, theirs, rewiring)
    assert got_kind == want_kind, (rewiring, got, want)
    if got_kind == "ok":
        for s in probes:
            assert _outcome(got, "compress", s) == _outcome(want, "compress", s), (
                "rewire",
                rewiring,
                s,
            )


# ---------------------------------------------------------------------------
# discovery differential: random URI lists, exact discovered-prefix parity
# ---------------------------------------------------------------------------

_uri_tail = st.sampled_from(["/", "#", "_"])


@st.composite
def _uri_pool(draw):
    """URIs clustered over a few candidate prefixes + freeform noise —
    the delimiter-priority and cutoff logic's food."""
    n_bases = draw(st.integers(1, 4))
    bases = [
        f"http://{draw(_host)}.example.org/{draw(_host)}{draw(_uri_tail)}"
        for _ in range(n_bases)
    ]
    uris = []
    for _ in range(draw(st.integers(1, 20))):
        kind = draw(st.integers(0, 3))
        if kind < 2:
            uris.append(draw(st.sampled_from(bases)) + draw(_identifier))
        elif kind == 2:  # nested delimiters → prefix-priority decisions
            uris.append(
                draw(st.sampled_from(bases))
                + draw(_host)
                + draw(_uri_tail)
                + draw(_identifier)
            )
        else:
            uris.append(draw(st.text(min_size=0, max_size=25)))
    return uris


@settings(max_examples=100, deadline=None)
@given(_uri_pool(), st.integers(1, 3))
def test_random_discover_agreement(uris, cutoff):
    from curies_spark.core.discovery import discover

    ref_conv = ref.discover(uris, cutoff=cutoff)
    our_conv = discover(uris, cutoff=cutoff)
    theirs = {(r.prefix, r.uri_prefix) for r in ref_conv.records}
    ours = {(r.prefix, r.uri_prefix) for r in our_conv.records}
    assert ours == theirs, (uris, cutoff)


# ---------------------------------------------------------------------------
# w3c differential: random strings, exact predicate parity
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        st.text(min_size=0, max_size=20),
        st.from_regex(r"[A-Za-z_][\w.\-]{0,10}:?[\w.%/#\-]{0,12}", fullmatch=True),
    )
)
def test_random_w3c_agreement(s):
    from curies_spark.core.w3c import is_w3c_curie, is_w3c_prefix

    import curies.w3c as ref_w3c

    assert is_w3c_prefix(s) == ref_w3c.is_w3c_prefix(s), ("prefix", s)
    assert is_w3c_curie(s) == ref_w3c.is_w3c_curie(s), ("curie", s)


# ---------------------------------------------------------------------------
# preprocessing differential: random rules, exact parse parity
# ---------------------------------------------------------------------------


@st.composite
def _rules_and_probes(draw, records):
    """A random ruleset derived from the EPM (so rules actually fire) and
    probes aimed at every rule family."""
    record = draw(st.sampled_from(records))
    base = record["uri_prefix"]
    ident = draw(_identifier)
    target_curie = f"{record['prefix']}:{draw(_identifier)}"
    context = draw(st.sampled_from(["ctx", None]))

    rules: dict = {"blocklists": {}, "rewrites": {}, "postprocessing": {}}
    probes = []

    if draw(st.booleans()):
        blocked_full = base + "BLOCKED"
        key = draw(st.sampled_from(["full", "resource_full"]))
        rules["blocklists"][key] = (
            {"ctx": [blocked_full]} if key == "resource_full" else [blocked_full]
        )
        probes.append(blocked_full)
    if draw(st.booleans()):
        rules["blocklists"]["prefix"] = [base[: max(4, len(base) // 2)]]
        probes.append(base + ident)
    if draw(st.booleans()):
        rules["blocklists"]["suffix"] = [ident[-2:] or "zz"]
        probes.append(base + ident)
    if draw(st.booleans()):
        rewritten_full = "oldform:" + ident
        key = draw(st.sampled_from(["full", "resource_full"]))
        rules["rewrites"][key] = (
            {"ctx": {rewritten_full: target_curie}}
            if key == "resource_full"
            else {rewritten_full: target_curie}
        )
        probes.append(rewritten_full)
    if draw(st.booleans()):
        rules["rewrites"]["prefix"] = {"OLD_": base}
        probes.append("OLD_" + ident)
    if draw(st.booleans()):
        rules["postprocessing"]["suffix"] = {record["prefix"]: [".x"]}
        probes.append(base + ident + ".x")

    probes.append(base + ident)  # plain hit
    probes.append(draw(st.text(min_size=0, max_size=15)))  # noise
    return rules, probes, context


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_random_preprocessing_agreement(data):
    from curies_spark.core.preprocessing import PreprocessingConverter, PreprocessingRules

    records = data.draw(_epm())
    ours_base, theirs_base, exc_o, exc_t = _build_both(records)
    assert exc_o == exc_t
    if ours_base is None:
        return
    rules_dict, probes, context = data.draw(_rules_and_probes(records))

    ours = PreprocessingConverter.from_converter(
        ours_base, PreprocessingRules.from_dict(rules_dict)
    )
    import curies.preprocessing as ref_pre

    theirs = ref_pre.PreprocessingConverter.from_converter(
        theirs_base, ref_pre.PreprocessingRules.model_validate(rules_dict)
    )

    for block_action in ("pass", "raise"):
        for s in probes:
            def run(conv):
                try:
                    rv = conv.parse(s, context=context, block_action=block_action)
                except Exception as e:  # noqa: BLE001
                    return ("raised", type(e).__name__)
                if rv is None:
                    return ("ok", None)
                return ("ok", (rv.prefix, rv.identifier))

            assert run(ours) == run(theirs), (rules_dict, s, context, block_action)


# ---------------------------------------------------------------------------
# Bloom filter invariants (driver-side, no Spark — the distributed build
# shares the same _set_bits/_hash_pair definitions)
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    values=st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=60),
    others=st.lists(st.text(min_size=0, max_size=30), min_size=0, max_size=30),
    expected=st.integers(1, 500),
    fpp=st.floats(0.001, 0.5),
)
def test_bloom_never_forgets(values, others, expected, fpp):
    """NO false negatives, for any value set and any (even badly
    undersized) sizing — the property exclude_seen's exactness rests
    on. Disjoint values may collide (that's fpp), but membership of
    every inserted value is guaranteed."""
    import numpy as np

    from curies_spark.operators.bloom import (
        BloomFilter,
        _hash_pair,
        _plan_bits,
        _set_bits,
    )

    m, k = _plan_bits(expected, fpp)
    bits = np.zeros(m // 8, dtype=np.uint8)
    arr = np.array(values, dtype=object)
    _set_bits(bits, arr, k, m)
    bf = BloomFilter(bitmap=bits.tobytes(), m_bits=m, k=k, n_items=len(values))

    h1, h2 = _hash_pair(arr)
    assert bf.contains_many(h1, h2).all()

    # non-members are only ever wrongly POSITIVE, never change members
    disjoint = [o for o in others if o not in set(values)]
    if disjoint:
        oh1, oh2 = _hash_pair(np.array(disjoint, dtype=object))
        bf.contains_many(oh1, oh2)  # must not raise; value is fpp-bounded


@settings(max_examples=60, deadline=None)
@given(expected=st.integers(1, 10**7), fpp=st.floats(0.0001, 0.9))
def test_bloom_sizing_sane(expected, fpp):
    from curies_spark.operators.bloom import _plan_bits

    m, k = _plan_bits(expected, fpp)
    assert m % 8 == 0 and m >= 64
    assert 1 <= k <= 64
