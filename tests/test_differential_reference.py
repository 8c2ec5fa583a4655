"""Differential oracle: our Spark engine vs the reference `curies` library.

BASELINE.json's north rule requires the emitted triples and the
compress/expand behavior to match the reference converter at P/R >= 0.95.
This suite runs the *actual* reference implementation
(/root/reference/src/curies, in-process, driver-side) on the same
deterministic synthetic corpus and compares value-by-value:

- compress / expand / standardize columns: exact agreement required.
- emitted (subject, predicate, object) triples of the full KG pipeline:
  precision and recall computed against a driver-side re-derivation that
  uses the reference converter for every linking/expansion decision.

The reference is imported read-only with a `pystow` I/O stub (that module
is not installed in the sandbox and is only needed for its file readers,
which this test never touches).
"""

from __future__ import annotations

import re
import sys
import types

import pytest
from pyspark.sql import functions as F

from curies_spark.functions import SparkConverter
from curies_spark.plans.pipeline import (
    CURIE_MENTION_RE,
    URI_MENTION_RE,
    build_triples,
    extract_mentions,
    link_mentions,
)
from curies_spark.sources.synthetic import PIPELINE_EPM, generate_repos, pipeline_converter

REFERENCE_SRC = "/root/reference/src"


def _load_reference():
    if "pystow" not in sys.modules:
        pystow = types.ModuleType("pystow")
        utils = types.ModuleType("pystow.utils")
        utils.safe_open_reader = lambda *a, **k: None
        utils.safe_open_writer = lambda *a, **k: None
        pystow.utils = utils
        sys.modules["pystow"] = pystow
        sys.modules["pystow.utils"] = utils
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import curies as reference_curies

    return reference_curies


try:
    ref = _load_reference()
except Exception:  # pragma: no cover - reference unavailable
    ref = None

pytestmark = pytest.mark.skipif(ref is None, reason="reference library unavailable")

N_FILES = 400


@pytest.fixture(scope="module")
def ref_converter():
    return ref.Converter.from_extended_prefix_map(PIPELINE_EPM)


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_repos(spark, N_FILES).cache()


def _pr(ours: set, theirs: set) -> "tuple[float, float]":
    if not ours or not theirs:
        return (float(not theirs), float(not ours))
    tp = len(ours & theirs)
    return tp / len(ours), tp / len(theirs)


def test_compress_matches_reference(spark, corpus, ref_converter):
    """Every mention compresses identically to reference Converter.compress."""
    sc = SparkConverter(spark, pipeline_converter())
    mentions = extract_mentions(corpus).select("mention").distinct()
    got = {
        (r["mention"], r["curie"])
        for r in mentions.select(
            "mention", sc.compress("mention").alias("curie")
        ).collect()
    }
    want = {
        (m, ref_converter.compress(m)) for m, _ in got
    }
    assert got == want


def test_expand_matches_reference(spark, corpus, ref_converter):
    """CURIE mentions expand identically to reference Converter.expand."""
    sc = SparkConverter(spark, pipeline_converter())
    curies_df = (
        extract_mentions(corpus)
        .select("mention")
        .filter(~F.col("mention").startswith("http"))
        .distinct()
    )
    got = {
        (r["mention"], r["uri"])
        for r in curies_df.select("mention", sc.expand("mention").alias("uri")).collect()
    }
    want = {(m, ref_converter.expand(m)) for m, _ in got}
    assert got == want


def test_standardize_matches_reference(spark, corpus, ref_converter):
    sc = SparkConverter(spark, pipeline_converter())
    curies_df = (
        extract_mentions(corpus)
        .select("mention")
        .filter(~F.col("mention").startswith("http"))
        .distinct()
    )
    got = {
        (r["mention"], r["std"])
        for r in curies_df.select(
            "mention", sc.standardize_curie("mention").alias("std")
        ).collect()
    }
    want = {(m, ref_converter.standardize_curie(m)) for m, _ in got}
    assert got == want


def _reference_triples(rows, ref_converter) -> set:
    """Driver-side re-derivation of the KG edges using the REFERENCE
    converter for every decision (linking, prefix, expand_all)."""
    uri_re = re.compile(URI_MENTION_RE)
    curie_re = re.compile(CURIE_MENTION_RE)
    triples: set = set()
    repo_entities: set = set()
    for row in rows:
        mentions = uri_re.findall(row["content"])
        mentions += curie_re.findall(uri_re.sub(" ", row["content"]))
        for mention in mentions:
            entity = ref_converter.compress_or_standardize(mention)
            if entity is None:
                continue
            file_ref = f"codefile:{row['repo']}@{row['commit']}/{row['path']}"
            triples.add((file_ref, "cs:mentions", entity))
            repo_entities.add((row["repo"], entity))
    for repo, entity in repo_entities:
        prefix = entity.split(":", 1)[0]
        triples.add((f"coderepo:{repo}", "cs:declaresPrefix", f"csprefix:{prefix}"))
        for uri in ref_converter.expand_all(entity) or ():
            triples.add((entity, "owl:sameAs", uri))
    return triples


def test_pipeline_triples_pr_vs_reference(spark, corpus, ref_converter):
    """Full-pipeline differential: P/R of emitted (s,p,o) vs the
    reference-converter derivation. north_rule threshold is 0.95; we hold
    exact equality."""
    sc = SparkConverter(spark, pipeline_converter())
    linked = link_mentions(extract_mentions(corpus), sc.broadcast)
    ours = {
        (r["subject"], r["predicate"], r["object"])
        for r in build_triples(linked, sc.broadcast).collect()
    }
    theirs = _reference_triples(corpus.collect(), ref_converter)
    precision, recall = _pr(ours, theirs)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert ours == theirs  # stronger: exact


def test_vocabulary_parity_with_reference():
    """Every public NamedReference constant (and collection) of the
    reference's curies.vocabulary exists here under the same name with
    equal (prefix, identifier) — reference vocabulary.py:15-384."""
    import curies.vocabulary as ref_v

    from curies_spark.core import vocabulary as our_v

    ref_named = {
        name: val
        for name, val in vars(ref_v).items()
        if not name.startswith("_") and isinstance(val, ref.NamedReference)
    }
    assert len(ref_named) >= 90
    missing, mismatched = [], []
    for name, rv in ref_named.items():
        ov = getattr(our_v, name, None)
        if ov is None:
            missing.append(name)
        elif (ov.prefix, ov.identifier) != (rv.prefix, rv.identifier):
            mismatched.append((name, ov.curie, rv.curie))
    assert not missing, f"missing constants: {missing}"
    assert not mismatched, f"pair mismatches: {mismatched}"

    # collections agree as (prefix, identifier) sets/sequences
    def pairs(c):
        return [(r.prefix, r.identifier) for r in c]

    assert set(pairs(our_v.matching_processes)) == set(pairs(ref_v.matching_processes))
    assert set(pairs(our_v.synonym_types)) == set(pairs(ref_v.synonym_types))
    assert pairs(our_v.match_typedefs) == pairs(ref_v.match_typedefs)
    assert pairs(our_v.extended_match_typedefs) == pairs(ref_v.extended_match_typedefs)
    assert set(our_v.synonym_scopes) == set(ref_v.synonym_scopes)
    assert our_v.synonym_scope_to_oio == ref_v.synonym_scope_to_oio
    assert {
        (k.prefix, k.identifier): (v.prefix, v.identifier)
        for k, v in our_v.inversions.items()
    } == {
        (k.prefix, k.identifier): (v.prefix, v.identifier)
        for k, v in ref_v.inversions.items()
    }

    # zero missing NAMES of any kind: every public name the reference
    # vocabulary module defines (constants, dicts, tuples, and the
    # typing.Literal aliases SynonymScope / SynonymScopeOIO /
    # SemanticMappingScope) resolves here too
    import curies_spark.vocabulary as our_top

    ref_public = [
        name
        for name, val in vars(ref_v).items()
        if not name.startswith("_")
        and not isinstance(val, type(ref_v))  # skip submodule imports
        and name not in {"TypeAlias", "Literal", "NamedReference", "Reference"}
    ]
    missing_names = [n for n in ref_public if not hasattr(our_v, n)]
    assert not missing_names, f"vocabulary names missing: {missing_names}"
    # and the top-level module alias mirrors curies.vocabulary
    assert all(hasattr(our_top, n) for n in ref_public)


def test_triples_filters_match_reference(spark):
    """All §2.4 prefix filters + the M:N ops, run IN-PROCESS against the
    reference's own triples module on random triple sets — set-equality
    of the surviving (s, p, o) tuples for every operator."""
    import random

    from curies.triples import Triple as RefTriple
    from curies.triples import filters as ref_filters
    from curies.triples import ops as ref_ops

    from curies_spark.operators import triples as T

    def spo_set(items):
        return {(t.subject.curie, t.predicate.curie, t.object.curie) for t in items}

    for seed in range(5):
        rng = random.Random(seed)
        prefixes = ["a", "b", "c", "d"]

        def curie():
            return f"{rng.choice(prefixes)}:{rng.randint(1, 6)}"

        rows = sorted({(curie(), curie(), curie()) for _ in range(rng.randint(8, 50))})
        ref_triples = [RefTriple.from_curies(s, p, o) for s, p, o in rows]
        df = spark.createDataFrame(rows, ["subject", "predicate", "object"])
        keep = set(rng.sample(prefixes, 2))

        cases = [
            (T.keep_prefixes_both(df, keep),
             ref_filters.keep_prefixes_both(ref_triples, keep)),
            (T.keep_prefixes_either(df, keep),
             ref_filters.keep_prefixes_either(ref_triples, keep)),
            (T.keep_subject_prefixes(df, keep),
             ref_filters.keep_subject_prefixes(ref_triples, keep)),
            (T.keep_object_prefixes(df, keep),
             ref_filters.keep_object_prefixes(ref_triples, keep)),
            (T.exclude_prefixes_both(df, keep),
             ref_filters.exclude_prefixes_both(ref_triples, keep)),
            (T.exclude_subject_prefixes(df, keep),
             ref_filters.exclude_subject_prefixes(ref_triples, keep)),
            (T.exclude_object_prefixes(df, keep),
             ref_filters.exclude_object_prefixes(ref_triples, keep)),
            (T.exclude_same_prefixes(df),
             ref_filters.exclude_same_prefixes(ref_triples)),
            (T.get_prefix_stratified_many_to_many(df).distinct(),
             ref_ops.get_prefix_stratified_many_to_many(ref_triples)),
            (T.exclude_prefix_stratified_many_to_many(df),
             ref_ops.exclude_prefix_stratified_many_to_many(ref_triples)),
        ]
        for i, (ours_df, theirs) in enumerate(cases):
            got = {
                (r["subject"], r["predicate"], r["object"])
                for r in ours_df.collect()
            }
            assert got == spo_set(theirs), (seed, i, keep)
