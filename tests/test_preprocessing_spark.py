"""Columnar preprocessing pipeline vs the driver-side PreprocessingConverter.

The Spark pipeline (kernels.parse_preprocessed_col) must reproduce the
reference semantics (preprocessing.py:199-263) value-for-value; the
driver-side core implementation is itself ported from the reference and
checked by tests/test_core_modules.py, so this differential closes the
loop without per-row Python in the plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curies_spark.core.converter import Converter
from curies_spark.core.preprocessing import (
    PostprocessingRewrites,
    PreprocessingBlocklists,
    PreprocessingConverter,
    PreprocessingRewrites,
    PreprocessingRules,
)
from curies_spark.functions import kernels


@pytest.fixture(scope="module")
def rules() -> PreprocessingRules:
    return PreprocessingRules(
        rewrites=PreprocessingRewrites(
            full={
                "is_a": "rdf:type",
                "http://creativecommons.org/licenses/by/3.0/": "spdx:CC-BY-3.0",
            },
            prefix={"OMIM:PS": "omim.ps:", "omim:PS": "omim.ps:"},
            resource_prefix={"clo": {"j": "NCIT:"}},
            resource_full={"clo": {"nopeforever": "NCIT:5678"}},
        ),
        blocklists=PreprocessingBlocklists(
            full=["rdf:NOPE"],
            prefix=["axiom"],
            suffix=[":evidence"],
            resource_prefix={"chebi": ["pubmed:"]},
            resource_full={"chebi": ["omim:1356"]},
        ),
        postprocessing=PostprocessingRewrites(suffix={"emedicine": ["-overview"]}),
    )


@pytest.fixture(scope="module")
def inner() -> Converter:
    return Converter.from_prefix_map(
        {
            "GO": "http://purl.obolibrary.org/obo/GO_",
            "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
            "spdx": "https://spdx.org/licenses/",
            "omim.ps": "https://omim.org/phenotypicSeries/",
            "NCIT": "http://purl.obolibrary.org/obo/NCIT_",
            "pubmed": "https://pubmed.ncbi.nlm.nih.gov/",
            "omim": "https://omim.org/entry/",
            "emedicine": "https://emedicine.medscape.com/article/",
        }
    )


VALUES = [
    "is_a",                                               # global full rewrite
    "http://creativecommons.org/licenses/by/3.0/",        # full rewrite of a URI
    "nopeforever",                                        # context full rewrite (clo only)
    "OMIM:PS214100",                                      # global prefix rewrite
    "omim:PS300200",                                      # second prefix rewrite rule
    "j1234",                                              # context prefix rewrite (clo only)
    "rdf:NOPE",                                           # blocked full
    "axiom123",                                           # blocked prefix
    "GO:123:evidence",                                    # blocked suffix
    "omim:1356",                                          # blocked full in chebi context only
    "pubmed:999",                                         # blocked prefix in chebi context only
    "emedicine:1000-overview",                            # postprocess suffix strip
    "emedicine:1000",                                     # no strip needed
    "GO:0032571",                                         # plain CURIE
    "http://purl.obolibrary.org/obo/GO_0032571",          # plain URI
    "unknown:thing",                                      # unparsable
    "justtext",                                           # unparsable, no delimiter
]

CONTEXTS = [None, "clo", "chebi"]


def _expected(conv: PreprocessingConverter, context):
    out = {}
    for v in VALUES:
        rt = conv.parse(v, context=context, block_action="pass")
        out[v] = (rt.prefix, rt.identifier) if rt is not None else None
    return out


@pytest.mark.parametrize("context", CONTEXTS)
def test_parse_preprocessed_matches_driver(spark, rules, inner, context):
    conv = PreprocessingConverter.from_converter(inner, rules)
    expected = _expected(conv, context)

    df = spark.createDataFrame([(v,) for v in VALUES], ["value"])
    parsed = kernels.parse_preprocessed_col("value", inner, rules, context=context)
    got = {
        r["value"]: (
            (r["p"]["prefix"], r["p"]["identifier"]) if r["p"] is not None else None
        )
        for r in df.select("value", parsed.alias("p")).collect()
    }
    assert got == expected


def test_preprocessed_pipeline_is_pure_jvm(spark, rules, inner):
    df = spark.createDataFrame([(v,) for v in VALUES], ["value"])
    out = df.select(
        kernels.compress_or_standardize_preprocessed_col(
            "value", inner, rules
        ).alias("curie")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_preclean_hook(spark, rules, inner):
    df = spark.createDataFrame([("  GO:1  ",)], ["value"])
    parsed = kernels.parse_preprocessed_col(
        "value", inner, rules, preclean=lambda c: F.trim(c)
    )
    [row] = df.select(parsed.alias("p")).collect()
    assert (row["p"]["prefix"], row["p"]["identifier"]) == ("GO", "1")


@pytest.mark.parametrize("context", CONTEXTS)
def test_parse_preprocessed_df_matches_driver(spark, rules, inner, context):
    """DataFrame form: same values, compact plan (no codegen overflow)."""
    conv = PreprocessingConverter.from_converter(inner, rules)
    expected = _expected(conv, context)

    df = spark.createDataFrame([(v,) for v in VALUES], ["value"])
    out = kernels.parse_preprocessed_df(df, "value", inner, rules, context=context)
    got = {
        r["value"]: (
            (r["parsed"]["prefix"], r["parsed"]["identifier"])
            if r["parsed"] is not None
            else None
        )
        for r in out.collect()
    }
    assert got == expected
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "grows beyond" not in plan
    assert len(plan) < 64_000


def test_random_rules_columnar_matches_driver(spark):
    """Seeded randomized differential for the columnar preprocessing
    pipeline: random rules + random converters + probes aimed at every
    rule family (incl. unicode and near-miss shapes) must match the
    driver-side PreprocessingConverter value-for-value."""
    import random

    for seed in range(6):
        rng = random.Random(1000 + seed)
        prefixes = [f"p{i}" for i in range(rng.randint(2, 5))]
        conv = Converter.from_prefix_map(
            {p: f"http://{p}.example.org/{rng.choice(['', 'id/', 'x#'])}" for p in prefixes}
        )
        base = conv.prefix_map[prefixes[0]]
        ident = lambda: "".join(  # noqa: E731
            rng.choice("ab1:_.é-") for _ in range(rng.randint(0, 6))
        )
        target = f"{rng.choice(prefixes)}:{ident()}"
        context = rng.choice([None, "ctx"])
        rules = PreprocessingRules(
            rewrites=PreprocessingRewrites(
                full={"oldform": target} if rng.random() < 0.7 else {},
                resource_full={"ctx": {"ctxform": target}} if rng.random() < 0.5 else {},
                prefix={"OLD_": base} if rng.random() < 0.7 else {},
                resource_prefix={"ctx": {"CTX_": base}} if rng.random() < 0.5 else {},
            ),
            blocklists=PreprocessingBlocklists(
                full=[base + "BLOCKED"] if rng.random() < 0.7 else [],
                prefix=[base[: len(base) // 2]] if rng.random() < 0.3 else [],
                suffix=[":ev"] if rng.random() < 0.5 else [],
                resource_full={"ctx": ["ctxblocked"]} if rng.random() < 0.5 else {},
                resource_prefix={"ctx": [f"{prefixes[-1]}:"]} if rng.random() < 0.3 else {},
            ),
            postprocessing=PostprocessingRewrites(
                suffix={prefixes[0]: [".x"]} if rng.random() < 0.7 else {}
            ),
        )
        probes = []
        for _ in range(50):
            kind = rng.randint(0, 8)
            p = rng.choice(prefixes)
            if kind == 0:
                probes.append("oldform")
            elif kind == 1:
                probes.append("ctxform")
            elif kind == 2:
                probes.append("OLD_" + ident())
            elif kind == 3:
                probes.append("CTX_" + ident())
            elif kind == 4:
                probes.append(base + "BLOCKED")
            elif kind == 5:
                probes.append(f"{p}:{ident()}:ev")
            elif kind == 6:
                probes.append(conv.prefix_map[p] + ident())
            elif kind == 7:
                probes.append(f"{prefixes[0]}:{ident()}.x")
            else:
                probes.append(ident())

        pconv = PreprocessingConverter.from_converter(conv, rules)
        want = {}
        for v in probes:
            rt = pconv.parse(v, context=context, block_action="pass")
            want[v] = (rt.prefix, rt.identifier) if rt is not None else None

        df = spark.createDataFrame([(v,) for v in probes], ["value"])
        out = kernels.parse_preprocessed_df(df, "value", conv, rules, context=context)
        for row in out.collect():
            got = (
                (row["parsed"]["prefix"], row["parsed"]["identifier"])
                if row["parsed"] is not None
                else None
            )
            assert got == want[row["value"]], (seed, context, row["value"])
