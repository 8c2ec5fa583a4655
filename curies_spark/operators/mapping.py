"""Data-scale mapping-service twin: sameAs edges over a URI column.

Reference mapping_service answers one SPARQL VALUES block per request
(mapping_service/api.py:105-118); at corpus scale the same question is
"for every URI in this table, give all equivalent URIs" — a single
broadcast-converter pass, no service round-trips.
"""

from __future__ import annotations

from typing import Collection

from pyspark.sql import Column, DataFrame, functions as F

from ..core.converter import Converter
from ..core.mapping_service import DEFAULT_MAPPING_PREDICATE
from ..functions import kernels

__all__ = ["sameas_edges"]

#: rdflib ``_is_valid_uri`` complement (core.mapping_service), Java regex
_INVALID_URI_CHARS = r'[\s<>"{}|\\^`]'


def sameas_edges(
    df: DataFrame,
    converter: Converter,
    *,
    column: str = "uri",
    predicates: "str | Collection[str] | None" = None,
) -> DataFrame:
    """(subject, predicate, object) mapping edges for every parsable URI.

    Semantics per reference mapping_service/api.py:96-118 with the
    subject bound: parse the URI against the converter, expand through
    every URI prefix (synonyms included), drop invalid IRIs, and emit
    one edge per (equivalent URI × mapping predicate).

    Plan: compress (native when-chain or Arrow kernel) → map-literal
    ``expand_all`` → explode × predicate array — fully pipelined with
    the scan, no shuffle, converter broadcast once per executor.
    """
    if predicates is None:
        preds = [DEFAULT_MAPPING_PREDICATE]
    elif isinstance(predicates, str):
        preds = [predicates]
    else:
        preds = sorted(predicates)

    uri: Column = F.col(column)
    # parse_uri == compress to the canonical CURIE, then expand_all over
    # it enumerates every (uri_prefix synonym) expansion
    curie = kernels.compress_col(column, converter)
    expansions = kernels.expand_all_col(curie, converter)
    return (
        df.select(uri.alias("subject"), expansions.alias("_objects"))
        .where(F.col("_objects").isNotNull())
        .select(
            "subject",
            F.explode(F.array(*[F.lit(p) for p in preds])).alias("predicate"),
            F.col("_objects").alias("_objects"),
        )
        .select(
            "subject",
            "predicate",
            F.explode("_objects").alias("object"),
        )
        .where(~F.col("object").rlike(_INVALID_URI_CHARS))
    )
