"""Distributed URI-prefix discovery.

DataFrame twin of /root/reference/src/curies/discovery.py:138-265 (the
driver-scale port lives in :mod:`curies_spark.core.discovery`). The
per-URI delimiter logic compiles to a chain of anchored regexes —
greedy ``(.*<delim>)`` captures everything up to the *last* delimiter,
matching the reference's ``rsplit(delimiter, maxsplit=1)``; the LUID
must be alphanumeric (``[\\p{L}\\p{N}]+`` ≈ ``str.isalnum``).

Aggregation is ``countDistinct(luid)`` per candidate URI prefix — a
partial+final hash aggregate. The final ``ns``-numbering is a
distributed two-phase global sort (range partition → per-partition
row_number → broadcast cumulative offsets), so even a web corpus whose
above-cutoff prefix set is NOT driver-scale numbers without a
single-partition window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..core.converter import Converter
from ..core.discovery import DEFAULT_DELIMITERS
from ..core.record import Record

__all__ = [
    "discover",
    "discover_from_triples",
    "discover_records_df",
    "uri_prefix_candidate_col",
    "uris_from_triples",
]

#: unicode-ish alphanumeric, Java regex class (≈ Python str.isalnum)
_ALNUM = r"[\p{L}\p{N}]+"


def uri_prefix_candidate_col(
    uri: "Column | str", *, delimiters: "Sequence[str] | None" = None
) -> Column:
    """Candidate URI prefix for one URI, or NULL.

    First delimiter (priority order) whose rightmost split yields an
    alphanumeric LUID wins (reference discovery.py:258-264).

    Implemented with ``substring_index(uri, d, -1)`` (the rsplit tail) and
    one anchored ``rlike`` over the *short* LUID instead of a greedy
    ``(.*d)``-style regex over the whole URI — the backtracking full-string
    match costs O(len²) per delimiter, the tail check O(len(luid)).
    """
    c = F.col(uri) if isinstance(uri, str) else uri
    delimiters = tuple(delimiters) if delimiters else DEFAULT_DELIMITERS
    expr: Column = F.lit(None).cast("string")
    for delimiter in reversed(delimiters):
        # tail after the LAST occurrence (== str.rsplit(d, 1)[-1])
        luid = F.substring_index(c, delimiter, -1)
        cond = c.contains(delimiter) & luid.rlike(f"^{_ALNUM}$")
        prefix = F.substring(c, 1, F.length(c) - F.length(luid))
        expr = F.when(cond, prefix).otherwise(expr)
    return expr


def discover_records_df(
    df: DataFrame,
    column: str = "uri",
    *,
    delimiters: "Sequence[str] | None" = None,
    cutoff: "int | None" = None,
    metaprefix: str = "ns",
    converter: "Converter | None" = None,
) -> DataFrame:
    """Distributed discovery → DataFrame of (prefix, uri_prefix, n_luids).

    Mirrors reference discovery.py:138-228: URIs already parsable by the
    given converter are skipped; candidate prefixes with ≥ cutoff
    distinct LUIDs survive; ``ns`` numbering follows the lexicographic
    sort of URI prefixes.
    """
    c = F.col(column)
    # No uris.distinct(): the reference dedups the URI set first
    # (discovery.py:170), but the only downstream consumer is
    # countDistinct(luid) per candidate prefix, which is insensitive to
    # duplicate URIs — dropping the distinct removes a full shuffle of
    # the URI stream.
    uris = df.select(c.alias("uri"))
    # Exclusions (NULL uris; the GitHub-issues special case, reference
    # discovery.py:252-255; already-parsable uris when a converter is
    # given) are FOLDED INTO the candidate expression rather than
    # applied as df.filter(...): a Filter above a derived uri column is
    # pushed to the scan with the derivation re-inlined into the
    # predicate — on a single-task (unsplittable) scan that re-evaluates
    # the whole derivation serially (+60% on the 1-row-group bench
    # layout). Excluded rows instead get a NULL candidate and ride the
    # (NULL, NULL) group that the final numbering filter already drops —
    # same result, zero Filter node, derivation evaluated exactly once,
    # after any fan-out exchange.
    excluded = F.col("uri").isNull() | (
        F.col("uri").startswith("https://github.com")
        & F.col("uri").contains("issues")
    )
    if converter is not None:
        from ..functions.kernels import compress_col

        excluded = excluded | compress_col("uri", converter).isNotNull()

    candidate = F.when(
        ~excluded, uri_prefix_candidate_col("uri", delimiters=delimiters)
    )
    luid = F.expr("substring(uri, length(_uri_prefix) + 1)")
    # NO pre-aggregation filter on the computed candidate: Catalyst
    # substitutes the aliased when-chain into any such predicate and
    # re-evaluates the regex chain at the scan (measured +4-5s on 600k
    # rows at sf0.1; rand()-based barriers don't survive Spark 4's
    # domain-aware simplification). Instead the NULL-candidate group
    # rides through both aggregates as one extra group and is dropped
    # ABOVE the ns-numbering window, which is a pushdown barrier for
    # non-partition columns — the filter then touches ~|prefixes| rows.
    # The distinct count is two-stage — groupBy(prefix, luid) then
    # groupBy(prefix) — which is also the skew-robust form: a hot URI
    # prefix is spread across reducers by the luid in the first-stage
    # key.
    grouped = (
        uris.select(candidate.alias("_uri_prefix"), F.col("uri"))
        .select("_uri_prefix", luid.alias("_luid"))
        .groupBy("_uri_prefix", "_luid")
        .agg(F.lit(1))
        .groupBy("_uri_prefix")
        .agg(F.count(F.lit(1)).alias("n_luids"))
    )
    if cutoff is not None:
        grouped = grouped.filter(F.col("n_luids") >= cutoff)
    # Distributed ns-numbering: the reference requires a GLOBAL
    # lexicographic numbering (discovery.py:217-220), but a bare
    # Window.orderBy is a single-partition sort — fine on a curated
    # corpus whose post-cutoff prefix set is driver-scale, a bottleneck
    # on a messy web corpus at 100× where it need not be. Two phases
    # instead: range-partition on the sort key (partition p holds keys
    # strictly below partition p+1), number within each partition, and
    # add the broadcast cumulative partition counts — global order
    # preserved, no single-partition shuffle anywhere, fully lazy (no
    # driver-side job at plan-construction time, so benches time the
    # real work). NULLS LAST keeps the numbering of real prefixes
    # identical to the null-free sort (the NULL-candidate group sorts
    # after every real prefix and is dropped below).
    # Fail loud instead of silently mis-numbering: the two branches
    # below share one range exchange only because ReuseExchange dedupes
    # them at runtime; with reuse disabled each branch would re-sample
    # its own range boundaries and the broadcast offsets could disagree
    # with the numbering branch's layout.
    reuse_conf = df.sparkSession.conf.get("spark.sql.exchange.reuse", "true")
    if str(reuse_conf).lower() == "false":
        raise RuntimeError(
            "discover's two-phase ns-numbering requires "
            "spark.sql.exchange.reuse (both branches must read one "
            "materialized range exchange)"
        )
    order = F.col("_uri_prefix").asc_nulls_last()
    parts = grouped.repartitionByRange(order).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Per-partition row counts → cumulative offsets. Both this branch
    # and the numbering branch hang off the IDENTICAL range exchange,
    # which ReuseExchange dedupes at runtime (asserted in test_plans):
    # the aggregation + range shuffle run once, and both branches see
    # the same partition layout — the consistency an eager checkpoint
    # would otherwise have to pin, without the eager job. The cumsum is
    # a triangular self-join over ≤ spark.sql.shuffle.partitions rows
    # (bounded by CONFIG, not data) rather than a global window, so no
    # single-partition WindowExec exists anywhere in discovery.
    counts = parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    offsets = (
        counts.alias("a")
        .join(counts.alias("b"), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    w = Window.partitionBy("_pid").orderBy(order)
    return (
        parts.join(F.broadcast(offsets), on="_pid")
        .select(
            F.concat(
                F.lit(metaprefix),
                (F.row_number().over(w) + F.col("_off")).cast("string"),
            ).alias("prefix"),
            F.col("_uri_prefix").alias("uri_prefix"),
            "n_luids",
        )
        .where(F.col("uri_prefix").isNotNull())
    )


#: URI-shaped part of a triple table — the string-table analogue of the
#: reference's ``isinstance(part, rdflib.URIRef)`` check.
_URI_SHAPED = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def uris_from_triples(
    df: DataFrame,
    *,
    columns: "Sequence[str]" = ("subject", "predicate", "object"),
) -> DataFrame:
    """Distinct URIs appearing in any position of a triple table — the
    distributed twin of reference discovery.py:109-135
    (``get_uris_from_rdf`` / ``_yield_uris``): every triple part that is
    a URI (vs a literal/CURIE), deduplicated.

    Plan: ``explode(array(s, p, o))`` → anchored-regex filter →
    ``distinct`` — the only shuffle is the distinct on the (much smaller)
    URI stream, hash-partitioned on the URI itself, so it scales
    uniformly at any corpus size.
    """
    part = F.explode(F.array(*[F.col(c) for c in columns])).alias("uri")
    # contains("://") is a necessary condition for the anchored regex —
    # the cheap codegen'd scan short-circuits the regex for the literal
    # majority of triple parts (predicate semantics unchanged)
    uri_shaped = F.col("uri").contains("://") & F.col("uri").rlike(_URI_SHAPED)
    return df.select(part).where(uri_shaped).distinct()


def discover_from_triples(
    df: DataFrame,
    *,
    columns: "Sequence[str]" = ("subject", "predicate", "object"),
    **kwargs,
) -> DataFrame:
    """Reference ``discover_from_rdf`` (discovery.py:76-106) with the URI
    harvest distributed: URIs from all triple positions feed the
    discovery aggregation."""
    return discover_records_df(
        uris_from_triples(df, columns=columns), "uri", **kwargs
    )


def discover(
    df: DataFrame,
    column: str = "uri",
    **kwargs,
) -> Converter:
    """Distributed discovery → driver-side Converter (collects the tiny
    discovered prefix map, as converters are driver-scale objects)."""
    rows = discover_records_df(df, column, **kwargs).collect()
    return Converter(
        [Record(prefix=r["prefix"], uri_prefix=r["uri_prefix"]) for r in rows]
    )
