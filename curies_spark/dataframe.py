"""Import-path parity for ``curies.dataframe`` (reference
src/curies/dataframe.py) — CURIE-column dataframe utilities, Spark
edition: where the reference returns a pandas boolean Series to index
the frame with, the ``get_filter_*_index`` twins here return a boolean
:class:`~pyspark.sql.Column` to pass to ``df.filter(...)`` / ``where``
(a distributed frame has no positional index). The filter/index
operators themselves live in :mod:`curies_spark.operators.triples`.
"""

from __future__ import annotations

from typing import Collection

from pyspark.sql import Column, DataFrame, functions as F

from .operators.triples import (
    curie_prefix,
    filter_df_by_curies,
    filter_df_by_prefixes,
    get_df_curies_index,
    get_df_prefixes_index,
    get_df_unique_prefixes,
)

__all__ = [
    "PrefixIndexMethod",
    "filter_df_by_curies",
    "filter_df_by_prefixes",
    "get_df_curies_index",
    "get_df_prefixes_index",
    "get_df_unique_prefixes",
    "get_filter_df_by_curies_index",
    "get_filter_df_by_prefixes_index",
]

#: reference dataframe.py:80 — "iterative" tests string prefixes
#: directly; "precalculated" extracts the prefix once then
#: set-membership (with optional converter standardization)
PrefixIndexMethod = str


def get_filter_df_by_prefixes_index(
    df: DataFrame,
    *,
    column: str,
    prefixes: "str | Collection[str]",
    method: "str | None" = None,
    validate: bool = False,
    converter=None,
) -> Column:
    """Boolean column: does the CURIE in ``column`` carry one of the
    prefixes (reference dataframe.py:83-145)? ``precalculated``
    standardizes the extracted prefix through the converter first."""
    if method in (None, "iterative"):
        plist = [prefixes] if isinstance(prefixes, str) else list(prefixes)
        cond = F.lit(False)
        for p in plist:
            cond = cond | F.col(column).startswith(p + ":")
        return cond
    if method == "precalculated":
        if converter is None:
            raise ValueError("a converter is required for method B")
        prefix_col = curie_prefix(column)
        if validate:
            from .functions.kernels import standardize_prefix_col

            std = standardize_prefix_col(prefix_col, converter)
            # the reference's validate=True raises on any CURIE whose
            # prefix the converter doesn't know (strict parse_curie);
            # the distributed twin raises AT EXECUTION via raise_error
            # instead of silently NULLing the row out of the filter
            prefix_col = F.coalesce(
                std,
                F.raise_error(
                    F.concat(
                        F.lit("could not standardize prefix of CURIE: "),
                        F.col(column),
                    )
                ),
            )
        if isinstance(prefixes, str):
            return prefix_col == prefixes
        return prefix_col.isin(list(prefixes))
    raise ValueError(f"invalid method given: {method}")


def get_filter_df_by_curies_index(
    df: DataFrame, *, column: str, curies: "str | Collection[str]"
) -> Column:
    """Boolean column: is the CURIE in the given set (reference
    dataframe.py:214-226)?"""
    if isinstance(curies, str):
        return F.col(column) == curies
    return F.col(column).isin(list(set(curies)))
