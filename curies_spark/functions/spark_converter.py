"""SparkConverter: the broadcast-backed user-facing facade.

Wraps a driver-side :class:`curies_spark.core.Converter` plus its
``SparkContext.broadcast`` handle and exposes every conversion kernel as
a Column-producing method — the Spark twin of the reference's ``pd_*``
pandas surface (/root/reference/src/curies/api.py:2445-2583).

The converter is broadcast ONCE per SparkConverter; all pandas-UDF
kernels defer ``broadcast.value`` into the executor so the payload
ships via the broadcast mechanism (torrent-style, once per executor)
rather than inside each serialized task closure.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession

from ..core.converter import Converter
from . import kernels

__all__ = ["SparkConverter"]


class SparkConverter:
    """A Converter bound to a SparkSession via broadcast."""

    def __init__(self, spark: SparkSession, converter: Converter) -> None:
        self.spark = spark
        self.converter = converter
        self.broadcast = spark.sparkContext.broadcast(converter)

    # -- constructors mirroring the core ----------------------------------

    @classmethod
    def from_prefix_map(cls, spark: SparkSession, prefix_map: Any, **kw: Any) -> "SparkConverter":
        return cls(spark, Converter.from_prefix_map(prefix_map, **kw))

    @classmethod
    def from_extended_prefix_map(
        cls, spark: SparkSession, records: Any, **kw: Any
    ) -> "SparkConverter":
        return cls(spark, Converter.from_extended_prefix_map(records, **kw))

    @classmethod
    def from_priority_prefix_map(
        cls, spark: SparkSession, data: Any, **kw: Any
    ) -> "SparkConverter":
        return cls(spark, Converter.from_priority_prefix_map(data, **kw))

    @classmethod
    def from_reverse_prefix_map(
        cls, spark: SparkSession, data: Any, **kw: Any
    ) -> "SparkConverter":
        return cls(spark, Converter.from_reverse_prefix_map(data, **kw))

    def rebroadcast(self, converter: Converter) -> "SparkConverter":
        """After a driver-side mutation/reconciliation, ship the new state."""
        return SparkConverter(self.spark, converter)

    # -- column kernels -----------------------------------------------------

    def compress(self, uri: "Column | str", *, passthrough: bool = False) -> Column:
        return kernels.compress_col(uri, self.broadcast, passthrough=passthrough)

    def expand(self, curie: "Column | str", *, passthrough: bool = False) -> Column:
        return kernels.expand_col(curie, self.broadcast, passthrough=passthrough)

    def expand_all(self, curie: "Column | str") -> Column:
        return kernels.expand_all_col(curie, self.broadcast)

    def parse_uri(self, uri: "Column | str") -> Column:
        return kernels.parse_uri_col(uri, self.broadcast)

    def parse_curie(self, curie: "Column | str") -> Column:
        return kernels.parse_curie_col(curie, self.broadcast)

    def standardize_prefix(
        self, prefix: "Column | str", *, passthrough: bool = False
    ) -> Column:
        return kernels.standardize_prefix_col(
            prefix, self.broadcast, passthrough=passthrough
        )

    def standardize_curie(
        self, curie: "Column | str", *, passthrough: bool = False
    ) -> Column:
        return kernels.standardize_curie_col(
            curie, self.broadcast, passthrough=passthrough
        )

    def standardize_uri(self, uri: "Column | str", *, passthrough: bool = False) -> Column:
        return kernels.standardize_uri_col(uri, self.broadcast, passthrough=passthrough)

    def compress_or_standardize(
        self, s: "Column | str", *, passthrough: bool = False
    ) -> Column:
        return kernels.compress_or_standardize_col(
            s, self.broadcast, passthrough=passthrough
        )

    def expand_or_standardize(
        self, s: "Column | str", *, passthrough: bool = False
    ) -> Column:
        return kernels.expand_or_standardize_col(
            s, self.broadcast, passthrough=passthrough
        )

    def is_uri(self, s: "Column | str") -> Column:
        return kernels.is_uri_col(s, self.broadcast)

    def is_curie(self, s: "Column | str") -> Column:
        return kernels.is_curie_col(s, self.broadcast)

    def hash_triple(
        self,
        subject: "Column | str",
        predicate: "Column | str",
        object: "Column | str",
        *,
        negate: bool = False,
    ) -> Column:
        return kernels.hash_triple_col(
            subject, predicate, object, self.broadcast, negate=negate
        )

    # -- SQL surface --------------------------------------------------------

    def register_sql(self, *, name_prefix: str = "curies") -> "dict[str, str]":
        """Register the conversion kernels as session-scoped SQL
        functions (``curies_compress``, ``curies_expand``, …) so plain
        ``spark.sql`` queries can call them; see
        :func:`curies_spark.functions.sqlfuncs.register_sql_functions`.
        Re-register after :meth:`rebroadcast` to pick up new state."""
        from .sqlfuncs import register_sql_functions

        return register_sql_functions(
            self.spark, self.broadcast, name_prefix=name_prefix
        )

    # -- bulk dataframe helpers (reference pd_* surface) -------------------

    def df_compress(
        self,
        df: DataFrame,
        column: str,
        target_column: "str | None" = None,
        *,
        strict: bool = False,
        passthrough: bool = False,
    ) -> DataFrame:
        """Columnar twin of ``Converter.pd_compress`` (reference api.py:2445-2471)."""
        out = df.withColumn(
            target_column or column, self.compress(column, passthrough=passthrough)
        )
        if strict:
            kernels.assert_no_nulls(out, target_column or column, label="compress")
        return out

    def df_expand(
        self,
        df: DataFrame,
        column: str,
        target_column: "str | None" = None,
        *,
        strict: bool = False,
        passthrough: bool = False,
    ) -> DataFrame:
        """Columnar twin of ``Converter.pd_expand`` (reference api.py:2473-2499)."""
        out = df.withColumn(
            target_column or column, self.expand(column, passthrough=passthrough)
        )
        if strict:
            kernels.assert_no_nulls(out, target_column or column, label="expand")
        return out

    def df_standardize_curie(
        self,
        df: DataFrame,
        column: str,
        target_column: "str | None" = None,
        *,
        strict: bool = False,
        passthrough: bool = False,
    ) -> DataFrame:
        """Columnar twin of ``pd_standardize_curie`` (reference api.py:2523-2555)."""
        out = df.withColumn(
            target_column or column,
            self.standardize_curie(column, passthrough=passthrough),
        )
        if strict:
            kernels.assert_no_nulls(out, target_column or column, label="standardize_curie")
        return out

    def df_standardize_uri(
        self,
        df: DataFrame,
        column: str,
        target_column: "str | None" = None,
        *,
        strict: bool = False,
        passthrough: bool = False,
    ) -> DataFrame:
        """Columnar twin of ``pd_standardize_uri`` (reference api.py:2557-2583)."""
        out = df.withColumn(
            target_column or column,
            self.standardize_uri(column, passthrough=passthrough),
        )
        if strict:
            kernels.assert_no_nulls(out, target_column or column, label="standardize_uri")
        return out
