"""Register the converter's conversion kernels as Spark SQL functions,
so ``spark.sql("SELECT curies_compress(uri) FROM t")`` works for users
who live in SQL rather than the DataFrame API.

The reference has no SQL surface (its closest analogue is the pandas
``pd_*`` helpers, reference dataframe.py); this is the Spark-native
completion of that idea. The registered functions are the SAME
measured kernels as the Column API (:mod:`curies_spark.functions.kernels`),
picked by the same size thresholds:

- **Native-sized maps** become ``CREATE OR REPLACE TEMPORARY FUNCTION
  … RETURNS STRING RETURN <expr>`` SQL UDFs. Catalyst inlines the body
  at analysis time, so calls run inside whole-stage codegen exactly
  like the Column kernels' when-chains / map literals — zero Python at
  execution.
- **Large maps** (past ``NATIVE_COMPRESS_THRESHOLD`` /
  ``NATIVE_EXPAND_THRESHOLD``, where codegen'd chains are the measured
  slow path — kernels.py:298-304) register the Arrow-batched bucketed
  kernels via ``spark.udf.register`` and build the SQL UDF bodies on
  top of them (Spark resolves nested function calls at analysis).

Composite functions are SQL compositions of the primitives, mirroring
the kernel compositions (``standardize_uri = expand ∘ compress``,
``compress_or_standardize = coalesce(compress, standardize_curie)``).
All functions are session-scoped temporaries: re-registering (e.g.
after :meth:`SparkConverter.rebroadcast`) replaces them.
"""

from __future__ import annotations

from typing import Any, Mapping

from ..core.converter import Converter
from . import kernels

__all__ = ["register_sql_functions"]


def _q(s: str) -> str:
    """Spark SQL single-quoted string literal (backslash is an escape
    character in Spark SQL, unlike ANSI)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _map_sql(mapping: "Mapping[str, str]") -> str:
    if not mapping:
        return "map()"
    pairs = ", ".join(f"{_q(k)}, {_q(v)}" for k, v in mapping.items())
    return f"map({pairs})"


def _compress_case_sql(conv: Converter, v: str) -> str:
    """Longest-prefix-first CASE chain — the SQL twin of
    ``_native_compress_pair`` (kernels.py:279-296)."""
    entries = sorted(
        conv.reverse_prefix_map.items(), key=lambda kv: len(kv[0]), reverse=True
    )
    whens = " ".join(
        f"WHEN startswith({v}, {_q(up)}) "
        f"THEN concat({_q(p)}, ':', substr({v}, {len(up) + 1}))"
        for up, p in entries
    )
    return f"CASE {whens} END" if whens else "CAST(NULL AS STRING)"


def register_sql_functions(
    spark: Any,
    converter: Any,
    *,
    name_prefix: str = "curies",
) -> "dict[str, str]":
    """Register conversion functions on the session's SQL surface.

    ``converter`` may be a :class:`~curies_spark.core.converter.Converter`
    or a ``Broadcast`` of one (as held by
    :class:`~curies_spark.functions.spark_converter.SparkConverter`) —
    broadcast is preferred for large maps so executors fetch the state
    once. Returns ``{operation: registered_function_name}``.
    """
    conv = kernels._broadcast(converter)
    p = name_prefix
    names: "dict[str, str]" = {}

    def create(op: str, arg_sql: str, body: str) -> None:
        name = f"{p}_{op}"
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({arg_sql}) "
            f"RETURNS STRING RETURN {body}"
        )
        names[op] = name

    # -- compress: native CASE chain or the Arrow bucketed kernel --------
    if len(conv.reverse_prefix_map) <= kernels.NATIVE_COMPRESS_THRESHOLD:
        create("compress", "u STRING", _compress_case_sql(conv, "u"))
    else:
        spark.udf.register(f"{p}_compress", kernels.compress_udf(converter))
        names["compress"] = f"{p}_compress"

    # -- prefix→canonical-URI lookup feeding expand ----------------------
    if len(conv.prefix_map) <= kernels.NATIVE_EXPAND_THRESHOLD:
        p2u = lambda arg: f"element_at({_map_sql(conv.prefix_map)}, {arg})"  # noqa: E731
    else:
        spark.udf.register(
            f"{p}__prefix_to_uri",
            kernels._exact_match_udf(
                converter, "_sql_p2u_table", lambda cv: dict(cv.prefix_map)
            ),
        )
        p2u = lambda arg: f"{p}__prefix_to_uri({arg})"  # noqa: E731
    prefix_arg = "substring_index(c, ':', 1)"
    create(
        "expand",
        "c STRING",
        "CASE WHEN locate(':', c) > 0 THEN "
        f"concat({p2u(prefix_arg)}, substr(c, locate(':', c) + 1)) "
        "END",
    )

    # -- synonym→canonical prefix lookup ---------------------------------
    if len(conv.synonym_to_prefix) <= kernels.NATIVE_EXPAND_THRESHOLD:
        create(
            "standardize_prefix",
            "pfx STRING",
            f"element_at({_map_sql(conv.synonym_to_prefix)}, pfx)",
        )
    else:
        spark.udf.register(
            f"{p}_standardize_prefix",
            kernels._exact_match_udf(
                converter, "_std_prefix_table", lambda cv: cv.synonym_to_prefix
            ),
        )
        names["standardize_prefix"] = f"{p}_standardize_prefix"

    # -- SQL compositions of the primitives (mirror the kernel
    #    compositions, kernels.py:579-646) -------------------------------
    create(
        "standardize_curie",
        "c STRING",
        "CASE WHEN locate(':', c) > 0 "
        f"AND {p}_standardize_prefix(substring_index(c, ':', 1)) IS NOT NULL "
        f"THEN concat({p}_standardize_prefix(substring_index(c, ':', 1)), ':', "
        "substr(c, locate(':', c) + 1)) END",
    )
    create("standardize_uri", "u STRING", f"{p}_expand({p}_compress(u))")
    create("compress_or_standardize", "s STRING",
           f"coalesce({p}_compress(s), {p}_standardize_curie(s))")
    create("expand_or_standardize", "s STRING",
           f"coalesce({p}_standardize_uri(s), {p}_expand(s))")
    create("format_curie", "pfx STRING, i STRING", "concat(pfx, ':', i)")

    for op, body in (("is_uri", f"{p}_compress(s) IS NOT NULL"),
                     ("is_curie", f"{p}_expand(s) IS NOT NULL")):
        name = f"{p}_{op}"
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(s STRING) "
            f"RETURNS BOOLEAN RETURN {body}"
        )
        names[op] = name

    return names
