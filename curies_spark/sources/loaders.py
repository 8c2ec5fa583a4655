"""Sources and sinks: prefix-map loaders, EPM/JSON-LD/SHACL/TSV writers,
and Spark triple I/O.

Loader/writer semantics from the reference
(/root/reference/src/curies/api.py:2843-3208 and triples/io.py:24-53).
Prefix maps are driver-scale, so their I/O is plain-Python; triple
streams are data-scale, so their I/O is Spark readers/writers.
"""

from __future__ import annotations

import csv
import json
import re
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..core.converter import Converter
from ..core.record import Record

__all__ = [
    "file_convert_column",
    "from_shacl",
    "load_extended_prefix_map",
    "load_jsonld_context",
    "load_prefix_map",
    "load_shacl",
    "read_triples",
    "read_triples_parquet",
    "write_extended_prefix_map",
    "write_jsonld_context",
    "write_shacl",
    "write_triples",
    "write_triples_parquet",
    "write_tsv",
]

TRIPLE_COLUMNS = ["subject", "predicate", "object"]


# ---------------------------------------------------------------------------
# converter loaders (module-level wrappers, reference api.py:2843-2968)
# ---------------------------------------------------------------------------


def load_prefix_map(prefix_map: Any, **kwargs: Any) -> Converter:
    return Converter.from_prefix_map(prefix_map, **kwargs)


def load_extended_prefix_map(records: Any, **kwargs: Any) -> Converter:
    return Converter.from_extended_prefix_map(records, **kwargs)


def load_jsonld_context(data: Any, **kwargs: Any) -> Converter:
    return Converter.from_jsonld(data, **kwargs)


#: one ``sh:declare`` entry: prefix, namespace (optionally typed
#: ``^^xsd:anyURI``), optional pattern (turtle-escaped string)
_SHACL_DECLARE_RE = re.compile(
    r'sh:prefix\s+"([^"]*)"\s*;\s*'
    r'sh:namespace\s+"([^"]*)"(?:\^\^xsd:anyURI)?'
    r'(?:\s*;\s*sh:pattern\s+"((?:[^"\\]|\\.)*)")?'
)


def from_shacl(source: "str | Path", **kwargs: Any) -> Converter:
    """Read a converter from SHACL prefix declarations — the read side of
    :func:`write_shacl` (reference ``Converter.from_shacl``,
    api.py:1508-1545).

    The reference runs a SPARQL query over an rdflib graph; rdflib is not
    in this container, so this parses the ``sh:declare`` turtle shape the
    ecosystem (and :func:`write_shacl`) emits: one
    ``[ sh:prefix "…" ; sh:namespace "…"^^xsd:anyURI ; sh:pattern "…" ]``
    bracket per record. Turtle string escaping of patterns
    (``\\\\`` → ``\\``) is reversed, matching the writer.

    ``source`` is a filesystem path or the turtle text itself.
    """
    text: str
    if isinstance(source, Path):
        text = source.read_text()
    elif "\n" in source or "sh:prefix" in source:
        text = source
    else:
        text = Path(source).read_text()
    records = []
    for prefix, uri_prefix, pattern in _SHACL_DECLARE_RE.findall(text):
        records.append(
            Record(
                prefix=prefix,
                uri_prefix=uri_prefix,
                pattern=pattern.replace("\\\\", "\\") if pattern else None,
            )
        )
    return Converter(records, **kwargs)


def load_shacl(source: "str | Path", **kwargs: Any) -> Converter:
    """Module-level alias of :func:`from_shacl` (name parity with the
    reference's ``curies.load_shacl``, api.py:2940-2968)."""
    return from_shacl(source, **kwargs)


# ---------------------------------------------------------------------------
# converter writers (reference api.py:2971-3208)
# ---------------------------------------------------------------------------


def _record_to_dict(record: Record) -> dict[str, Any]:
    # reference api.py:2984-2996: synonyms sorted, empties omitted
    rv: dict[str, Any] = {"prefix": record.prefix, "uri_prefix": record.uri_prefix}
    if record.prefix_synonyms:
        rv["prefix_synonyms"] = sorted(record.prefix_synonyms)
    if record.uri_prefix_synonyms:
        rv["uri_prefix_synonyms"] = sorted(record.uri_prefix_synonyms)
    if record.pattern:
        rv["pattern"] = record.pattern
    return rv


def write_extended_prefix_map(converter: Converter, path: "str | Path") -> None:
    """Records → JSON, indent 4, sorted keys (reference api.py:2971-2981)."""
    Path(path).write_text(
        json.dumps(
            [_record_to_dict(record) for record in converter.records],
            indent=4,
            sort_keys=True,
            ensure_ascii=False,
        )
    )


def write_jsonld_context(
    converter: Converter,
    path: "str | Path",
    *,
    include_synonyms: bool = False,
    expand: bool = False,
) -> None:
    """Bimap → ``@context`` JSON; ``expand=True`` emits
    ``{"@prefix": true, "@id": ...}`` terms (reference api.py:3019-3101)."""
    context: dict[str, Any] = {}
    for record in converter.records:
        term: Any = (
            {"@prefix": True, "@id": record.uri_prefix} if expand else record.uri_prefix
        )
        context[record.prefix] = term
        if include_synonyms:
            for prefix_synonym in record.prefix_synonyms:
                context[prefix_synonym] = term
    Path(path).write_text(json.dumps({"@context": context}, indent=4, sort_keys=True))


def _get_shacl_line(prefix: str, uri_prefix: str, pattern: "str | None" = None) -> str:
    # reference api.py:3203-3208 (backslashes in patterns escaped)
    line = f'    [ sh:prefix "{prefix}" ; sh:namespace "{uri_prefix}"^^xsd:anyURI '
    if pattern:
        pattern = pattern.replace("\\", "\\\\")
        line += f'; sh:pattern "{pattern}"'
    return line + " ]"


def write_shacl(
    converter: Converter, path: "str | Path", *, include_synonyms: bool = False
) -> None:
    """Records → turtle ``sh:declare`` blocks (reference api.py:3104-3162)."""
    lines = []
    for record in converter.records:
        lines.append(_get_shacl_line(record.prefix, record.uri_prefix, record.pattern))
        if include_synonyms:
            for prefix_synonym in record.prefix_synonyms:
                lines.append(
                    _get_shacl_line(prefix_synonym, record.uri_prefix, record.pattern)
                )
    text = (
        "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
        "\n"
        "[\n"
        "  sh:declare\n"
        "{entries}\n"
        "] .\n"
    )
    Path(path).write_text(text.format(entries=",\n".join(lines)))


def write_tsv(
    converter: Converter,
    path: "str | Path",
    *,
    header: "tuple[str, str]" = ("prefix", "base"),
) -> None:
    """(prefix, uri_prefix) two-column TSV (reference api.py:3165-3200)."""
    with Path(path).open("w") as csvfile:
        writer = csv.writer(csvfile, delimiter="\t")
        writer.writerow(header)
        for record in converter.records:
            writer.writerow((record.prefix, record.uri_prefix))


# ---------------------------------------------------------------------------
# triple I/O (reference triples/io.py:24-53) — Spark-native
# ---------------------------------------------------------------------------


def read_triples(spark: SparkSession, path: str) -> DataFrame:
    """Three-column TSV with header → triples DataFrame
    (reference triples/io.py:38-53)."""
    return (
        spark.read.option("sep", "\t")
        .option("header", True)
        .csv(path)
        .toDF(*TRIPLE_COLUMNS)
    )


def write_triples(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Triples DataFrame → TSV with ``subject predicate object`` header
    (reference triples/io.py:24-35)."""
    (
        df.select(*TRIPLE_COLUMNS)
        .write.mode(mode)
        .option("sep", "\t")
        .option("header", True)
        .csv(path)
    )


def read_triples_parquet(spark: SparkSession, path: str, *, tables=None) -> DataFrame:
    from .tables import ParquetTables

    return (tables or ParquetTables()).read(spark, path).select(*TRIPLE_COLUMNS)


def write_triples_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: "list[str] | None" = None,
    tables=None,
) -> None:
    """Partitioned table sink for the KG output; partition by subject
    prefix by default for prefix-pruned downstream scans.

    ``tables`` selects the table layout
    (:mod:`curies_spark.sources.tables`): default partitioned parquet
    at ``path``; pass an ``IcebergTables`` (catalog-name addressing) or
    any duck-typed ``TableFormat`` to land the same partitioned write
    in a lakehouse table format — the ONE seam between the engine's
    outputs and the storage layer."""
    from ..operators.triples import curie_prefix
    from .tables import ParquetTables

    out = df
    if partition_by is None:
        out = df.withColumn("subject_prefix", curie_prefix("subject"))
        partition_by = ["subject_prefix"]
    (tables or ParquetTables()).write(
        out, path, mode=mode, partition_by=partition_by
    )


def file_convert_column(
    spark: SparkSession,
    path: str,
    out_path: str,
    column: str,
    converter,
    *,
    operation: str = "compress",
    sep: str = ",",
    header: bool = True,
    passthrough: bool = False,
) -> None:
    """Convert one column of a delimited file and write the result — the
    distributed twin of the reference's in-place CSV rewrite helpers
    (``Converter.file_compress``/``file_expand`` via ``_file_helper``,
    api.py:2585-2666). ``operation`` ∈ {compress, expand,
    standardize_curie, standardize_uri}."""
    from ..functions import kernels

    ops = {
        "compress": kernels.compress_col,
        "expand": kernels.expand_col,
        "standardize_curie": kernels.standardize_curie_col,
        "standardize_uri": kernels.standardize_uri_col,
    }
    kernel = ops[operation]
    df = spark.read.option("sep", sep).option("header", header).csv(path)
    out = df.withColumn(column, kernel(column, converter, passthrough=passthrough))
    out.write.mode("overwrite").option("sep", sep).option("header", header).csv(out_path)
