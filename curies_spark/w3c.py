"""Import-path parity for ``curies.w3c`` (reference src/curies/w3c.py) —
the implementations live in :mod:`curies_spark.core.w3c`; columnar
twins in :mod:`curies_spark.functions.kernels` (``is_w3c_*_col``)."""

from .core.w3c import (
    CURIE_PATTERN,
    CURIE_RE,
    LOCAL_UNIQUE_IDENTIFIER_PATTERN,
    LOCAL_UNIQUE_IDENTIFIER_RE,
    NCNAME_PATTERN,
    NCNAME_RE,
    is_w3c_curie,
    is_w3c_prefix,
)

__all__ = [
    "CURIE_PATTERN",
    "CURIE_RE",
    "LOCAL_UNIQUE_IDENTIFIER_PATTERN",
    "LOCAL_UNIQUE_IDENTIFIER_RE",
    "NCNAME_PATTERN",
    "NCNAME_RE",
    "is_w3c_curie",
    "is_w3c_prefix",
]
