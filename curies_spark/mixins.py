"""Import-path parity for ``curies.mixins`` (reference
src/curies/mixins.py) — implementations in
:mod:`curies_spark.core.mixins`."""

from .core.mixins import (
    SemanticallyProcessable,
    SemanticallyStandardizable,
    process,
    process_many,
    standardize,
    standardize_many,
)

__all__ = [
    "SemanticallyProcessable",
    "SemanticallyStandardizable",
    "process",
    "process_many",
    "standardize",
    "standardize_many",
]
