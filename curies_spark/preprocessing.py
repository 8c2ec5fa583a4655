"""Import-path parity for ``curies.preprocessing`` (reference
src/curies/preprocessing.py) — implementations in
:mod:`curies_spark.core.preprocessing`; the fused columnar pipeline is
``functions.kernels.parse_preprocessed_df``."""

from .core.preprocessing import (
    BlockAction,
    BlocklistError,
    PostprocessingRewrites,
    PreprocessingBlocklists,
    PreprocessingConverter,
    PreprocessingRewrites,
    PreprocessingRules,
)

__all__ = [
    "BlockAction",
    "BlocklistError",
    "PostprocessingRewrites",
    "PreprocessingBlocklists",
    "PreprocessingConverter",
    "PreprocessingRewrites",
    "PreprocessingRules",
]
