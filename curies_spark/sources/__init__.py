"""Sources and sinks: prefix-map loaders/writers, triple I/O, synthetic corpus."""

from .presets import (  # noqa: E402  (reference src/curies/sources.py surface)
    get_bioregistry_converter,
    get_go_converter,
    get_monarch_converter,
    get_obo_converter,
    get_prefixcommons_converter,
)

__all__ = [
    "get_bioregistry_converter",
    "get_go_converter",
    "get_monarch_converter",
    "get_obo_converter",
    "get_prefixcommons_converter",
]
