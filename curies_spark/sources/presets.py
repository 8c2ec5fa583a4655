"""Preset converter getters for well-known public contexts.

Name-and-semantics parity with reference sources.py:9-123. Each getter
loads a published JSON-LD context / extended prefix map by URL through
the engine's injectable fetcher (:func:`curies_spark.core.converter.
set_url_fetcher`) — the engine core never does ambient network I/O, so
calling these without an installed fetcher raises a clear error telling
the user to inject one (urllib/requests in a connected deployment,
a fixture in tests). For fully-offline work see
:mod:`curies_spark.sources.synthetic`.
"""

from __future__ import annotations

from typing import Any

from ..core.converter import Converter

__all__ = [
    "get_bioregistry_converter",
    "get_go_converter",
    "get_monarch_converter",
    "get_obo_converter",
    "get_prefixcommons_converter",
]

BIOREGISTRY_CONTEXTS = (
    "https://raw.githubusercontent.com/biopragmatics/bioregistry/main/exports/contexts"
)


def get_obo_converter() -> Converter:
    """Get the latest OBO Foundry context (reference sources.py:22-52)."""
    return Converter.from_jsonld("http://purl.obolibrary.org/meta/obo_context.jsonld")


def get_prefixcommons_converter(name: str = "monarch_context") -> Converter:
    """Get a Prefix Commons-maintained context by file name
    (reference sources.py:55-68)."""
    url = (
        "https://raw.githubusercontent.com/prefixcommons/prefixcommons-py/master/"
        f"prefixcommons/registry/{name}.jsonld"
    )
    return Converter.from_jsonld(url)


def get_monarch_converter() -> Converter:
    """Get the Prefix Commons-maintained Monarch context."""
    return get_prefixcommons_converter("monarch_context")


def get_go_converter() -> Converter:
    """Get the Prefix Commons-maintained GO context."""
    return get_prefixcommons_converter("go_context")


def get_bioregistry_converter(**kwargs: Any) -> Converter:
    """Get the latest Bioregistry extended prefix map (reference
    sources.py:81-123; the ``web=False`` import-the-bioregistry-package
    path is out of scope — the package ships its own converter)."""
    url = f"{BIOREGISTRY_CONTEXTS}/bioregistry.epm.json"
    return Converter.from_extended_prefix_map(url, **kwargs)
