"""Import-path parity for ``curies.reconciliation`` (reference
src/curies/reconciliation.py) — implementations in
:mod:`curies_spark.core.reconciliation`."""

from .core.reconciliation import remap_curie_prefixes, remap_uri_prefixes, rewire

__all__ = ["remap_curie_prefixes", "remap_uri_prefixes", "rewire"]
