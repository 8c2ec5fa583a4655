"""Import-path parity for ``curies.discovery`` (reference
src/curies/discovery.py) — driver-scale implementations in
:mod:`curies_spark.core.discovery`; the distributed twins are
:mod:`curies_spark.operators.discovery`."""

from .core.discovery import discover, discover_from_rdf

__all__ = ["discover", "discover_from_rdf"]
