"""Import-path parity for ``curies.utils`` (reference
src/curies/utils.py): the CURIE split primitive and its error."""

from .core.converter import NoCURIEDelimiterError, _split

__all__ = ["NoCURIEDelimiterError", "_split"]
