"""W3C validation for prefixes (NCName) and CURIEs.

Semantics from the reference (/root/reference/src/curies/w3c.py:33-173):
prefixes follow the XML-namespaces NCName production; CURIE local unique
identifiers follow an RFC3987-ish relative-reference pattern. The regex
patterns are re-stated from the cited public W3C/IETF specifications.

These patterns are shared verbatim by the Spark kernels
(:func:`curies_spark.functions.kernels.is_w3c_prefix_col` uses them in
``F.rlike``) so driver and executor validation agree exactly.
"""

from __future__ import annotations

import re

__all__ = [
    "CURIE_PATTERN",
    "LOCAL_UNIQUE_IDENTIFIER_PATTERN",
    "NCNAME_PATTERN",
    "is_w3c_curie",
    "is_w3c_prefix",
]

#: NCName := (Letter | '_') (Letter | Digit | '.' | '-' | '_')*
#: per https://www.w3.org/TR/1999/REC-xml-names-19990114/#NT-NCName
#: (reference w3c.py:33)
NCNAME_PATTERN = r"[A-Za-z_][A-Za-z0-9\.\-_]*"

NCNAME_RE = re.compile(f"^{NCNAME_PATTERN}$")

#: irelative-ref per https://www.ietf.org/rfc/rfc3987.txt (reference w3c.py:45-52)
LOCAL_UNIQUE_IDENTIFIER_PATTERN = r"(/[^\s/][^\s]*|[^\s/][^\s]*|[^\s]?)"

LOCAL_UNIQUE_IDENTIFIER_RE = re.compile(LOCAL_UNIQUE_IDENTIFIER_PATTERN)

#: curie := [ [ prefix ] ':' ] reference (reference w3c.py:54)
CURIE_PATTERN = rf"^({NCNAME_PATTERN}?:)?{LOCAL_UNIQUE_IDENTIFIER_PATTERN}$"

CURIE_RE = re.compile(CURIE_PATTERN)


def is_w3c_prefix(prefix: str) -> bool:
    """Full NCName match (reference w3c.py:69-104)."""
    return bool(NCNAME_RE.match(prefix))


def _is_w3c_luid(luid: str) -> bool:
    return bool(LOCAL_UNIQUE_IDENTIFIER_RE.match(luid))


def is_w3c_curie(curie: str) -> bool:
    """CURIE grammar with bracket and blank rejection (reference w3c.py:111-173)."""
    if "[" in curie or "]" in curie:
        return False
    if not curie.strip():
        return False
    prefix, sep, identifier = curie.partition(":")
    if not sep:
        return _is_w3c_luid(curie)
    # empty prefix is allowed in a CURIE even though NCName itself can't be empty
    if not prefix:
        return _is_w3c_luid(identifier)
    return is_w3c_prefix(prefix) and _is_w3c_luid(identifier)
