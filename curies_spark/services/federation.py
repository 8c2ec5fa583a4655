"""Client-side SPARQL federation helpers: fetch a remote endpoint's
results and parse them into records.

Mirrors reference mapping_service/utils.py:55-157 — ``get_sparql_records``
issues the query, ``handle_json`` / ``handle_xml`` / ``handle_csv``
parse the three SPARQL 1.1 result serializations, and
``sparql_service_available`` pings an endpoint with the reference's
health-check query. Content negotiation (``parse_header`` /
``handle_header``) is shared with the serving side
(:mod:`curies_spark.services.mapping`), so a query served by this
package's own mapping endpoint round-trips through these parsers.

Transport is injectable: pass ``fetcher`` (or install a default with
:func:`set_sparql_fetcher`) as ``(endpoint, params, headers) -> text``
— tests route it into a Flask/FastAPI test client, hermetic deployments
wrap their blessed HTTP stack. With none installed, the reference's
behavior is kept: :mod:`requests` is imported lazily and used directly
(reference utils.py:94-106).
"""

from __future__ import annotations

import csv
import json
import json.decoder
import unittest
from typing import Callable, Iterable, Mapping

from .mapping import handle_header, parse_header  # noqa: F401  (shared surface)

__all__ = [
    "CONTENT_TYPE_TO_HANDLER",
    "PING_SPARQL",
    "get_sparql_record_so_tuples",
    "get_sparql_records",
    "handle_csv",
    "handle_header",
    "handle_json",
    "handle_xml",
    "parse_header",
    "require_service",
    "set_sparql_fetcher",
    "sparql_service_available",
]

Record = Mapping[str, str]
Records = "list[Record]"

#: A SPARQL query used to ping a SPARQL endpoint
#: (reference mapping_service/utils.py:29)
PING_SPARQL = 'SELECT ?s ?o WHERE { BIND("hello" as ?s) . BIND("there" as ?o) . }'

#: injectable transport: (endpoint, params, headers) -> response text
_SPARQL_FETCHER: "Callable[[str, Mapping[str, str], Mapping[str, str]], str] | None" = None


def set_sparql_fetcher(
    fetcher: "Callable[[str, Mapping[str, str], Mapping[str, str]], str] | None",
) -> "Callable[[str, Mapping[str, str], Mapping[str, str]], str] | None":
    """Install the transport used by :func:`get_sparql_records` when no
    per-call ``fetcher`` is given; returns the previous one so callers
    can restore it (same contract as
    :func:`curies_spark.core.converter.set_url_fetcher`)."""
    global _SPARQL_FETCHER
    previous, _SPARQL_FETCHER = _SPARQL_FETCHER, fetcher
    return previous


def handle_json(text: str) -> Records:
    """Parse bindings encoded in a SPARQL 1.1 results JSON string
    (reference utils.py:55-61)."""
    data = json.loads(text)
    return [
        {key: value["value"] for key, value in record.items()}
        for record in data["results"]["bindings"]
    ]


def handle_xml(text: str) -> Records:
    """Parse bindings encoded in a SPARQL 1.1 results XML string
    (reference utils.py:64-78; the reference parses with defusedxml —
    used here too when installed, stdlib ElementTree otherwise)."""
    try:  # pragma: no cover - environment-dependent
        from defusedxml import ElementTree
    except ImportError:
        from xml.etree import ElementTree  # noqa: S405 - results come from
        # an endpoint the caller chose; defusedxml hardens this when present

    root = ElementTree.fromstring(text)
    results = root.find("{http://www.w3.org/2005/sparql-results#}results")
    if results is None:
        raise ValueError("not a SPARQL results document: no <results>")
    return [_handle_result(result) for result in results]


def _handle_result(result: "Iterable") -> Record:
    # like the reference (utils.py:73-78), only ``uri`` bindings survive
    # the XML path; use the JSON content type when literals matter
    return {
        binding.attrib["name"]: value
        for binding in result
        if (value := binding.findtext("{http://www.w3.org/2005/sparql-results#}uri"))
    }


def handle_csv(text: str) -> Records:
    """Parse bindings encoded in a SPARQL 1.1 results CSV string
    (reference utils.py:81-83)."""
    return list(csv.DictReader(text.splitlines()))


#: canonical content type → parser (reference utils.py:87-91)
CONTENT_TYPE_TO_HANDLER: "Mapping[str, Callable[[str], Records]]" = {
    "application/sparql-results+json": handle_json,
    "application/sparql-results+xml": handle_xml,
    "application/sparql-results+csv": handle_csv,
}


def get_sparql_records(
    endpoint: str,
    sparql: str,
    accept: str,
    fetcher: "Callable[[str, Mapping[str, str], Mapping[str, str]], str] | None" = None,
) -> Records:
    """Run a SPARQL query against a remote endpoint and parse the
    response per its negotiated content type (reference utils.py:94-106)."""
    if fetcher is None:
        fetcher = _SPARQL_FETCHER
    if fetcher is None:

        def fetcher(url, params, headers):  # reference transport
            import requests

            res = requests.get(url, timeout=60, params=params, headers=headers)
            res.raise_for_status()
            return res.text

    text = fetcher(endpoint, {"query": sparql}, {"accept": accept})
    func = CONTENT_TYPE_TO_HANDLER[handle_header(accept)]
    return func(text)


def get_sparql_record_so_tuples(records: Records) -> "set[tuple[str, str]]":
    """Subject/object pairs from records (reference utils.py:109-111)."""
    return {(record["s"], record["o"]) for record in records}


def sparql_service_available(
    endpoint: str,
    fetcher: "Callable[[str, Mapping[str, str], Mapping[str, str]], str] | None" = None,
) -> bool:
    """Ping a SPARQL endpoint with :data:`PING_SPARQL`
    (reference utils.py:114-120)."""
    try:
        records = get_sparql_records(
            endpoint, PING_SPARQL, "application/json", fetcher=fetcher
        )
    except (OSError, json.decoder.JSONDecodeError, KeyError):
        return False
    return {("hello", "there")} == get_sparql_record_so_tuples(records)


def require_service(
    url: str, name: str
) -> "Callable[[type[unittest.TestCase]], type[unittest.TestCase]]":
    """Class decorator that skips a TestCase unless the service answers
    the ping (reference utils.py:151-157)."""
    return unittest.skipUnless(
        sparql_service_available(url), reason=f"No {name} service is running on {url}"
    )
