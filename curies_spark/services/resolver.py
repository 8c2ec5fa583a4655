"""CURIE resolver service: ``GET /<curie>`` → redirect to the expanded URI.

Semantics from reference resolver_service.py:23-160: a resolvable CURIE
answers with a 302 redirect to ``expand_pair(prefix, identifier)``; an
unknown prefix answers 422 with the sorted list of valid prefixes. The
service is a stateless driver-scale veneer over the converter — the
data-scale form of "resolve these million CURIEs" is a column pass
(:meth:`curies_spark.functions.spark_converter.SparkConverter.df_expand`),
not a million HTTP round-trips.

Flask is imported inside the factory (as in the reference) so the
engine has no hard web-framework dependency; the FastAPI variant of the
reference (resolver_service.py:163-307) is omitted — fastapi is not in
this container and the blueprint carries the full semantics.
"""

from __future__ import annotations

from typing import Any, Mapping

from ..core.converter import Converter

__all__ = ["FAILURE_CODE", "get_flask_app", "get_flask_blueprint"]

#: HTTP code for an unresolvable prefix (reference resolver_service.py:23)
FAILURE_CODE = 422


def get_flask_blueprint(converter: Converter, **kwargs: Any) -> "Any":
    """Get a Flask blueprint serving the resolver routes
    (reference resolver_service.py:26-86)."""
    from flask import Blueprint, abort, redirect

    blueprint = Blueprint("metaresolver", __name__, **kwargs)

    @blueprint.route(f"/<prefix>{converter.delimiter}<path:identifier>")
    def resolve(prefix: str, identifier: str) -> Any:
        location = converter.expand_pair(prefix, identifier)
        if location is None:
            prefixes = "".join(f"\n- {p}" for p in sorted(converter.get_prefixes()))
            return abort(FAILURE_CODE, f"Invalid prefix: {prefix}. Use one of:{prefixes}")
        return redirect(location)

    return blueprint


def get_flask_app(
    converter: Converter,
    blueprint_kwargs: "Mapping[str, Any] | None" = None,
    flask_kwargs: "Mapping[str, Any] | None" = None,
    register_kwargs: "Mapping[str, Any] | None" = None,
) -> "Any":
    """Get a Flask app wrapping :func:`get_flask_blueprint`
    (reference resolver_service.py:89-160)."""
    from flask import Flask

    app = Flask(__name__, **(flask_kwargs or {}))
    blueprint = get_flask_blueprint(converter, **(blueprint_kwargs or {}))
    app.register_blueprint(blueprint, **(register_kwargs or {}))
    return app
