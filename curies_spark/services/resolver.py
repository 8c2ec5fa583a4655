"""CURIE resolver service: ``GET /<curie>`` → redirect to the expanded URI.

Semantics from reference resolver_service.py:23-160: a resolvable CURIE
answers with a 302 redirect to ``expand_pair(prefix, identifier)``; an
unknown prefix answers 422 with the sorted list of valid prefixes. The
service is a stateless driver-scale veneer over the converter — the
data-scale form of "resolve these million CURIEs" is a column pass
(:meth:`curies_spark.functions.spark_converter.SparkConverter.df_expand`),
not a million HTTP round-trips.

Both reference frameworks are offered: Flask (default) and FastAPI
(reference resolver_service.py:163-307). Each is imported inside its
factory (as in the reference) so the engine has no hard web-framework
dependency; where fastapi is not installed the FastAPI factories raise
a clear ImportError at call time, and their tests auto-activate only
when it is (the same lazy-glue pattern as curies_spark.database's
SQLAlchemy adapters).
"""

from __future__ import annotations

from typing import Any, Mapping

from ..core.converter import Converter

__all__ = [
    "FAILURE_CODE",
    "get_fastapi_app",
    "get_fastapi_router",
    "get_flask_app",
    "get_flask_blueprint",
]

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


def get_fastapi_router(converter: Converter, **kwargs: Any) -> "Any":
    """Get a FastAPI router serving the resolver route
    (reference resolver_service.py:163-236)."""
    try:
        from fastapi import APIRouter, HTTPException
        from fastapi.responses import RedirectResponse
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "get_fastapi_router requires fastapi; install it or use "
            "get_flask_blueprint for the Flask variant"
        ) from e

    api_router = APIRouter(**kwargs)

    @api_router.get(f"/{{prefix}}{converter.delimiter}{{identifier:path}}")
    def resolve(prefix: str, identifier: str) -> "Any":
        location = converter.expand_pair(prefix, identifier)
        if location is None:
            prefixes = ", ".join(sorted(converter.get_prefixes()))
            raise HTTPException(
                status_code=FAILURE_CODE,
                detail=f"Invalid prefix: {prefix}. Use one of: {prefixes}",
            )
        return RedirectResponse(location, status_code=302)

    return api_router


def get_fastapi_app(
    converter: Converter,
    router_kwargs: "Mapping[str, Any] | None" = None,
    fastapi_kwargs: "Mapping[str, Any] | None" = None,
    include_kwargs: "Mapping[str, Any] | None" = None,
) -> "Any":
    """Get a FastAPI app wrapping :func:`get_fastapi_router`
    (reference resolver_service.py:239-307)."""
    from fastapi import FastAPI

    router = get_fastapi_router(converter, **(router_kwargs or {}))
    app = FastAPI(**(fastapi_kwargs or {}))
    app.include_router(router, **(include_kwargs or {}))
    return app
