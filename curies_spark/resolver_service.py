"""Import-path parity for ``curies.resolver_service`` (reference
src/curies/resolver_service.py) — the CURIE-resolver HTTP surface under
its reference module path; implementations (Flask + lazy FastAPI) live
in :mod:`curies_spark.services.resolver`."""

from .services.resolver import (
    FAILURE_CODE,
    get_fastapi_app,
    get_fastapi_router,
    get_flask_app,
    get_flask_blueprint,
)

__all__ = [
    "FAILURE_CODE",
    "get_fastapi_app",
    "get_fastapi_router",
    "get_flask_app",
    "get_flask_blueprint",
]
