"""HTTP service adapters (thin layers over the engine core)."""

from .federation import (
    PING_SPARQL,
    get_sparql_record_so_tuples,
    get_sparql_records,
    handle_csv,
    handle_json,
    handle_xml,
    require_service,
    set_sparql_fetcher,
    sparql_service_available,
)
from .mapping import (
    evaluate_sparql,
    get_fastapi_mapping_app,
    get_fastapi_mapping_router,
    get_flask_mapping_app,
    get_flask_mapping_blueprint,
    handle_header,
    parse_header,
)
from .resolver import (
    FAILURE_CODE,
    get_fastapi_app,
    get_fastapi_router,
    get_flask_app,
    get_flask_blueprint,
)

__all__ = [
    "FAILURE_CODE",
    "PING_SPARQL",
    "evaluate_sparql",
    "get_sparql_record_so_tuples",
    "get_sparql_records",
    "handle_csv",
    "handle_json",
    "handle_xml",
    "require_service",
    "set_sparql_fetcher",
    "sparql_service_available",
    "get_fastapi_app",
    "get_fastapi_mapping_app",
    "get_fastapi_mapping_router",
    "get_fastapi_router",
    "get_flask_app",
    "get_flask_blueprint",
    "get_flask_mapping_app",
    "get_flask_mapping_blueprint",
    "handle_header",
    "parse_header",
]
