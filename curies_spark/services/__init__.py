"""HTTP service adapters (thin layers over the engine core)."""

from .mapping import (
    evaluate_sparql,
    get_flask_mapping_app,
    get_flask_mapping_blueprint,
    handle_header,
    parse_header,
)
from .resolver import FAILURE_CODE, get_flask_app, get_flask_blueprint

__all__ = [
    "FAILURE_CODE",
    "evaluate_sparql",
    "get_flask_app",
    "get_flask_blueprint",
    "get_flask_mapping_app",
    "get_flask_mapping_blueprint",
    "handle_header",
    "parse_header",
]
