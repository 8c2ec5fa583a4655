"""HTTP service adapters (thin layers over the engine core)."""

from .resolver import FAILURE_CODE, get_flask_app, get_flask_blueprint

__all__ = ["FAILURE_CODE", "get_flask_app", "get_flask_blueprint"]
