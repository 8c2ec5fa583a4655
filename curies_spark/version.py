"""Package version — the single source of truth (reference
src/curies/version.py pattern: the top-level ``__version__`` and
``get_version`` re-export from here)."""

__all__ = ["VERSION", "get_version"]

VERSION = "0.2.0"


def get_version(with_git_hash: bool = False) -> str:
    """Return the package version. ``with_git_hash`` is accepted for
    signature parity; this package ships without embedded VCS state."""
    return VERSION
