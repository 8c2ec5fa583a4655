"""Package version (reference src/curies/version.py surface)."""

__all__ = ["VERSION", "get_version"]

VERSION = "0.1.0"


def get_version(with_git_hash: bool = False) -> str:
    """Return the package version. ``with_git_hash`` is accepted for
    signature parity; this package ships without embedded VCS state."""
    return VERSION
