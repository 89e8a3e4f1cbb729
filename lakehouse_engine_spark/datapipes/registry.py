"""ACON transformer registry for datapipes operators (filled as ops land)."""

from __future__ import annotations

SIMPLE: dict = {}


def register(name: str):
    """Decorator: expose a datapipes factory as an ACON transformer."""

    def _wrap(fn):
        SIMPLE[name] = fn
        return fn

    return _wrap
