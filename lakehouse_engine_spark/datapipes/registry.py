"""ACON transformer registry for datapipes operators (filled as ops land)."""

from __future__ import annotations

SIMPLE: dict = {}

# contextual datapipes ops: factory(data: Dict[str, DataFrame], **args) —
# they resolve other dataflow spec_ids, like the core `join` transformer
CONTEXTUAL: dict = {}


def register(name: str):
    """Decorator: expose a datapipes factory as an ACON transformer."""

    def _wrap(fn):
        SIMPLE[name] = fn
        return fn

    return _wrap


def register_contextual(name: str):
    """Decorator: expose a datapipes factory that receives the dataflow
    dict as its first argument (spec_id resolution inside ACONs)."""

    def _wrap(fn):
        CONTEXTUAL[name] = fn
        return fn

    return _wrap
