"""SQL-string builders for wide per-dimension expression chains.

The scalar-codegen posture (dot products and component extraction as
plain column arithmetic — see dedup.py's "SCALAR expansion" notes)
builds expressions with one term per vector dimension. Chaining those
with Column operators costs ~4 py4j driver round-trips per term — a
64-dim dot product is ~260 blocking socket round-trips built link by
link, and the semantic-dedup family was measured at 10-11k round-trips
per query CONSTRUCTION (r14; ~1.5 s of driver latency per query before
any job runs). Building the identical expression as ONE SQL string
hands the whole tree to the JVM parser in a single call.

Equivalence contract: every builder here produces the same operator
tree the Column-chain form produced — in particular the SAME
left-associative fold order, because float summation order is pinned
by the SQL oracles (`a + b + c` parses as `(a + b) + c`, exactly the
order `sum(generator, start)` chained).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_cols(lfmt: str, rfmt: str, dim: int) -> Column:
    """Left-associative dot product over paired scalar columns.

    ``lfmt``/``rfmt`` are format strings with ``{i}`` (e.g. ``"l.__e{i}"``).
    """
    return F.expr(
        " + ".join(
            f"{lfmt.format(i=i)} * {rfmt.format(i=i)}" for i in range(dim)
        )
    )


def dot_elements(lhs: str, rhs: str, dim: int) -> Column:
    """Left-associative dot product via ``element_at`` over two array
    columns (1-based, the Column form's convention)."""
    return F.expr(
        " + ".join(
            f"element_at({lhs}, {i}) * element_at({rhs}, {i})"
            for i in range(1, dim + 1)
        )
    )


def element_aliases(src: str, dim: int, prefix: str) -> List[Column]:
    """``[element_at(src, i+1) AS {prefix}{i} ...]`` — one parser call
    per column instead of three Column calls."""
    return [
        F.expr(f"element_at({src}, {i + 1}) as {prefix}{i}")
        for i in range(dim)
    ]
