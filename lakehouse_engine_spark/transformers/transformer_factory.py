"""Transformer registry and dispatch.

Reference parity: ``transformers/transformer_factory.py:36-77`` — the same
function names and argument shapes, so an ACON written for the reference
drops in unchanged. Each entry returns a ``Callable[[DataFrame], DataFrame]``
applied via ``df.transform(fn)``.

Beyond parity, the :mod:`lakehouse_engine_spark.datapipes` operators
(dedup/similarity/text analysis/multimodal) register here too, making them
ACON-driven first-class citizens.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame

from lakehouse_engine_spark.core.definitions import TransformerSpec, WrongArgumentsError
from lakehouse_engine_spark.transformers import (
    aggregators,
    column_creators,
    column_reshapers,
    condensers,
    custom_transformers,
    data_maskers,
    date_transformers,
    filters,
    joiners,
    null_handlers,
    optimizers,
    regex_transformers,
    repartitioners,
    unions,
    watermarker,
)

TransformerFn = Callable[[DataFrame], DataFrame]

# CORE transformers whose semantics require a complete (micro-)batch —
# the streaming planner relocates these (and everything after them) into
# foreachBatch. Reference ``transformers/transformer_factory.py:29-34``
# (the reference's exact streaming-unsupported set). Datapipes ops are
# NOT listed here: their gate is per-op ``streaming_ok`` metadata
# declared at registration (``datapipes/registry.py``), default GATED —
# a hand-maintained set drifted (r13 verdict: ~45 corpus-level ops were
# silently ungated and died mid-plan instead of relocating).
_CORE_UNSUPPORTED_STREAMING = frozenset(
    {
        "condense_record_mode_cdc",
        "group_and_rank",
        "with_auto_increment_id",
        "with_row_id",
    }
)


def unsupported_streaming_transformers() -> frozenset:
    """The derived gate set: core batch-only names plus every registered
    datapipes op not explicitly declared ``streaming_ok`` at
    registration. Gated ops (and everything after them in the chain) are
    relocated into foreachBatch by the DataLoader's micro-batch
    re-planner. For cross-RUN persistent-state dedup
    (dedup_incremental_*), foreachBatch is the DESIGN, not a fallback:
    each micro-batch is a plain batch frame, so the digest state carries
    across micro-batches and restarts; a retried batch may re-append
    digests (harmless — the anti-join is idempotent) and re-emit its
    survivors downstream (foreachBatch's at-least-once caveat)."""
    from lakehouse_engine_spark.datapipes import registry as dp_registry

    dp_names = set(dp_registry.SIMPLE) | set(dp_registry.CONTEXTUAL)
    return frozenset(
        _CORE_UNSUPPORTED_STREAMING | (dp_names - dp_registry.STREAMING_OK)
    )


def __getattr__(name: str):
    # Back-compat: the pre-r14 hand-maintained constant, now derived.
    if name == "UNSUPPORTED_STREAMING_TRANSFORMERS":
        return unsupported_streaming_transformers()
    raise AttributeError(name)

# name → factory(args…) -> TransformerFn. Entries marked ctx take the dataflow
# dict (spec_id → DataFrame) as first argument for cross-spec references.
_SIMPLE = {
    # reshapers
    "cast": column_reshapers.cast,
    "column_selector": column_reshapers.column_selector,
    "with_expressions": column_reshapers.with_expressions,
    "rename": column_reshapers.rename,
    "flatten_schema": column_reshapers.flatten_schema,
    "explode_columns": column_reshapers.explode_columns,
    "from_json": column_reshapers.from_json,
    "to_json": column_reshapers.to_json,
    "from_avro": column_reshapers.from_avro,
    "from_avro_with_registry": column_reshapers.from_avro_with_registry,
    # creators
    "with_row_id": column_creators.with_row_id,
    "with_auto_increment_id": column_creators.with_auto_increment_id,
    "with_literals": column_creators.with_literals,
    # filters
    "expression_filter": filters.expression_filter,
    "column_filter_exp": filters.column_filter_exp,
    "incremental_filter": filters.incremental_filter,
    "drop_duplicate_rows": filters.drop_duplicate_rows,
    # aggregators / condensers
    "get_max_value": aggregators.get_max_value,
    "group_and_rank": condensers.group_and_rank,
    "condense_record_mode_cdc": condensers.condense_record_mode_cdc,
    # dates
    "add_current_date": date_transformers.add_current_date,
    "convert_to_date": date_transformers.convert_to_date,
    "convert_to_timestamp": date_transformers.convert_to_timestamp,
    "format_date": date_transformers.format_date,
    "get_date_hierarchy": date_transformers.get_date_hierarchy,
    # nulls / masking / regex
    "replace_nulls": null_handlers.replace_nulls,
    "hash_masker": data_maskers.hash_masker,
    "column_dropper": data_maskers.column_dropper,
    "with_regex_value": regex_transformers.with_regex_value,
    # physical hints
    "repartition": repartitioners.repartition,
    "coalesce": repartitioners.coalesce,
    "cache": optimizers.cache,
    "persist": optimizers.persist,
    "unpersist": optimizers.unpersist,
    # streaming
    "with_watermark": watermarker.with_watermark,
    # escape hatches
    "custom_transformation": custom_transformers.custom_transformation,
    "sql_transformation": custom_transformers.sql_transformation,
}

_CONTEXTUAL = {
    "join": joiners.join_transformer,
    "union": unions.union,
    "union_by_name": unions.union_by_name,
}


def _datapipes_registry() -> dict:
    """Lazy import so core transformers don't depend on datapipes."""
    from lakehouse_engine_spark.datapipes import registry as dp_registry

    return dp_registry.SIMPLE


def _datapipes_contextual() -> dict:
    """Lazy import of datapipes ops that resolve dataflow spec_ids."""
    from lakehouse_engine_spark.datapipes import registry as dp_registry

    return dp_registry.CONTEXTUAL


class TransformerFactory:
    """Resolves a TransformerSpec into an applicable closure."""

    @staticmethod
    def get_transformer(
        spec: TransformerSpec, data: Optional[Dict[str, DataFrame]] = None
    ) -> TransformerFn:
        name, args = spec.function, dict(spec.args or {})
        # pure-JSON ACON convention (reference
        # transformer_factory.py:97-98): incremental_filter's
        # increment_df may arrive as an upstream spec_id string —
        # resolve it from the dataflow dict (a real DataFrame passes
        # through untouched for programmatic callers)
        if name == "incremental_filter" and isinstance(
            args.get("increment_df"), str
        ):
            ref = args["increment_df"]
            if not data or ref not in data:
                raise WrongArgumentsError(
                    f"incremental_filter: increment_df references unknown "
                    f"spec_id {ref!r}"
                )
            args["increment_df"] = data[ref]
        if name in _SIMPLE:
            return _SIMPLE[name](**args)
        if name in _CONTEXTUAL:
            return _CONTEXTUAL[name](data or {}, **args)
        dp = _datapipes_registry()
        if name in dp:
            return dp[name](**args)
        dp_ctx = _datapipes_contextual()
        if name in dp_ctx:
            return dp_ctx[name](data or {}, **args)
        raise WrongArgumentsError(f"Unknown transformer: {name}")

    @staticmethod
    def available() -> list:
        return sorted(
            set(_SIMPLE)
            | set(_CONTEXTUAL)
            | set(_datapipes_registry())
            | set(_datapipes_contextual())
        )
