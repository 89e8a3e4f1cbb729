"""ACON parsing/validation — dicts → typed specs.

Reference semantics: ``utils/acon_utils.py:38-59`` + the spec dataclass
constructors in ``core/definitions.py``. Unknown keys raise early so config
typos fail on the driver before any Spark job is launched.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Type, TypeVar

from lakehouse_engine_spark.core.definitions import (
    DQFunctionSpec,
    DQSpec,
    InputFormat,
    InputSpec,
    MergeOptions,
    OutputFormat,
    OutputSpec,
    TerminatorSpec,
    TransformerSpec,
    TransformSpec,
    WrongArgumentsError,
)

T = TypeVar("T")


def _build(cls: Type[T], d: dict, **overrides: Any) -> T:
    """Instantiate a spec dataclass from a dict, rejecting unknown keys."""
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - names
    if unknown:
        raise WrongArgumentsError(f"{cls.__name__}: unknown keys {sorted(unknown)}")
    kwargs = dict(d)
    kwargs.update(overrides)
    return cls(**kwargs)


def parse_input_spec(d: dict) -> InputSpec:
    spec = _build(InputSpec, d)
    if spec.data_format and not InputFormat.exists(spec.data_format):
        raise WrongArgumentsError(f"Unsupported input format: {spec.data_format}")
    if not (spec.location or spec.db_table or spec.query or spec.df_name is not None):
        # jdbc/sap carry their source table in options (dbtable/query)
        opts = spec.options or {}
        exempt = spec.data_format in (
            InputFormat.DATAFRAME.value,
            InputFormat.RATE.value,
            # jdbc/sap carry their source in options/jdbc_args; a missing
            # dbtable must surface as Spark's own "Option ... is required"
            # (the reference's jdbc_format/wrong_arguments contract), not
            # as a parse-time guard
            InputFormat.JDBC.value,
            InputFormat.SAP_BW.value,
            InputFormat.SAP_B4.value,
        ) or (
            # sharepoint_opts carries the path contract itself
            spec.data_format == "sharepoint" and spec.sharepoint_opts is not None
        )
        _ = opts  # kept for clarity of the exemption rationale
        if not exempt:
            raise WrongArgumentsError(
                f"InputSpec {spec.spec_id}: one of location/db_table/query/df_name required"
            )
    return spec


def parse_transform_spec(d: dict) -> TransformSpec:
    transformers = [_build(TransformerSpec, t) for t in d.get("transformers", [])]
    return _build(
        TransformSpec, {k: v for k, v in d.items() if k != "transformers"}, transformers=transformers
    )


def parse_dq_spec(d: dict, execution_point: str = "in_motion") -> DQSpec:
    if d.get("dq_type") == "prisma":
        # PRISMA: resolve rule-table rows / validate meta contract into a
        # validator-shaped spec (reference utils/acon_utils.py:210-235).
        from lakehouse_engine_spark.core.exec_env import ExecEnv
        from lakehouse_engine_spark.utils.dq_utils import build_prisma_dq_spec

        d = build_prisma_dq_spec(ExecEnv.get_or_create(), dict(d), execution_point)
    fns = [_build(DQFunctionSpec, f) for f in d.get("dq_functions", [])]
    crit = [_build(DQFunctionSpec, f) for f in d.get("critical_functions", [])]
    rest = {k: v for k, v in d.items() if k not in ("dq_functions", "critical_functions")}
    # reference contract: tag_source_data=True NULLIFIES fail_on_error
    # (the run tags failing rows instead of aborting —
    # core/definitions.py:779-786 there)
    if rest.get("tag_source_data") and "fail_on_error" not in rest:
        rest["fail_on_error"] = False
    return _build(DQSpec, rest, dq_functions=fns, critical_functions=crit)


def parse_output_spec(d: dict) -> OutputSpec:
    rest = dict(d)
    merge = rest.pop("merge_opts", None)
    mbt = [_build(TransformerSpec, t) for t in rest.pop("streaming_micro_batch_transformers", [])]
    mbdq = [parse_dq_spec(s) for s in rest.pop("streaming_micro_batch_dq_processors", [])]
    spec = _build(
        OutputSpec,
        rest,
        merge_opts=_build(MergeOptions, merge) if merge else None,
        streaming_micro_batch_transformers=mbt,
        streaming_micro_batch_dq_processors=mbdq,
    )
    if spec.data_format not in OutputFormat.values():
        raise WrongArgumentsError(f"Unsupported output format: {spec.data_format}")
    return spec


def parse_terminator_spec(d: dict) -> TerminatorSpec:
    return _build(TerminatorSpec, d)


def parse_acon_lists(acon: dict) -> tuple:
    """Parse the five DataLoader spec lists from an ACON dict."""
    inputs: List[InputSpec] = [parse_input_spec(i) for i in acon.get("input_specs", [])]
    transforms: List[TransformSpec] = [
        parse_transform_spec(t) for t in acon.get("transform_specs", [])
    ]
    dqs: List[DQSpec] = [parse_dq_spec(s) for s in acon.get("dq_specs", [])]
    outputs: List[OutputSpec] = [parse_output_spec(o) for o in acon.get("output_specs", [])]
    terminators: List[TerminatorSpec] = [
        parse_terminator_spec(t) for t in acon.get("terminate_specs", [])
    ]
    if not inputs:
        raise WrongArgumentsError("ACON requires at least one input spec")
    return inputs, transforms, dqs, outputs, terminators
