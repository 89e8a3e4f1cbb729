"""GAB (Gold Asset Builder) utilities — cadence windows, calendar, templating.

Re-expresses the reference's GAB support logic Spark-first:

* cadence window arithmetic (reference ``core/gab_manager.py:22-187``,
  ``utils/gab_utils.py:236-364``) in pure ``datetime`` (no pendulum);
* the calendar dimension (reference expects a pre-materialized table with
  weekstart/weekend/month/quarter/year columns,
  ``tests/resources/feature/gab/setup/column_list/calendar.json``) is
  *generated* with ``sequence()`` + ``date_trunc`` — one small Spark job,
  broadcast-joined downstream, no external table needed;
* a minimal template renderer covering the jinja subset the reference's
  stage SQL files actually use (``{{ var }}`` and one-level
  ``{% if X == N %} .. {% else %} .. {% endif %}``), so no jinja2 dependency;
* partition-pruning predicate synthesis
  (reference ``utils/gab_utils.py:509-639``).
"""

from __future__ import annotations

import calendar as _calendar
import re
from datetime import date, datetime, timedelta
from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

ORDERED_CADENCES: Dict[str, int] = {
    "DAY": 1,
    "WEEK": 2,
    "MONTH": 3,
    "QUARTER": 4,
    "YEAR": 5,
}

DATE_FMT = "%Y-%m-%d"


def _as_dt(d) -> datetime:
    if isinstance(d, datetime):
        return d.replace(hour=0, minute=0, second=0, microsecond=0)
    if isinstance(d, date):
        return datetime(d.year, d.month, d.day)
    return datetime.strptime(str(d)[:10], DATE_FMT)


def week_start(d: datetime, start_of_week: str = "MONDAY") -> datetime:
    """First day of the week containing ``d`` (Monday- or Sunday-started)."""
    dow = d.weekday()  # Mon=0..Sun=6
    if start_of_week.upper() == "SUNDAY":
        back = (dow + 1) % 7
    else:
        back = dow
    return d - timedelta(days=back)


def cadence_start(d, cadence: str, start_of_week: str = "MONDAY") -> datetime:
    """Snap ``d`` down to the start of its cadence period."""
    d = _as_dt(d)
    cadence = cadence.upper()
    if cadence == "DAY":
        return d
    if cadence == "WEEK":
        return week_start(d, start_of_week)
    if cadence == "MONTH":
        return d.replace(day=1)
    if cadence == "QUARTER":
        return d.replace(month=3 * ((d.month - 1) // 3) + 1, day=1)
    if cadence == "YEAR":
        return d.replace(month=1, day=1)
    raise ValueError(f"Unknown cadence: {cadence}")


def cadence_end(d, cadence: str, start_of_week: str = "MONDAY") -> datetime:
    """Snap ``d`` up to the end (inclusive) of its cadence period."""
    d = _as_dt(d)
    cadence = cadence.upper()
    if cadence == "DAY":
        return d
    if cadence == "WEEK":
        return week_start(d, start_of_week) + timedelta(days=6)
    if cadence == "MONTH":
        return d.replace(day=_calendar.monthrange(d.year, d.month)[1])
    if cadence == "QUARTER":
        last_month = 3 * ((d.month - 1) // 3) + 3
        return d.replace(
            month=last_month, day=_calendar.monthrange(d.year, last_month)[1]
        )
    if cadence == "YEAR":
        return d.replace(month=12, day=31)
    raise ValueError(f"Unknown cadence: {cadence}")


def cadence_configuration_at_end_date(
    end_date, week_start: str = "MONDAY"
) -> Dict[str, str]:
    """Which cadences conclude exactly at ``end_date``.

    Mirrors reference ``utils/gab_utils.py:236-281`` — e.g. 2024-03-31 is a
    MONTH and QUARTER end, so MONTH/QUARTER use cases are due. The WEEK
    check honours the use case's configured week anchor (the reference sets
    pendulum's week boundaries from ``start_of_the_week``,
    ``algorithms/gab.py:535-547`` there) — with SUNDAY weeks a Saturday
    end_date makes WEEK due. DAY is always due.
    """
    end_date = _as_dt(end_date)
    due: Dict[str, str] = {}
    if end_date == cadence_end(end_date, "YEAR"):
        due["YEAR"] = "N"
    if end_date == cadence_end(end_date, "QUARTER"):
        due["QUARTER"] = "N"
    if end_date == cadence_end(end_date, "MONTH"):
        due["MONTH"] = "N"
    if end_date == cadence_end(end_date, "WEEK", week_start):
        due["WEEK"] = "N"
    due["DAY"] = "N"
    return due


def reconciliation_cadences(
    cadence: str,
    selected_reconciliation_window: Dict[str, dict],
    cadence_config_at_end_date: Dict[str, str],
    rerun_flag: str,
) -> Dict[str, str]:
    """Derive the reconciliation cadences to run, biggest first.

    Mirrors reference ``utils/gab_utils.py:283-448``: the base cadence runs
    without snapshot; each configured reconciliation cadence runs when its
    period concludes at the end date (or always on rerun for smaller-than-base
    cadences), carrying its configured snapshot flag.
    """
    snapshot_config: Dict[str, str] = {cadence: "N"}
    for cad in ORDERED_CADENCES:
        sel = selected_reconciliation_window.get(cad)
        if sel is not None:
            snapshot_config[cad] = sel.get("snapshot", "N")
    # biggest cadence first
    snapshot_config = dict(
        sorted(snapshot_config.items(), key=lambda kv: -ORDERED_CADENCES[kv[0]])
    )

    no_snap = {k: v for k, v in snapshot_config.items() if v == "N"}
    with_snap = {k: v for k, v in snapshot_config.items() if v == "Y"}

    configured: Dict[str, str] = {}
    for cad, flag in no_snap.items():
        if cad in cadence_config_at_end_date:
            configured[cad] = flag
            break  # only the biggest concluded no-snapshot cadence
    configured.update(with_snap)
    if not configured and cadence in cadence_config_at_end_date:
        configured[cadence] = "N"

    to_execute: Dict[str, str] = {}
    for cad, flag in configured.items():
        if (
            ORDERED_CADENCES[cadence] > ORDERED_CADENCES[cad] and rerun_flag == "Y"
        ) or cad in cadence_config_at_end_date:
            to_execute[cad] = flag
    return dict(
        sorted(to_execute.items(), key=lambda kv: -ORDERED_CADENCES[kv[0]])
    )


def derived_reconciliation_cadence(
    cadence: str, reconciliation_cadence: str, rerun_flag: str, snapshot_flag: str
) -> str:
    """Pick the cadence that drives the extended bucket window.

    Mirrors reference ``core/gab_manager.py:84-120``.
    """
    order = ORDERED_CADENCES
    if rerun_flag == "Y":
        if order[cadence] > order[reconciliation_cadence]:
            return cadence
        return reconciliation_cadence
    if (
        order[cadence] > order[reconciliation_cadence] and snapshot_flag == "Y"
    ) or order[cadence] < order[reconciliation_cadence]:
        return reconciliation_cadence
    if order[cadence] > order[reconciliation_cadence] and snapshot_flag == "N":
        return cadence
    return reconciliation_cadence


def _snap(
    cadence: str,
    derived: str,
    start_dt: datetime,
    end_dt: datetime,
    query_type: str,
    current_date: datetime,
) -> Tuple[datetime, datetime]:
    """Snap [start, end] to derived-cadence bounds; re-snap WEEK; end-exclusive.

    Mirrors reference ``core/gab_manager.py:122-187`` (incl. the NAM +1 day
    and the current-date cap).
    """
    s = cadence_start(start_dt, derived)
    e = cadence_end(end_dt, derived)
    if cadence.upper() == "WEEK":
        # re-extend to exact week bounds (ISO Monday weeks, like pendulum)
        s = week_start(s, "MONDAY")
        e = week_start(e, "MONDAY") + timedelta(days=6)
    e = e + timedelta(days=1)
    if e >= current_date:
        e = current_date
    if query_type == "NAM":
        e = e + timedelta(days=1)
    return s, e


def extended_window_calculator(
    cadence: str,
    reconciliation_cadence: str,
    current_date,
    start_date,
    end_date,
    query_type: str,
    rerun_flag: str,
    snapshot_flag: str,
) -> Tuple[datetime, datetime, datetime, datetime]:
    """Bucket and filter windows for a cadence run.

    Returns ``(bucket_start, bucket_end, filter_start, filter_end)``;
    bucket dates bound the calendar join, filter dates bound the source scan
    (end-exclusive). Mirrors reference ``core/gab_manager.py:22-82``.
    """
    current_date = _as_dt(current_date)
    start_dt, end_dt = _as_dt(start_date), _as_dt(end_date)
    derived = derived_reconciliation_cadence(
        cadence, reconciliation_cadence, rerun_flag, snapshot_flag
    )
    bucket = _snap(cadence, derived, start_dt, end_dt, query_type, current_date)
    filter_cad = (
        reconciliation_cadence
        if ORDERED_CADENCES[cadence] < ORDERED_CADENCES[reconciliation_cadence]
        else cadence
    )
    filt = _snap(cadence, filter_cad, start_dt, end_dt, query_type, current_date)
    return bucket[0], bucket[1], filt[0], filt[1]


def partition_condition(start_date: str, end_date: str) -> str:
    """Year/month/day pruning predicate for partitioned insights sources.

    Same intent as reference ``utils/gab_utils.py:509-639``: synthesize a
    SQL predicate over ``year``/``month``/``day`` partition columns covering
    [start, end] so Catalyst can prune partitions.
    """
    s, e = _as_dt(start_date), _as_dt(end_date)
    if s.year != e.year:
        return f"year BETWEEN {s.year} AND {e.year}"
    if s.month != e.month:
        return (
            f"year = {s.year} AND month BETWEEN {s.month} AND {e.month}"
        )
    return (
        f"year = {s.year} AND month = {s.month} "
        f"AND day BETWEEN {s.day} AND {e.day}"
    )


_IF_RE = re.compile(
    # the left operand may already be a PRE-SUBSTITUTED literal (the
    # reference replaces replace_offset_value in the file text before
    # Jinja runs) — accept signed numbers on either side
    r"\{%\s*if\s+(-?\w+)\s*==\s*(-?\w+)\s*%\}(.*?)"
    r"(?:\{%\s*else\s*%\}(.*?))?\{%\s*endif\s*%\}",
    re.DOTALL,
)
_VAR_RE = re.compile(r"\{\{\s*(\w+)\s*\}\}")


def render_template(text: str, variables: Dict[str, object]) -> str:
    """Render the jinja subset used by GAB stage SQL files.

    Supports ``{{ var }}`` substitution and one-level
    ``{% if name == literal %} .. {% else %} .. {% endif %}`` — everything the
    reference fixtures use (e.g.
    ``tests/resources/feature/gab/usecases/order_events/1_order_events.sql``).
    """

    def _eval_if(m: re.Match) -> str:
        name, literal, then_branch, else_branch = m.groups()
        value = variables.get(name, name)  # bare tokens may be pre-substituted
        try:
            matched = float(value) == float(literal)  # type: ignore[arg-type]
        except (TypeError, ValueError):
            matched = str(value) == str(literal)
        return then_branch if matched else (else_branch or "")

    out = _IF_RE.sub(_eval_if, text)
    return _VAR_RE.sub(
        lambda m: str(variables.get(m.group(1), m.group(0))), out
    )


CALENDAR_VIEW = "df_cal"


def create_calendar_view(
    spark: SparkSession,
    start_date: str,
    end_date: str,
    calendar_table: Optional[str] = None,
    view_name: str = CALENDAR_VIEW,
) -> DataFrame:
    """Create the GAB calendar dimension as a temp view.

    When ``calendar_table`` exists in the catalog it is used verbatim
    (reference behavior, ``algorithms/gab.py:53-55``); otherwise the calendar
    is generated with ``sequence()`` + ``date_trunc`` — tiny (one row per
    day), computed once per run, and always broadcast in the cadence join.
    Columns follow the reference calendar contract
    (``tests/resources/feature/gab/setup/column_list/calendar.json``).
    """
    # Fall through to the generated calendar ONLY when the configured
    # table is genuinely absent — a read failure on an existing table
    # must propagate, or a transient error silently swaps the org's
    # fiscal calendar for the generated one and rolls up wrong buckets.
    if calendar_table and spark.catalog.tableExists(calendar_table):
        df = spark.read.table(calendar_table)
        df.createOrReplaceTempView(view_name)
        return df
    df = spark.sql(
        f"""
        SELECT
          calendar_date,
          date_format(calendar_date, 'EEEE') AS day_en,
          weekofyear(calendar_date) AS weeknum_mon,
          date(date_trunc('WEEK', calendar_date)) AS weekstart_mon,
          date_add(date(date_trunc('WEEK', calendar_date)), 6) AS weekend_mon,
          date_sub(
            date(date_trunc('WEEK', date_add(calendar_date, 1))), 1
          ) AS weekstart_sun,
          date_add(
            date(date_trunc('WEEK', date_add(calendar_date, 1))), 5
          ) AS weekend_sun,
          date(date_trunc('MONTH', calendar_date)) AS month_start,
          last_day(calendar_date) AS month_end,
          date(date_trunc('QUARTER', calendar_date)) AS quarter_start,
          date_sub(
            add_months(date(date_trunc('QUARTER', calendar_date)), 3), 1
          ) AS quarter_end,
          date(date_trunc('YEAR', calendar_date)) AS year_start,
          date_sub(
            add_months(date(date_trunc('YEAR', calendar_date)), 12), 1
          ) AS year_end
        FROM (
          SELECT explode(sequence(
            to_date('{start_date}'), to_date('{end_date}')
          )) AS calendar_date
        )
        """
    )
    df.createOrReplaceTempView(view_name)
    return df
