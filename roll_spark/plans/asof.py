"""As-of (nearest-event) join — the canonical timeseries enrichment op.

Matches every left row to the single right row with the greatest
``on`` <= left.``on`` (direction="backward", inclusive — DuckDB/pandas
default) or the smallest ``on`` >= left.``on`` ("forward"), within the
same ``by`` series, optionally bounded by ``tolerance`` seconds.

Spark-first plan — the union + last-non-null trick, NOT a range join:

    1. union the tagged right rows into the left stream
       (right payload columns are typed NULLs on left rows and
       vice versa — a pure map-side projection);
    2. one window per series ordered by (on, is_left): every left
       row picks up the most recent right payload with
       ``last(col, ignorenulls=True)`` over UNBOUNDED PRECEDING;
       right rows sort BEFORE left rows at equal ``on``, which is
       exactly inclusive as-of semantics;
    3. filter back to left rows; null the match out when it falls
       outside ``tolerance``.

Cost: ONE hash exchange on ``by`` + ONE sort on (on, tag) + ONE
WindowExec over the union — O((|L|+|R|) log chunk) per partition.  A
naive `l.ts >= r.ts` range join is a per-series cross product
(O(|L|·|R|)) that Spark can only execute as BroadcastNestedLoop or an
exploded theta-join; at 10^12 left rows that plan is dead on arrival,
while this one scales exactly like the engine's rolling windows
(plan budget asserted in tools/plan_audit.py).

Matches pandas.merge_asof semantics (tests/test_asof.py proves it on
randomized fixtures) and DuckDB ASOF JOIN (driver queries
``asof_join_events`` / ``asof_join_fwd_tol``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from roll_spark.operators.base import Cols, _as_list

_TAG = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Cols = (),
    *,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    matched_on: str | None = None,
) -> DataFrame:
    """Enrich ``left`` with the as-of matching row of ``right``.

    Parameters
    ----------
    on : ordering column, present in both inputs (timestamp or numeric).
    by : series key column(s), present in both inputs.
    right_cols : right payload columns to carry (default: every right
        column except ``on``/``by``).  Names must not collide with left
        columns — alias them on the way in.
    direction : "backward" (greatest right.on <= left.on, inclusive) or
        "forward" (smallest right.on >= left.on, inclusive).
    tolerance : max |left.on - right.on| in seconds (or plain units for
        numeric ``on``); matches beyond it become NULL.
    matched_on : output column holding the matched right ``on`` value
        (default ``f"{on}_matched"``).

    Returns ``left`` + ``matched_on`` + ``right_cols``, one row per left
    row (unmatched rows keep NULL payloads) — left-join cardinality.

    ``right`` must be unique per (by, on) for a deterministic payload
    (same contract as pandas.merge_asof) — pre-aggregate duplicates,
    e.g. ``right.groupBy(*by, on).agg(...)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = _as_list(by)
    matched_on = matched_on or f"{on}_matched"
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, on)]
    right_cols = list(right_cols)
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")

    left_payload = [c for c in left.columns if c not in (*keys, on)]
    l_types = dict(zip(left.schema.names, left.schema.fields))
    r_types = dict(zip(right.schema.names, right.schema.fields))

    def _null(field):
        return F.lit(None).cast(field.dataType)

    # symmetric projections onto the union schema (map-side only)
    l_side = left.select(
        *keys,
        F.col(on),
        F.lit(1).alias(_TAG),
        *[F.col(c) for c in left_payload],
        _null(r_types[on]).alias(matched_on),
        *[_null(r_types[c]).alias(c) for c in right_cols],
    )
    r_side = right.select(
        *keys,
        F.col(on),
        F.lit(0).alias(_TAG),
        *[_null(l_types[c]).alias(c) for c in left_payload],
        F.col(on).alias(matched_on),
        *[F.col(c) for c in right_cols],
    )
    unioned = l_side.unionByName(r_side)

    asc = direction == "backward"
    order = [F.col(on).asc() if asc else F.col(on).desc(), F.col(_TAG).asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [matched_on, *right_cols]
    out = unioned.select(
        *keys,
        on,
        _TAG,
        *left_payload,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
    ).filter(F.col(_TAG) == 1)

    if tolerance is not None:
        # exact int64 µs arithmetic, the same rule as sessionize /
        # roll_time (_epoch_micros): a double-seconds comparison has a
        # ~0.24 µs ulp at current epochs, enough to flip an event that
        # sits exactly on the tolerance boundary
        from roll_spark.operators.time_windows import _epoch_micros

        diff = _epoch_micros(out, on) - _epoch_micros(out, matched_on)
        if direction == "forward":
            diff = -diff
        tol_us = int(round(float(tolerance) * 1_000_000))
        keep = F.col(matched_on).isNotNull() & (diff <= F.lit(tol_us))
        out = out.select(
            *keys,
            on,
            _TAG,
            *left_payload,
            *[F.when(keep, F.col(c)).alias(c) for c in carried],
        )
    return out.drop(_TAG)
