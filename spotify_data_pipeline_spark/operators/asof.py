"""As-of join (SURVEY.md §2.3 J6 — an operator Spark lacks natively).

``asof_join(left, right, on, by)``: for each left row, the most recent
right row with ``right.on <= left.on`` within the same ``by`` group
(backward direction, like pandas ``merge_asof``).

Two implementations:

- ``asof_join``: pure DataFrame — union both sides tagged, one window
  pass carrying the last right value forward (`F.last(ignorenulls=True)`).
  One shuffle on the `by` key; linear, no pairwise blow-up; this is the
  100 TB path. Supports backward/forward/nearest direction and a
  tolerance bound. 'nearest' (round 5) runs the backward and forward
  carries as TWO window passes over the SAME partitioning — one
  shuffle, two sorts — then picks per-row by smaller distance
  (ties → backward, matching pandas' prior-row preference).
- ``asof_join_pandas``: ``applyInPandas`` + ``pd.merge_asof`` per group —
  kept as a cross-check implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """As-of join via tagged union + running ``last`` window.

    ``direction``: 'backward' (default — most recent right row with
    right.on <= left.on), 'forward' (earliest right row with
    right.on >= left.on; implemented as the backward pass over a
    descending order — same single shuffle), or 'nearest' (whichever
    of the two is closer to left.on; equidistant ties take the
    backward match — pandas' prior-row preference. Both carries run
    over the SAME `by` partitioning, so the plan still shuffles ONCE;
    the second window adds a sort, not an exchange).
    ``tolerance``: optional max distance — a Column interval/number; a
    match farther than it from left.on is nulled out (pandas
    merge_asof semantics; for 'nearest' the chosen side's distance is
    what's tested).

    Ties on the `on` column: a right row at exactly left.on is matched
    (<= / >=), achieved by sorting right rows before left rows at
    equal keys.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    if "_ron" in value_cols:
        raise ValueError("value column name '_ron' is reserved by asof_join")

    # The matched right row travels as ONE struct (_ron + values), and
    # the running `last` carries the STRUCT with ignorenulls — the
    # struct is non-null for every right row even when its value
    # fields are NULL, so the matched timestamp and the matched values
    # can never desynchronize (carrying them as separate last() columns
    # silently paired the timestamp of one right row with the most
    # recent NON-NULL value of another — found by review).
    rrow = F.struct(
        F.col(on).alias("_ron"), *[F.col(c) for c in value_cols]
    )
    rrow_type = right.select(rrow).schema[0].dataType

    l_tag = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(1).alias("_side"),  # left sorts after right at equal _on
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(rrow_type).alias("_rrow"),
    )
    r_tag = right.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*left.columns)).schema[0].dataType).alias("_lrow"),
        rrow.alias("_rrow"),
    )

    unioned = l_tag.unionByName(r_tag)

    def _unpack(carried: DataFrame) -> DataFrame:
        out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
        out_cols += [F.col(f"_r.{c}").alias(f"{c}{suffix}") for c in value_cols]
        out_cols += [F.col("_r._ron").alias(f"{on}{suffix}")]
        return carried.select(*out_cols)

    def _apply_tolerance(carried: DataFrame) -> DataFrame:
        r_on = F.col("_r._ron")
        dist = F.when(
            r_on <= F.col(f"_lrow.{on}"), F.col(f"_lrow.{on}") - r_on
        ).otherwise(r_on - F.col(f"_lrow.{on}"))
        in_tol = r_on.isNotNull() & (dist <= tolerance)
        return carried.select(
            "_lrow", F.when(in_tol, F.col("_r")).alias("_r")
        )

    if direction == "nearest":
        w_b = (
            Window.partitionBy("_by")
            .orderBy(F.col("_on").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_f = (
            Window.partitionBy("_by")
            .orderBy(F.col("_on").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        both = unioned.select(
            "_lrow",
            "_side",
            F.last("_rrow", ignorenulls=True).over(w_b).alias("_rb"),
            F.last("_rrow", ignorenulls=True).over(w_f).alias("_rf"),
        ).where(F.col("_side") == 1)
        on_b, on_f = F.col("_rb._ron"), F.col("_rf._ron")
        dist_b = F.col(f"_lrow.{on}") - on_b
        dist_f = on_f - F.col(f"_lrow.{on}")
        choose_b = on_f.isNull() | (on_b.isNotNull() & (dist_b <= dist_f))
        carried = both.select(
            "_lrow",
            F.when(choose_b, F.col("_rb")).otherwise(F.col("_rf")).alias("_r"),
        )
    else:
        on_order = F.col("_on").asc() if direction == "backward" else F.col("_on").desc()
        w = (
            Window.partitionBy("_by")
            .orderBy(on_order, F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.select(
            "_lrow",
            "_side",
            F.last("_rrow", ignorenulls=True).over(w).alias("_r"),
        ).where(F.col("_side") == 1).select("_lrow", "_r")

    if tolerance is not None:
        carried = _apply_tolerance(carried)
    return _unpack(carried)


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join via cogrouped ``applyInPandas`` + ``pd.merge_asof``.

    Arrow-batched; one shuffle on the `by` key; per-group pandas sort.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    right_sel = right.select(by, on, *value_cols)

    out_schema_fields = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
    rs = right_sel.schema
    out_schema_fields += [f"{c}{suffix} {rs[c].dataType.simpleString()}" for c in value_cols]
    out_schema_fields += [f"{on}{suffix} {rs[on].dataType.simpleString()}"]
    out_schema = ", ".join(out_schema_fields)

    l_cols, r_on, r_by = list(left.columns), on, by
    vcols, sfx = list(value_cols), suffix

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=l_cols + [f"{c}{sfx}" for c in vcols] + [f"{r_on}{sfx}"])
        lpdf = lpdf.sort_values(r_on, kind="mergesort")
        rpdf = rpdf.sort_values(r_on, kind="mergesort")
        rpdf = rpdf.rename(columns={c: f"{c}{sfx}" for c in vcols})
        rpdf[f"{r_on}{sfx}"] = rpdf[r_on]
        rpdf = rpdf.drop(columns=[r_by])
        merged = pd.merge_asof(lpdf, rpdf, on=r_on, direction="backward")
        return merged[l_cols + [f"{c}{sfx}" for c in vcols] + [f"{r_on}{sfx}"]]

    return left.groupBy(by).cogroup(right_sel.groupBy(by)).applyInPandas(merge, out_schema)
