"""Per-column stats checks compiled into ONE shared aggregation pass.

RAQC re-walks its full arrays once per masking/stat step (SURVEY.md §4.1);
the Spark-first design computes every stat-family metric for every partition
in a single ``groupBy(partition_id).agg(...)`` — one scan, one (partial+final,
map-side-combined) shuffle, after which verdict projection is free.

Check kinds handled here: null_rate, empty_content, bounds, col_stats,
length_quantiles, approx_distinct (SURVEY.md §2.2 P2/P3, §2.4 A1/A3/A4).
length_quantiles defaults to BINNED cumulative counts (method="bins") — one
count_if per log-bin edge in the same codegen agg; method="approx" selects
percentile_approx (measured to dominate the contract at 10M rows: its
object-agg QuantileSummaries.compress burned ~90% of executor CPU).
Row-level violations exist only for the predicate checks (null/empty/bounds);
quantile/distinct checks are stats-only, like RAQC's basin stats report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raqc_spark.checks.blocks import threshold_pass_col, verdicts_from_partition_agg
from raqc_spark.contract import Check
from raqc_spark.results import VIOLATION_COLS

APPROX_PERCENTILE_ACCURACY = 10_000

PREDICATE_KINDS = {"null_rate", "empty_content", "bounds"}
STATS_KINDS = PREDICATE_KINDS | {"col_stats", "length_quantiles", "approx_distinct"}


def violation_predicate(check: Check) -> Column:
    """Row-level violation predicate for predicate-family checks.

    Checks on ``content`` read the derived ``content_length`` instead — the
    raw column is dropped right after derivation (functions.with_derived),
    and NULL/empty are recoverable from the length.
    """
    if check.column == "content":
        length = F.col("content_length")
        if check.kind == "null_rate":
            return length.isNull()
        if check.kind == "empty_content":
            return length.isNotNull() & (length == 0)
    col = F.col(check.column)
    if check.kind == "null_rate":
        return col.isNull()
    if check.kind == "empty_content":
        return col.isNotNull() & (F.length(col) == 0)
    if check.kind == "bounds":
        lo, hi = check.p.get("lo"), check.p.get("hi")
        pred = F.lit(False)
        if lo is not None:
            pred = pred | (col < F.lit(lo))
        if hi is not None:
            pred = pred | (col > F.lit(hi))
        return col.isNotNull() & pred
    raise ValueError(f"{check.kind} has no row-level predicate")


def _quantile_conf(check: Check) -> tuple[int, float, float, bool, list[float]]:
    p = check.p
    return (
        int(p.get("num_bins", 128)),
        float(p.get("lo", 0.0)),
        float(p.get("hi", 14.0)),
        bool(p.get("log_scale", True)),
        list(p.get("qs", (0.5, 0.95, 0.99))),
    )


def _quantile_edges(num_bins: int, lo: float, hi: float) -> list[float]:
    width = (hi - lo) / num_bins
    return [lo + width * (i + 1) for i in range(num_bins)]


def _agg_exprs(check: Check) -> list[Column]:
    n = check.name
    if check.kind in PREDICATE_KINDS:
        return [F.count_if(violation_predicate(check)).alias(f"v_{n}")]
    col = F.col(check.column)
    if check.kind == "col_stats":
        return [
            F.min(col).alias(f"min_{n}"),
            F.max(col).alias(f"max_{n}"),
            F.avg(col).alias(f"mean_{n}"),
            F.stddev_samp(col).alias(f"std_{n}"),
        ]
    if check.kind == "length_quantiles":
        if check.p.get("method", "bins") == "approx":
            qs = list(check.p.get("qs", (0.5, 0.95, 0.99)))
            return [
                F.percentile_approx(
                    col, qs, APPROX_PERCENTILE_ACCURACY
                ).alias(f"q_{n}")
            ]
        # Default: binned cumulative counts — one count_if per edge inside
        # the SAME fused codegen hash agg. percentile_approx is a
        # TypedImperativeAggregate whose QuantileSummaries.compress was
        # measured (jstack, 10.6M-row run) to dominate the entire contract
        # and degrade superlinearly with task concurrency; the bin counts
        # shuffle O(bins) longs, stay in whole-stage codegen, and merge
        # exactly across partitions/checkpoints. Quantiles resolve to bin
        # UPPER edges (error = one bin width; log-space by default for
        # heavy-tailed lengths). The (possibly log-scaled) value is read
        # from the `_lqv_<name>` column compile_stats_pass projects below
        # the agg — aggregate codegen does NOT common-subexpression-
        # eliminate across buffers, so an inline log1p would be evaluated
        # once PER EDGE per row (128×).
        num_bins, lo, hi, _log_scale, _ = _quantile_conf(check)
        value = F.col(f"_lqv_{n}")
        return [F.count(col).alias(f"nn_{n}")] + [
            F.count_if(value <= F.lit(e)).alias(f"ble_{n}_{i}")
            for i, e in enumerate(_quantile_edges(num_bins, lo, hi))
        ]
    if check.kind == "approx_distinct":
        return [F.approx_count_distinct(col).alias(f"d_{n}")]
    raise ValueError(f"unsupported stats kind {check.kind}")


def _bin_quantile(check: Check, q: float) -> Column:
    """Quantile from binned cumulative counts: the first edge whose
    cumulative count reaches q·n (clamped to the top edge for values
    beyond hi — with log bins hi is pinned above any legal length)."""
    n = check.name
    num_bins, lo, hi, log_scale, _ = _quantile_conf(check)
    edges = _quantile_edges(num_bins, lo, hi)
    cnts = F.array(*[F.col(f"ble_{n}_{i}") for i in range(num_bins)])
    target = F.lit(q) * F.col(f"nn_{n}")
    idx = F.size(F.filter(cnts, lambda c: c < target))  # edges below target
    edge = F.element_at(
        F.array(*[F.lit(e) for e in edges]),
        F.least(idx + F.lit(1), F.lit(num_bins)),
    )
    out = F.expm1(edge) if log_scale else edge
    # zero non-null values: no count is < 0 -> idx=0 would fabricate the
    # first bin edge as a quantile; return NULL like percentile_approx does
    return F.when(F.col(f"nn_{n}") == 0, F.lit(None).cast("double")).otherwise(
        out
    )


def _metric(check: Check) -> Column:
    n = check.name
    if check.kind in PREDICATE_KINDS:
        # exact integer counts → deterministic rate (SURVEY.md §7.3.2)
        return F.col(f"v_{n}") / F.col("n_rows")
    if check.kind == "col_stats":
        return F.col(f"mean_{n}")
    if check.kind == "length_quantiles":
        # verdict on the top quantile
        if check.p.get("method", "bins") == "approx":
            return F.element_at(F.col(f"q_{n}"), -1)
        qs = _quantile_conf(check)[4]
        return _bin_quantile(check, qs[-1])
    if check.kind == "approx_distinct":
        return F.col(f"d_{n}")
    raise ValueError(check.kind)


def compile_stats_pass(
    df: DataFrame, checks: list[Check]
) -> tuple[DataFrame, DataFrame | None]:
    """All stats-family checks in one agg. ``df`` must already carry
    ``partition_id`` (functions.with_partition_id). Returns (verdicts,
    violations-or-None)."""
    stats = [c for c in checks if c.kind in STATS_KINDS]
    if not stats:
        raise ValueError("no stats-family checks in contract")
    # approx_distinct method="salted": two-phase Datasketches HLL spread over
    # salt buckets (checks/sketches.py) — the explicit hot-key path for
    # skewed mega-repos. It needs its own two-stage groupBy, so it can't
    # ride the fused single-agg pass; its verdicts join back on the fused
    # pass's per-partition n_rows (VERDICT r2 task 8: previously the salted
    # path was a helper no contract could reach).
    salted = [
        c for c in stats
        if c.kind == "approx_distinct" and c.p.get("method") == "salted"
    ]
    fused = [c for c in stats if c not in salted]
    # pre-project each binned-quantile check's (log-scaled) value once —
    # see the per-edge CSE note in _agg_exprs
    agg_in = df
    for c in fused:
        if c.kind == "length_quantiles" and c.p.get("method", "bins") == "bins":
            _nb, _lo, _hi, log_scale, _ = _quantile_conf(c)
            v = F.col(c.column).cast("double")
            agg_in = agg_in.withColumn(
                f"_lqv_{c.name}", F.log1p(v) if log_scale else v
            )
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for c in fused:
        exprs.extend(_agg_exprs(c))
    agg = agg_in.groupBy("partition_id").agg(*exprs)

    # Unpivot every check's verdict out of the ONE agg row per partition via
    # inline(array(struct...)) — a single projection, so the scan+shuffle run
    # exactly once no matter how many checks the contract carries.
    structs = []
    for c in fused:
        metric = F.round(_metric(c).cast("double"), 9)
        nv = (
            F.col(f"v_{c.name}") if c.kind in PREDICATE_KINDS else F.lit(0)
        ).cast("long")
        structs.append(
            F.struct(
                F.lit(c.name).alias("check_name"),
                threshold_pass_col(c, metric).alias("pass"),
                metric.alias("metric_value"),
                F.lit(float(c.threshold.value)).alias("threshold"),
                nv.alias("n_violations"),
            )
        )
    verdicts = None
    if structs:
        verdicts = agg.select(
            F.col("partition_id").cast("int").alias("partition_id"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.inline(F.array(*structs)),
        ).select(
            "partition_id", "check_name", "pass", "metric_value", "threshold",
            "n_rows", "n_violations",
        )
    if salted:
        from raqc_spark.checks.blocks import verdicts_from_partition_agg
        from raqc_spark.checks.sketches import salted_approx_distinct

        nrows_pp = agg.select("partition_id", "n_rows")
        for c in salted:
            sad = salted_approx_distinct(
                df, "partition_id", c.column,
                salt_buckets=int(c.p.get("salt_buckets", 16)),
                salt_on=c.p.get("salt_on"),
            )
            tbl = sad.join(nrows_pp, "partition_id")
            v = verdicts_from_partition_agg(tbl, c, F.col("approx_distinct"))
            verdicts = v if verdicts is None else verdicts.unionByName(v)

    # Violations for ALL predicate checks in ONE scan (VERDICT r2 task 1:
    # the per-check union ran one filter branch — one AQE stage job — per
    # check): build a per-row array of matched-check structs, drop the
    # unmatched (NULL) slots, and explode. Rows violating nothing produce an
    # empty array and vanish in the explode; the row is read once no matter
    # how many predicate checks the contract carries.
    violations = None
    pred_checks = [c for c in stats if c.kind in PREDICATE_KINDS]
    if pred_checks:
        slots = [
            F.when(
                violation_predicate(c),
                F.struct(
                    F.lit(c.name).alias("check_name"),
                    F.format_string(
                        "%s: %s violates %s",
                        F.lit(c.column), F.col(check_detail(c)), F.lit(c.kind),
                    ).alias("violation_detail"),
                ),
            )
            for c in pred_checks
        ]
        matched = F.filter(F.array(*slots), lambda x: x.isNotNull())
        violations = df.select(
            F.col("partition_id").cast("int").alias("partition_id"),
            F.col("repo"),
            F.col("path"),
            F.col("commit"),
            F.col("content_sha"),
            F.explode(matched).alias("_v"),
        ).select(
            "partition_id",
            F.col("_v.check_name").alias("check_name"),
            "repo",
            "path",
            "commit",
            F.col("_v.violation_detail").alias("violation_detail"),
            "content_sha",
        ).select(*VIOLATION_COLS)
    return verdicts, violations


def check_detail(check: Check) -> str:
    """Column whose value to embed in violation_detail (the offending value,
    or content_length for content-null checks where content itself is NULL)."""
    if check.column == "content":
        return "content_length"
    return check.column
