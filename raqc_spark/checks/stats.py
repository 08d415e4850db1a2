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

Expression construction is SQL-TEXT based (pure Python string building, one
``F.expr``/``selectExpr`` round-trip per output column). The previous
Column-composition implementation issued ~12k py4j socket round-trips per
contract build (128 binned-edge ``count_if`` Columns × ~4 JVM calls each,
measured 9s of an 11s warm build on this host) — pure non-scaling driver
floor. SQL text moves that work into ONE Catalyst parse per expression;
the per-edge counts additionally pack into a single ``array(count_if...)``
aggregate so the agg schema carries one array column per quantile check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raqc_spark.contract import Check
from raqc_spark.results import VIOLATION_COLS

APPROX_PERCENTILE_ACCURACY = 10_000

PREDICATE_KINDS = {"null_rate", "empty_content", "bounds", "media_bounds"}
STATS_KINDS = PREDICATE_KINDS | {"col_stats", "length_quantiles", "approx_distinct"}


def _d(x: float) -> str:
    """Double literal in SQL text. Bare fractional literals parse as DECIMAL
    in Spark SQL; the D suffix keeps the type identical to ``F.lit(float)``
    (shortest-repr round-trips the exact double)."""
    return f"{float(x)!r}D"


def violation_predicate_sql(check: Check) -> str:
    """Row-level violation predicate (SQL text) for predicate-family checks.

    Checks on ``content`` read the derived ``content_length`` instead — the
    raw column is dropped right after derivation (functions.with_derived),
    and NULL/empty are recoverable from the length.
    """
    if check.column == "content":
        if check.kind == "null_rate":
            return "content_length IS NULL"
        if check.kind == "empty_content":
            return "content_length IS NOT NULL AND content_length = 0"
    c = check.column
    if check.kind == "null_rate":
        return f"{c} IS NULL"
    if check.kind == "empty_content":
        return f"{c} IS NOT NULL AND length({c}) = 0"
    if check.kind == "bounds":
        lo, hi = check.p.get("lo"), check.p.get("hi")
        parts = []
        if lo is not None:
            parts.append(f"{c} < {lo!r}")
        if hi is not None:
            parts.append(f"{c} > {hi!r}")
        pred = " OR ".join(parts) if parts else "false"
        return f"{c} IS NOT NULL AND ({pred})"
    if check.kind == "media_bounds":
        # Media-payload integrity (SURVEY.md §2 multimodal, VERDICT r3 task
        # 6): payload byte size inside [min_bytes, max_bytes] and, when
        # allowed_types is given, media type in the allow-list. A MISSING
        # payload is a violation — a media row without bytes is broken, not
        # ignorable (unlike bounds, whose NULL rows belong to null_rate).
        # On the code-table shape (column="content") the payload size is the
        # derived content_length (length() counts bytes for binary columns,
        # so media_as_code_table payloads measure correctly); the type
        # column defaults to `lang`, which the media adapter maps from
        # media_type. Literal values are validated at Contract.validate()
        # (identifier / MIME charset), so the SQL text is safe.
        p = check.p
        size = "content_length" if c == "content" else f"octet_length({c})"
        parts = [f"{size} IS NULL"]
        if p.get("min_bytes") is not None:
            parts.append(f"{size} < {int(p['min_bytes'])}")
        if p.get("max_bytes") is not None:
            parts.append(f"{size} > {int(p['max_bytes'])}")
        allowed = tuple(p.get("allowed_types", ()))
        if allowed:
            tc = p.get("type_col", "lang")
            lits = ", ".join(f"'{t}'" for t in allowed)
            parts.append(f"({tc} IS NULL OR {tc} NOT IN ({lits}))")
        return " OR ".join(parts)
    raise ValueError(f"{check.kind} has no row-level predicate")


def violation_predicate(check: Check) -> Column:
    return F.expr(violation_predicate_sql(check))


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


def _agg_sql(check: Check) -> list[str]:
    """Aggregate expressions (SQL text) contributed to the shared agg."""
    n = check.name
    if check.kind in PREDICATE_KINDS:
        return [f"count_if({violation_predicate_sql(check)}) AS v_{n}"]
    c = check.column
    if check.kind == "col_stats":
        return [
            f"min({c}) AS min_{n}",
            f"max({c}) AS max_{n}",
            f"avg({c}) AS mean_{n}",
            f"stddev_samp({c}) AS std_{n}",
        ]
    if check.kind == "length_quantiles":
        if check.p.get("method", "bins") == "approx":
            qs = ", ".join(_d(q) for q in check.p.get("qs", (0.5, 0.95, 0.99)))
            return [
                f"percentile_approx({c}, array({qs}),"
                f" {APPROX_PERCENTILE_ACCURACY}) AS q_{n}"
            ]
        # Default: binned cumulative counts — one count_if per edge, packed
        # into ONE array aggregate inside the SAME fused codegen hash agg.
        # percentile_approx is a TypedImperativeAggregate whose
        # QuantileSummaries.compress was measured (jstack, 10.6M-row run) to
        # dominate the entire contract and degrade superlinearly with task
        # concurrency; the bin counts shuffle O(bins) longs, stay in
        # whole-stage codegen, and merge exactly across partitions/
        # checkpoints. Quantiles resolve to bin UPPER edges (error = one bin
        # width; log-space by default for heavy-tailed lengths). The
        # (possibly log-scaled) value is read from the `_lqv_<name>` column
        # compile_stats_pass projects below the agg — aggregate codegen does
        # NOT common-subexpression-eliminate across buffers, so an inline
        # log1p would be evaluated once PER EDGE per row (128×).
        num_bins, lo, hi, _log_scale, _ = _quantile_conf(check)
        counts = ", ".join(
            f"count_if(_lqv_{n} <= {_d(e)})"
            for e in _quantile_edges(num_bins, lo, hi)
        )
        return [f"count({c}) AS nn_{n}", f"array({counts}) AS ble_{n}"]
    if check.kind == "approx_distinct":
        return [f"approx_count_distinct({c}) AS d_{n}"]
    raise ValueError(f"unsupported stats kind {check.kind}")


def _bin_quantile_sql(check: Check, q: float) -> str:
    """Quantile from binned cumulative counts: the first edge whose
    cumulative count reaches q·n (clamped to the top edge for values
    beyond hi — with log bins hi is pinned above any legal length)."""
    n = check.name
    num_bins, lo, hi, log_scale, _ = _quantile_conf(check)
    edges = ", ".join(_d(e) for e in _quantile_edges(num_bins, lo, hi))
    # edges below target -> index of the answering edge (1-based element_at)
    idx = f"size(filter(ble_{n}, c -> c < {_d(q)} * nn_{n}))"
    edge = f"element_at(array({edges}), least({idx} + 1, {num_bins}))"
    out = f"expm1({edge})" if log_scale else edge
    # zero non-null values: no count is < 0 -> idx=0 would fabricate the
    # first bin edge as a quantile; return NULL like percentile_approx does
    return f"CASE WHEN nn_{n} = 0 THEN CAST(NULL AS double) ELSE {out} END"


def _metric_sql(check: Check) -> str:
    n = check.name
    if check.kind in PREDICATE_KINDS:
        # exact integer counts → deterministic rate (SURVEY.md §7.3.2)
        return f"v_{n} / n_rows"
    if check.kind == "col_stats":
        return f"mean_{n}"
    if check.kind == "length_quantiles":
        # verdict on the top quantile
        if check.p.get("method", "bins") == "approx":
            return f"element_at(q_{n}, -1)"
        qs = _quantile_conf(check)[4]
        return _bin_quantile_sql(check, qs[-1])
    if check.kind == "approx_distinct":
        return f"d_{n}"
    raise ValueError(check.kind)


def _verdict_struct_sql(check: Check) -> str:
    """One named_struct(...) verdict slot for the inline-unpivot projection.

    The metric text appears twice (pass predicate + value) — Catalyst
    subexpression elimination collapses the duplicates, and the projection
    runs over one row per partition anyway. NULL metric → pass=false,
    matching Threshold semantics.
    """
    metric = f"round(CAST(({_metric_sql(check)}) AS double), 9)"
    thr = float(check.threshold.value)
    nv = f"v_{check.name}" if check.kind in PREDICATE_KINDS else "0"
    return (
        "named_struct("
        f"'check_name', '{check.name}', "
        f"'pass', coalesce({check.threshold.sql(metric)}, false), "
        f"'metric_value', {metric}, "
        f"'threshold', CAST({thr!r} AS double), "
        f"'n_violations', CAST({nv} AS bigint))"
    )


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
    # see the per-edge CSE note in _agg_sql
    lqv = [
        f"log1p(CAST({c.column} AS double)) AS _lqv_{c.name}"
        if _quantile_conf(c)[3]
        else f"CAST({c.column} AS double) AS _lqv_{c.name}"
        for c in fused
        if c.kind == "length_quantiles" and c.p.get("method", "bins") == "bins"
    ]
    agg_in = df.selectExpr("*", *lqv) if lqv else df
    exprs = ["count(1) AS n_rows"]
    for c in fused:
        exprs.extend(_agg_sql(c))
    agg = agg_in.groupBy("partition_id").agg(*[F.expr(e) for e in exprs])

    # Unpivot every check's verdict out of the ONE agg row per partition via
    # inline(array(named_struct...)) — a single projection, so the
    # scan+shuffle run exactly once no matter how many checks the contract
    # carries.
    verdicts = None
    if fused:
        slots = ", ".join(_verdict_struct_sql(c) for c in fused)
        verdicts = agg.selectExpr(
            "CAST(partition_id AS int) AS partition_id",
            "CAST(n_rows AS bigint) AS n_rows",
            f"inline(array({slots}))",
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
            v = verdicts_from_partition_agg(tbl, c, "approx_distinct")
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
        slots = ", ".join(
            f"CASE WHEN {violation_predicate_sql(c)} THEN named_struct("
            f"'check_name', '{c.name}', "
            "'violation_detail', format_string('%s: %s violates %s', "
            f"'{c.column}', {check_detail(c)}, '{c.kind}')) END"
            for c in pred_checks
        )
        violations = df.selectExpr(
            "CAST(partition_id AS int) AS partition_id",
            "repo", "path", "commit", "content_sha",
            f"explode(filter(array({slots}), x -> x IS NOT NULL)) AS _v",
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
    if check.kind == "media_bounds":
        # never embed raw payload bytes in a violation row
        return f"octet_length({check.column})"
    return check.column
