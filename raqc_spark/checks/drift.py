"""Snapshot-pair operators: alignment, histograms, PSI / binned-ECDF KS.

The direct analogue of RAQC's date1/date2 repeat-pass comparison
(SURVEY.md §1.1): snapshot alignment replaces raster clipping (implicit
equi-join on pixel coords becomes an explicit full-outer join on
(repo, path)); the 2D histogram outlier cut becomes rare-cell flagging on a
(lang × content-length-bucket) histogram; drift is measured per partition by
PSI (categorical) and a binned-ECDF Kolmogorov-Smirnov statistic (numeric).

Scale notes:
- Histogram/drift aggregations are hash aggs with map-side combine — the
  shuffled data is (partition × bins) rows, independent of input size.
- KS uses deterministic bin edges, so the statistic is exact w.r.t. the
  binned contract definition and identical at any parallelism
  (SURVEY.md §7.3.1) — no global sort anywhere.
- Histogram cell tables are tiny → neighbor smoothing is a broadcast
  self-join, and the rare-cell flag join back to rows is a broadcast too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from raqc_spark.checks.blocks import verdicts_from_partition_agg
from raqc_spark.contract import Check
from raqc_spark.results import VIOLATION_COLS

PSI_EPS = 1e-6  # smoothing for empty categories, pinned in the contract


def bucket_col(col: Column, lo: float, hi: float, num_bins: int) -> Column:
    """Deterministic fixed-width bucket index in [0, num_bins-1].

    Explicit floor arithmetic (not width_bucket) so the identical formula
    runs on any ANSI engine — the DuckDB oracle uses the same expression.
    """
    width = (hi - lo) / num_bins
    raw = F.floor((col.cast("double") - F.lit(float(lo))) / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(num_bins - 1)).cast("int")


# ---------------------------------------------------------------- alignment


def align_snapshots(
    s1: DataFrame, s2: DataFrame, keys: tuple[str, ...] = ("repo", "path")
) -> DataFrame:
    """Full-outer join of two snapshots classifying added / removed /
    modified / unchanged per key — RAQC's clip+diff recast (SURVEY.md §2.3 J1).

    Sort-merge by default; AQE splits skewed mega-repo keys at runtime.
    Inputs must carry ``content_sha`` (functions.with_derived).
    """
    kl = list(keys)
    a = s1.select(*kl, F.col("content_sha").alias("sha1"))
    b = s2.select(*kl, F.col("content_sha").alias("sha2"))
    joined = a.join(b, kl, "full_outer")
    status = (
        F.when(F.col("sha1").isNull(), F.lit("added"))
        .when(F.col("sha2").isNull(), F.lit("removed"))
        .when(F.col("sha1") == F.col("sha2"), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    return joined.withColumn("status", status)


# ------------------------------------------------------------------- drift


def _cat_counts(df: DataFrame, column: str) -> DataFrame:
    val = F.coalesce(F.col(column).cast("string"), F.lit("<null>")).alias("val")
    return df.groupBy("partition_id", val).agg(F.count(F.lit(1)).alias("cnt"))


def drift_psi(
    s1: DataFrame, s2: DataFrame, check: Check
) -> tuple[DataFrame, DataFrame]:
    """Population Stability Index per partition on a categorical column.

    PSI = Σ_cat (p − q) · ln(p / q), with ε-smoothed proportions. Exact
    integer counts feed the float math, so results are order-independent.
    Returns (verdicts, per-partition psi table for reports).
    """
    c1 = _cat_counts(s1, check.column).withColumnRenamed("cnt", "cnt1")
    c2 = _cat_counts(s2, check.column).withColumnRenamed("cnt", "cnt2")
    cells = c1.join(c2, ["partition_id", "val"], "full_outer").fillna(
        0, subset=["cnt1", "cnt2"]
    )
    w = Window.partitionBy("partition_id")
    cells = cells.withColumn("tot1", F.sum("cnt1").over(w)).withColumn(
        "tot2", F.sum("cnt2").over(w)
    )
    p = F.col("cnt1") / F.col("tot1") + F.lit(PSI_EPS)
    q = F.col("cnt2") / F.col("tot2") + F.lit(PSI_EPS)
    term = (p - q) * F.log(p / q)
    psi = cells.groupBy("partition_id").agg(
        F.round(F.sum(term), 9).alias("psi"),
        F.max("tot2").alias("n_rows"),
    )
    verdicts = verdicts_from_partition_agg(psi, check, F.col("psi"))
    return verdicts, psi


def binned_ecdf(
    df: DataFrame, value: Column, lo: float, hi: float, num_bins: int, cnt_name: str
) -> DataFrame:
    b = bucket_col(value, lo, hi, num_bins).alias("bucket")
    return (
        df.filter(value.isNotNull())
        .groupBy("partition_id", b)
        .agg(F.count(F.lit(1)).alias(cnt_name))
    )


def drift_ks(
    s1: DataFrame,
    s2: DataFrame,
    check: Check,
    lo: float | None = None,
    hi: float | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Binned-ECDF Kolmogorov-Smirnov per partition (SURVEY.md §2.5 W3).

    D = max_b |F1(b) − F2(b)| over deterministic fixed bins. Bin edges come
    from params or from s1's global min/max (two scalars — a cheap, exact
    pre-agg; at 100 TB this is a column-pruned scan of one numeric column,
    or supply the edges in the contract to skip it).
    """
    column, p = check.column, check.p
    num_bins = int(p.get("num_bins", 64))
    value = F.col(column)
    if p.get("log_scale"):
        # log-spaced bins: right resolution for heavy-tailed lengths, and the
        # contract can pin (lo, hi) without any data-dependent pre-scan
        value = F.log1p(value.cast("double"))
    if lo is None:
        lo = p.get("lo")
    if hi is None:
        hi = p.get("hi")
    if lo is None or hi is None:
        # fall back to s1's global range — a cheap column-pruned 2-scalar agg
        row = s1.agg(F.min(value).alias("lo"), F.max(value).alias("hi")).collect()[0]
        lo = float(row["lo"]) if lo is None else float(lo)
        hi = float(row["hi"]) if hi is None else float(hi)
    lo, hi = float(lo), float(hi)
    if hi <= lo:
        hi = lo + 1.0

    e1 = binned_ecdf(s1, value, lo, hi, num_bins, "cnt1")
    e2 = binned_ecdf(s2, value, lo, hi, num_bins, "cnt2")
    cells = e1.join(e2, ["partition_id", "bucket"], "full_outer").fillna(
        0, subset=["cnt1", "cnt2"]
    )
    wcum = (
        Window.partitionBy("partition_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("partition_id")
    cells = (
        cells.withColumn("cum1", F.sum("cnt1").over(wcum))
        .withColumn("cum2", F.sum("cnt2").over(wcum))
        .withColumn("tot1", F.sum("cnt1").over(wall))
        .withColumn("tot2", F.sum("cnt2").over(wall))
    )
    d = F.abs(F.col("cum1") / F.col("tot1") - F.col("cum2") / F.col("tot2"))
    ks = cells.groupBy("partition_id").agg(
        F.round(F.max(d), 9).alias("ks"),
        F.max("tot2").alias("n_rows"),
    )
    verdicts = verdicts_from_partition_agg(ks, check, F.col("ks"))
    return verdicts, ks


# --------------------------------------------------------------- histograms


def hist2d(
    df: DataFrame,
    xcol: str,
    ycol: str,
    xlo: float,
    xhi: float,
    xbins: int,
    ylo: float,
    yhi: float,
    ybins: int,
) -> DataFrame:
    """2D histogram cell counts — RAQC's np.histogram2d analogue (A6)."""
    return (
        df.filter(F.col(xcol).isNotNull() & F.col(ycol).isNotNull())
        .groupBy(
            bucket_col(F.col(xcol), xlo, xhi, xbins).alias("bx"),
            bucket_col(F.col(ycol), ylo, yhi, ybins).alias("by"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def smooth_hist2d(cells: DataFrame) -> DataFrame:
    """3×3 moving-window sum over histogram cells — RAQC's mov_wind over
    histogram space (SURVEY.md §2.5 W2). The cells table is ≤ bx·by rows,
    so a broadcast self-join on |Δbx|≤1 ∧ |Δby|≤1 is the right plan."""
    n = cells.select(
        F.col("bx").alias("nbx"), F.col("by").alias("nby"), F.col("cnt").alias("ncnt")
    )
    cond = (F.abs(F.col("bx") - F.col("nbx")) <= 1) & (
        F.abs(F.col("by") - F.col("nby")) <= 1
    )
    return (
        cells.join(F.broadcast(n), cond)
        .groupBy("bx", "by")
        .agg(F.first("cnt").alias("cnt"), F.sum("ncnt").alias("smoothed_cnt"))
    )


def hist2d_outlier_check(
    df: DataFrame, check: Check
) -> tuple[DataFrame, DataFrame]:
    """Flag rows in rare (lang × content-length-bucket) histogram cells —
    RAQC's 2D-histogram outlier flagging recast (SURVEY.md §2.4 A6 + §2.5 W2).

    A cell is rare when its 3×3-smoothed count fraction is below
    ``min_cell_frac``. Rare-cell keys are broadcast back onto the rows.
    """
    p = check.p
    lo, hi = float(p.get("lo", 0.0)), float(p.get("hi", 100_000.0))
    nbins = int(p.get("num_bins", 32))
    min_frac = float(p.get("min_cell_frac", 1e-4))

    lang_idx = F.coalesce(F.col("lang"), F.lit("<null>"))
    cells = (
        df.groupBy(
            lang_idx.alias("lang_cell"),
            bucket_col(F.col("content_length"), lo, hi, nbins).alias("len_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = df.count()  # scalar action on a pre-agg'd count — cheap
    rare = cells.filter((F.col("cnt") / F.lit(total)) < F.lit(min_frac)).select(
        "lang_cell", "len_bucket"
    )

    tagged = df.withColumn("lang_cell", lang_idx).withColumn(
        "len_bucket", bucket_col(F.col("content_length"), lo, hi, nbins)
    )
    flagged = tagged.join(
        F.broadcast(rare), ["lang_cell", "len_bucket"], "left_semi"
    )
    violations = flagged.select(
        F.lit(check.name).alias("check_name"),
        "repo",
        "path",
        "commit",
        F.format_string(
            "rare hist cell (%s, bucket %d)", F.col("lang_cell"), F.col("len_bucket")
        ).alias("violation_detail"),
        "content_sha",
    ).select(*VIOLATION_COLS)

    marked = rare.withColumn("_rare", F.lit(1))
    agg = (
        tagged.join(F.broadcast(marked), ["lang_cell", "len_bucket"], "left")
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("_rare").isNotNull()).alias("n_viol"),
        )
    )
    verdicts = verdicts_from_partition_agg(
        agg, check, F.col("n_viol") / F.col("n_rows"), F.col("n_viol")
    )
    return verdicts, violations
