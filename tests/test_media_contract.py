"""media_bounds check family: contract-reachable multimodal surface
(VERDICT r3 task 6). Golden: injected oversize / missing / wrong-type media
rows are flagged by run_contract over media_as_code_table."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from raqc_spark.contract import Check, Contract, Threshold
from raqc_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    default_media_contract,
    media_as_code_table,
)
from raqc_spark.runner import run_contract


@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    # 40 clean rows: payload 100..139 bytes, text/plain
    for i in range(40):
        rows.append((i, b"x" * (100 + i), "text/plain", 100 + i))
    # injected violations
    rows.append((100, b"", "text/plain", 0))                 # under min_bytes
    rows.append((101, b"y" * 5000, "text/plain", 5000))      # over max_bytes
    rows.append((102, None, "text/plain", None))             # missing payload
    rows.append((103, b"z" * 200, "application/x-evil", 200))  # bad type
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _contract():
    return Contract(
        checks=(
            Check("media_payload_bounds", "media_bounds", column="content",
                  threshold=Threshold("le", 0.0),
                  params=(("min_bytes", 10), ("max_bytes", 1000),
                          ("type_col", "lang"),
                          ("allowed_types", ("text/plain",)))),
        ),
        schema_columns=("repo", "path", "commit", "lang"),
    )


def test_media_bounds_golden(spark, media_df):
    code = media_as_code_table(media_df)
    res = run_contract(
        spark, _contract(), code, run_dir=tempfile.mkdtemp(), resume=False,
    )
    verd = res.verdicts.collect()
    assert sum(r["n_violations"] for r in verd) == 4
    assert not res.passed
    viols = spark.read.parquet(f"{res.run_dir}/violations").collect()
    flagged = {r["path"] for r in viols}
    assert flagged == {"media/100", "media/101", "media/102", "media/103"}
    # payload bytes are never embedded in violation rows
    for r in viols:
        assert "x" * 50 not in (r["violation_detail"] or "")


def test_media_bounds_binary_length_is_bytes(spark, media_df):
    """length() on the binary payload must count BYTES (multi-byte chars:
    encode('é') is 2 bytes, 1 char)."""
    df = spark.createDataFrame(
        [(1, "é" * 50, "text/plain")], ["media_id", "text", "media_type"]
    ).select(
        "media_id",
        F.encode("text", "utf-8").alias("payload"),
        "media_type",
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )
    code = media_as_code_table(df)
    from raqc_spark.functions.hashing import with_derived

    got = with_derived(code).select("content_length").first()[0]
    assert got == 100


def test_media_bounds_fused_into_stats_pass(spark, media_df):
    """media_bounds rides the SAME single agg pass as the other predicate
    checks — no extra scan or shuffle per media check."""
    from raqc_spark.checks.stats import compile_stats_pass
    from raqc_spark.plan import prepare

    contract = _contract()
    df = prepare(media_as_code_table(media_df), contract)
    checks = list(contract.checks)
    checks.append(Check("null_rate_payload", "null_rate", column="content",
                        threshold=Threshold("le", 0.0)))
    verdicts, violations = compile_stats_pass(df, checks)
    plan = verdicts._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1
    rows = {r["check_name"]: r for r in verdicts.collect()}
    assert set(rows) == {"media_payload_bounds", "null_rate_payload"}


def test_default_media_contract_validates_and_runs(spark, media_df):
    res = run_contract(
        spark, default_media_contract(), media_as_code_table(media_df),
        run_dir=tempfile.mkdtemp(), resume=False,
    )
    names = {r["check_name"] for r in res.verdicts.collect()}
    assert {"schema", "media_payload_bounds", "null_rate_payload",
            "uniqueness"} <= names


def test_media_type_literal_injection_rejected():
    with pytest.raises(ValueError, match="MIME charset"):
        Contract(checks=(
            Check("m", "media_bounds", column="content",
                  params=(("allowed_types", ("text/plain' OR '1'='1",)),)),
        )).validate()
