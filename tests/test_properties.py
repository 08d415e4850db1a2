"""Property-based tests (SURVEY.md §5.2.4) — hypothesis over pure helpers,
plus seeded invariants over the fixture generator. Spark-free where possible
so these stay fast."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from fixtures.generate import generate
from raqc_spark.contract import Threshold


@given(
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
    st.sampled_from(["le", "ge", "lt", "gt", "eq"]),
)
def test_threshold_python_semantics(metric, value, op):
    t = Threshold(op, value)
    expected = {
        "le": metric <= value,
        "ge": metric >= value,
        "lt": metric < value,
        "gt": metric > value,
        "eq": metric == value,
    }[op]
    assert t.passes(metric) == expected


@given(
    st.floats(min_value=-1e6, max_value=2e6, allow_nan=False),
    st.integers(min_value=1, max_value=256),
)
@settings(max_examples=200)
def test_bucket_formula_clamps(x, nb):
    """The python twin of checks.drift.bucket_col: always in [0, nb-1]."""
    lo, hi = 0.0, 1e6
    width = (hi - lo) / nb
    raw = math.floor((x - lo) / width)
    b = min(max(raw, 0), nb - 1)
    assert 0 <= b <= nb - 1


def test_fixture_generator_is_deterministic():
    a = generate(n_files=300, n_repos=8, seed=7)
    b = generate(n_files=300, n_repos=8, seed=7)
    for t in ("s1", "s2", "commits"):
        assert getattr(a, t).equals(getattr(b, t))
    assert a.golden == b.golden


def test_fixture_violation_rates_scale():
    fx = generate(n_files=2000, n_repos=16, seed=3)
    n2 = len(fx.s2)
    # V3 nulls ~1%, V4 empties ~0.5% (of the post-dup row count)
    assert 0.005 * n2 <= len(fx.golden["null_content"]) <= 0.02 * n2
    assert len(fx.golden["empty_content"]) >= 1
    assert len(fx.golden["uniqueness"]) >= 2
    assert len(fx.golden["ref_integrity"]) >= 1
    # mega-repo skew present: repo_0000 holds >= 30% of rows
    frac = (fx.s2["repo"] == "repo_0000").mean()
    assert frac >= 0.3


def test_fixture_golden_keys_exist_in_s2():
    import hashlib

    fx = generate(n_files=500, n_repos=8, seed=11)
    empty_sha = hashlib.sha256(b"").hexdigest()
    s2_keys = set(
        zip(fx.s2["repo"], fx.s2["path"], fx.s2["commit"], strict=True)
    )
    for check, keys in fx.golden.items():
        for repo, path, commit, sha in keys:
            assert (repo, path, commit) in s2_keys, (check, repo, path)
            assert len(sha) == 64
    # null-content rows carry the documented empty-string sha constant
    for _, _, _, sha in fx.golden["null_content"]:
        assert sha == empty_sha


def test_contract_yaml_roundtrip(tmp_path):
    """UserConfig analogue (SURVEY.md §1.2): YAML round-trip is exact."""
    from raqc_spark.contract import Contract, default_contract

    c = default_contract()
    text = c.to_yaml()
    assert Contract.from_yaml(text) == c
    p = tmp_path / "contract.yaml"
    p.write_text(text)
    assert Contract.from_yaml(str(p)) == c


def test_contract_yaml_rejects_unknown_kind():
    import pytest as _pytest

    from raqc_spark.contract import Contract

    bad = "checks:\n- name: x\n  kind: nonsense\n"
    with _pytest.raises(ValueError, match="unknown check kind"):
        Contract.from_yaml(bad)


def test_bin_quantile_rank_property_random_data(spark):
    """Property (hypothesis-style, seed-pinned loop): for random length
    distributions, the binned p-quantile edge E satisfies the rank
    definition: count(v <= E) >= p*n and count(v <= prev_edge) < p*n."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from raqc_spark.checks.stats import compile_stats_pass
    from raqc_spark.contract import Check, Threshold

    rng = np.random.default_rng(7)
    for trial in range(3):
        lens = np.clip(
            rng.lognormal(rng.uniform(3, 8), rng.uniform(0.5, 2.0), 2000),
            1, 2_000_000,
        ).astype(int)
        df = spark.createDataFrame(
            [(int(v),) for v in lens], ["content_length"]
        ).withColumn("partition_id", F.lit(0)).withColumn(
            "repo", F.lit("r")
        ).withColumn("path", F.lit("p")).withColumn(
            "commit", F.lit("c")
        ).withColumn("content_sha", F.lit("s"))
        chk = Check("lq", "length_quantiles", column="content_length",
                    threshold=Threshold("le", 1e12),
                    params=(("qs", (0.5, 0.9, 0.99)),))
        verdicts, _ = compile_stats_pass(df, [chk])
        edge = verdicts.collect()[0]["metric_value"]  # p99 edge
        n = len(lens)
        le = (np.log1p(lens) <= math.log1p(edge) + 1e-9).sum()
        assert le >= 0.99 * n, (trial, edge, le, n)
        width = 14.0 / 128
        prev = math.log1p(edge) - width
        if prev > 1e-9:
            below = (np.log1p(lens) <= prev + 1e-9).sum()
            assert below < 0.99 * n, (trial, edge, below, n)
