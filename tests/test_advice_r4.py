"""Round-4 regression tests for the ADVICE r3 findings.

1. SQL-text injection surface: contract identifiers are validated.
2. Fused drift family is only splittable with pinned KS edges.
3. Drift-cube coalesce(1) is gated on PSI dims being categorical.
4. _file_stamp decodes percent-encoded file URIs before stat.
"""

from __future__ import annotations

import os

import pytest

from raqc_spark.contract import (
    Check,
    Contract,
    PartitionSpec,
    Threshold,
    default_contract,
)
from raqc_spark.plan import compile_plan, prepare


def _mkcontract(**kw):
    base = dict(
        name="ok_name", kind="null_rate", column="content",
        threshold=Threshold("le", 0.1),
    )
    base.update(kw)
    return Contract(checks=(Check(**base),))


def test_validate_rejects_sql_metachars_in_name():
    """A quote in a check name would escape the SQL-text literal
    ``'{name}' AS check_name`` — validate() must reject it (ADVICE r3)."""
    for bad in ("has space", "has-hyphen", "q'uote", "semi;colon", "", "1lead"):
        with pytest.raises(ValueError, match="interpolated into SQL"):
            _mkcontract(name=bad).validate()
    _mkcontract(name="fine_Name_42").validate()


def test_validate_rejects_bad_column_and_keys():
    with pytest.raises(ValueError, match="interpolated into SQL"):
        _mkcontract(column="content' --").validate()
    with pytest.raises(ValueError, match="interpolated into SQL"):
        Contract(checks=(
            Check("u", "uniqueness", params=(("keys", ("repo", "pa th")),)),
        )).validate()
    with pytest.raises(ValueError, match="interpolated into SQL"):
        Contract(
            checks=(Check("u", "uniqueness",
                          params=(("keys", ("repo",)),)),),
            partition_spec=PartitionSpec(key="re'po"),
        ).validate()


def test_default_contract_passes_ident_validation():
    default_contract().validate()


def test_drift_family_splittable_requires_pinned_ks_edges(spark, snapshots):
    """drift_ks without pinned (lo, hi) derives bin edges from the
    partition-FILTERED s1; a batched run would bin each batch differently,
    so the family must not claim splittable (ADVICE r3 medium)."""
    s1, s2, _ = snapshots

    def fam_for(ks_params):
        contract = Contract(checks=(
            Check("psi_lang", "drift_psi", column="lang",
                  threshold=Threshold("le", 0.2)),
            Check("ks_len", "drift_ks", column="content_length",
                  threshold=Threshold("le", 0.15), params=ks_params),
        ))
        fams = compile_plan(
            spark, contract, prepare(s2, contract), s1=prepare(s1, contract)
        )
        return {f.name: f for f in fams}["drift"]

    pinned = fam_for((("num_bins", 32), ("lo", 0.0), ("hi", 14.0),
                      ("log_scale", True)))
    unpinned = fam_for((("num_bins", 32), ("log_scale", True)))
    assert pinned.splittable is True
    assert unpinned.splittable is False


def test_psi_only_drift_family_stays_splittable(spark, snapshots):
    s1, s2, _ = snapshots
    contract = Contract(checks=(
        Check("psi_lang", "drift_psi", column="lang",
              threshold=Threshold("le", 0.2)),
    ))
    fams = compile_plan(
        spark, contract, prepare(s2, contract), s1=prepare(s1, contract)
    )
    assert {f.name: f for f in fams}["drift"].splittable is True


def _has_coalesce_1(df) -> bool:
    # a coalesce renders as "Repartition 1, false" (shuffle=false) in the
    # optimized logical plan
    return (
        "Repartition 1, false"
        in df._jdf.queryExecution().optimizedPlan().toString()
    )


def test_drift_cube_coalesce_gated_on_categorical(spark, snapshots):
    """coalesce(1) serializes the cube's final agg; it must be skipped when
    a PSI dim is declared non-categorical (ADVICE r3 low)."""
    from raqc_spark.checks.drift import compile_drift_pass

    s1, s2, _ = snapshots
    c = default_contract()
    p1, p2 = prepare(s1, c), prepare(s2, c)

    cat = Check("psi_lang", "drift_psi", column="lang",
                threshold=Threshold("le", 0.2))
    wide = Check("psi_path", "drift_psi", column="path",
                 threshold=Threshold("le", 0.2),
                 params=(("categorical", False),))
    assert _has_coalesce_1(compile_drift_pass(p1, p2, [cat]))
    assert not _has_coalesce_1(compile_drift_pass(p1, p2, [cat, wide]))


def test_non_categorical_psi_same_verdicts(spark, snapshots):
    """The coalesce gate is a physical-plan choice only — verdicts agree."""
    from raqc_spark.checks.drift import compile_drift_pass

    s1, s2, _ = snapshots
    c = default_contract()
    p1, p2 = prepare(s1, c), prepare(s2, c)

    def run(params):
        chk = Check("psi_lang", "drift_psi", column="lang",
                    threshold=Threshold("le", 0.2), params=params)
        rows = compile_drift_pass(p1, p2, [chk]).collect()
        return sorted((r.partition_id, r.check_name, r.pass_, r.metric)
                      if hasattr(r, "pass_") else tuple(r) for r in rows)

    assert run(()) == run((("categorical", False),))


def test_file_stamp_decodes_percent_encoded_uri(tmp_path):
    """inputFiles() percent-encodes paths (space -> %20); the stamp must
    still reach os.stat and fold size+mtime (ADVICE r3 low)."""
    from raqc_spark.runner import _file_stamp

    p = tmp_path / "dir with space" / "part-0000.parquet"
    p.parent.mkdir()
    p.write_bytes(b"x" * 123)
    uri = "file://" + str(p.parent).replace(" ", "%20") + "/part-0000.parquet"
    stamp = _file_stamp(uri)
    st = os.stat(p)
    assert f"#{st.st_size}#" in stamp and stamp.endswith(str(st.st_mtime_ns))
    # plain (already-decoded) paths still work
    assert f"#{st.st_size}#" in _file_stamp(str(p))
