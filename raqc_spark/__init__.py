"""raqc_spark — a from-scratch PySpark-native schema + constraint validation engine.

Re-imagines the repeat-array quality contract of USDA-ARS-NWRC/raqc
(difference thresholding, 2D-histogram outlier flagging, per-block flag
aggregation — see SURVEY.md §1.1) as declarative schema/constraint checks
over a snapshot-versioned table of source-code repositories
``(repo, path, commit, lang, content)``:

- per-column stats (null rate, min/max, length quantiles, HLL approx-distinct)
- uniqueness on (repo, path, commit)
- referential integrity commit -> repo
- distribution-drift (PSI, binned-ECDF KS) between successive snapshots
- per-partition pass/fail verdicts + materialized violation rows

Everything is expressed as lazy DataFrame transformations so Catalyst +
AQE pick the physical strategy; there is no per-row Python anywhere
(BASELINE.json:15). Pandas/Arrow UDFs are used only where a built-in
expression genuinely cannot express the semantics (see functions/).
"""

from raqc_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
