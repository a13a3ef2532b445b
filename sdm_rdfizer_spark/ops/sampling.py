"""Deterministic corpus sampling for training-data pipelines.

df.sample() is nondeterministic across retries/partitionings (seed is
per-partition), which breaks reproducible corpus construction. These
operators key the sampling decision on a CONTENT-derived hash of the id,
so the same document always lands on the same side of the cut — across
runs, engines (md5 is portable), cluster sizes, and input orderings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: resolution of the sampling wheel: fractions quantize to 1/1000
SAMPLE_BUCKETS = 1000


def _bucket(id_col: str) -> Column:
    """Stable bucket in [0, SAMPLE_BUCKETS) from md5 of the id — the
    first 8 hex chars as an integer, mod the wheel size."""
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return F.conv(h, 16, 10).cast("bigint") % SAMPLE_BUCKETS


def hash_sample(df: DataFrame, fraction: float,
                id_col: str = "doc_id") -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows keyed on md5(id).

    Filter-only: no shuffle, pushes past column pruning, and the kept
    set is invariant to partitioning and cluster size.
    """
    return df.where(_bucket(id_col) < int(round(fraction * SAMPLE_BUCKETS)))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str, id_col: str = "doc_id",
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    downsample en, keep all low-resource languages).

    ``fractions`` maps stratum value → keep fraction; strata not listed
    keep ``default_fraction``. The per-stratum threshold compiles to a
    CASE chain over literals — still a pure filter, no shuffle, no join.
    """
    thr = F.lit(int(round(default_fraction * SAMPLE_BUCKETS)))
    for val, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == val,
                     F.lit(int(round(frac * SAMPLE_BUCKETS)))).otherwise(thr)
    return df.where(_bucket(id_col) < thr)
