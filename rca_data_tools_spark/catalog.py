"""Config catalog: the engine's equivalent of the reference's params/ CSVs.

The reference loads ~14 CSV/YAML config files into dicts at import time
(rca_data_tools/qaqc/constants.py:67-126) and resolves each canonical
parameter name to whichever of up to ~32 candidate physical columns exists in
the dataset at hand (params/variableMap.csv; resolution at
qaqc/plots.py:220-232). Here configs load into small DataFrames (broadcast
dimension tables — they ARE the logical-plan input) and name resolution is a
plan-time operation over the DataFrame schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def load_config_csv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Load one config CSV as a broadcast-sized dimension DataFrame."""
    reader = spark.read.option("header", "true")
    if schema:
        reader = reader.schema(schema)
    return reader.csv(path)


def resolve_variable(df: DataFrame, candidates: list[str]) -> Column | None:
    """Pick the first candidate physical column present in ``df``'s schema
    (plan-time, no data touched) — the variableMap resolution contract.
    Returns None when nothing matches (caller decides: skip or raise)."""
    cols = set(df.columns)
    for name in candidates:
        if name in cols:
            return F.col(name)
    return None


def resolve_or_coalesce(df: DataFrame, candidates: list[str]) -> Column | None:
    """When several candidates exist (instrument families sharing a store),
    coalesce them in declared priority order — first non-null wins per row."""
    present = [c for c in candidates if c in set(df.columns)]
    if not present:
        return None
    if len(present) == 1:
        return F.col(present[0])
    return F.coalesce(*[F.col(c) for c in present])


def qc_companion_columns(df: DataFrame, param: str) -> list[str]:
    """Find QC companion variables by substring contract (reference:
    ``_qartod_`` / ``_qc_`` matching, qaqc/plots.py:146-153)."""
    return [
        c
        for c in df.columns
        if c.startswith(param) and ("_qc_" in c or "_qartod_" in c)
    ]


def resolve_all(df: DataFrame, candidates: list[str]) -> list[Column]:
    """Every matching candidate column — the multi-match fan-out case where
    one canonical parameter maps to several physical series in the same store
    and each gets its own output (reference: qaqc/plots.py:225-232)."""
    cols = set(df.columns)
    return [F.col(name) for name in candidates if name in cols]
