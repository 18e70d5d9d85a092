"""Data-quality EXPECTATIONS and CHECK constraints — the declarative gate a
training-data pipeline (or any lakehouse ingest) puts between raw batches and
a curated table.

The shape is the public Delta Live Tables expectations / Delta CHECK
constraint model, re-expressed as pure DataFrame transforms:

- a RULE is ``name -> SQL predicate`` (a row PASSES when the predicate is
  TRUE; NULL counts as a violation, like SQL CHECK with the usual
  fail-on-unknown ingest posture);
- ``with_violations`` annotates each row with the array of rule names it
  violates — one projection, zero shuffles, all codegen (the predicates are
  Catalyst expressions; no Python touches the hot path);
- ``apply_expectations`` splits a batch into (passed, quarantined) — the
  expect_or_drop-with-a-dead-letter-table pattern: violating rows are not
  silently dropped, they land in a quarantine frame carrying WHY;
- ``expectation_stats`` reports per-rule pass/fail counts in ONE scan (a
  single aggregate projection, then a constant-width unpivot);
- ``check_constraints`` enforces rules IN-PLAN via a guarded expression
  (expect_or_fail / CHECK constraint): a violating row fails the job at
  execution time with the rule name and the offending row in the message.
  Like sinks._dup_guarded, the guard wraps a data column so it cannot be
  pruned out, the check runs on exactly the rows being written, and the
  frame stays a lazy transform — no extra validation job.

Scale notes: every face is per-row column math over one scan; the stats
aggregate is a constant-size partial (#rules longs per task). Nothing here
shuffles, collects, or calls Python row-at-a-time — an expectations gate on
a 100 TB ingest costs one projection fused into the write stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _passes(predicate: str) -> Column:
    # NULL predicate result = violation (SQL CHECK treats UNKNOWN as pass,
    # but an ingest gate must not wave through rows it could not judge)
    return F.coalesce(F.expr(predicate), F.lit(False))


def violations_array(rules: "dict[str, str]") -> Column:
    """Array of the rule names this row violates (empty = clean row)."""
    if not rules:
        raise ValueError("expectations need at least one rule")
    return F.filter(
        F.array(
            *[
                F.when(~_passes(pred), F.lit(name))
                for name, pred in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )


def with_violations(
    df: DataFrame, rules: "dict[str, str]", col: str = "violations"
) -> DataFrame:
    """Annotate every row with its violated rule names."""
    return df.withColumn(col, violations_array(rules))


def apply_expectations(
    df: DataFrame, rules: "dict[str, str]", col: str = "violations"
) -> "tuple[DataFrame, DataFrame]":
    """Split into (passed, quarantined): passed rows carry the original
    schema; quarantined rows carry ``col`` naming every rule they broke —
    the dead-letter-table half of the gate. One scan feeds both sides (the
    projection is computed twice unless the caller caches; both plans are
    scan+filter, no shuffle)."""
    v = with_violations(df, rules, col)
    passed = v.filter(F.size(F.col(col)) == 0).drop(col)
    quarantined = v.filter(F.size(F.col(col)) > 0)
    return passed, quarantined


def expectation_stats(df: DataFrame, rules: "dict[str, str]") -> DataFrame:
    """Per-rule quality report in ONE scan: (rule, n_rows, n_pass, n_fail).
    The aggregate emits one long per rule per task (map-side combined); the
    unpivot is a constant-width stack over the single result row."""
    if not rules:
        raise ValueError("expectations need at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_name, pred) in enumerate(rules.items()):
        aggs.append(F.sum(_passes(pred).cast("long")).alias(f"__p{i}"))
    row = df.agg(*aggs)
    stacked = row.select(
        F.col("__n"),
        F.stack(
            F.lit(len(rules)),
            *[
                c
                for i, name in enumerate(rules)
                for c in (F.lit(name), F.col(f"__p{i}"))
            ],
        ).alias("rule", "n_pass"),
    )
    return stacked.select(
        "rule",
        F.col("__n").cast("long").alias("n_rows"),
        F.coalesce(F.col("n_pass"), F.lit(0)).cast("long").alias("n_pass"),
        (F.col("__n") - F.coalesce(F.col("n_pass"), F.lit(0)))
        .cast("long")
        .alias("n_fail"),
    )


def check_constraints(df: DataFrame, rules: "dict[str, str]") -> DataFrame:
    """CHECK-constraint enforcement (expect_or_fail): returns ``df``
    unchanged, except that materializing any violating row raises with the
    violated rule names and the row itself. The guard wraps the FIRST
    column, so it survives any plan that consumes that column (a write or
    merge consumes all of them); selecting the frame down to other columns
    before materializing would prune the check — enforce at the sink, which
    is where constraints belong."""
    if not df.columns:
        raise ValueError("check_constraints needs a non-empty schema")
    broken = violations_array(rules)
    c0 = df.columns[0]
    msg = F.concat(
        F.lit("constraint violated: "),
        F.array_join(broken, ", "),
        F.lit(" on row "),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])),
    )
    guard = (
        F.when(F.size(broken) > 0, F.raise_error(msg))
        .otherwise(F.col(c0))
        .cast(df.schema[c0].dataType)
    )
    return df.withColumn(c0, guard)
