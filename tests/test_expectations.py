"""Expectations / CHECK constraints (operators/expectations.py): the split,
the one-scan stats, NULL-as-violation semantics, and the in-plan fail path
staying a lazy transform with the rule name in the error."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rca_data_tools_spark.operators.expectations import (
    apply_expectations,
    check_constraints,
    expectation_stats,
    with_violations,
)

RULES = {
    "text_present": "text IS NOT NULL AND length(text) > 0",
    "score_in_range": "score BETWEEN 0 AND 1",
    "lang_known": "lang IN ('en', 'de')",
}


def _df(spark):
    rows = [
        (1, "hello", 0.5, "en"),     # clean
        (2, None, 0.5, "en"),        # text_present
        (3, "x", 1.5, "de"),         # score_in_range
        (4, "y", None, "fr"),        # score (NULL = violation) + lang
        (5, "", 0.0, "en"),          # text_present (empty)
    ]
    return spark.createDataFrame(
        rows, "doc_id int, text string, score double, lang string"
    )


def test_split_and_violation_names(spark):
    good, bad = apply_expectations(_df(spark), RULES)
    assert [r["doc_id"] for r in good.collect()] == [1]
    got = {r["doc_id"]: sorted(r["violations"]) for r in bad.collect()}
    assert got == {
        2: ["text_present"],
        3: ["score_in_range"],
        4: ["lang_known", "score_in_range"],
        5: ["text_present"],
    }


def test_stats_one_row_per_rule(spark):
    stats = {r["rule"]: r for r in expectation_stats(_df(spark), RULES).collect()}
    assert set(stats) == set(RULES)
    assert all(r["n_rows"] == 5 for r in stats.values())
    assert stats["text_present"]["n_fail"] == 2
    assert stats["score_in_range"]["n_fail"] == 2
    assert stats["lang_known"]["n_fail"] == 1
    assert stats["lang_known"]["n_pass"] == 4


def test_check_constraints_lazy_then_raises_with_rule_name(spark):
    guarded = check_constraints(_df(spark), {"text_present": RULES["text_present"]})
    # still a lazy transform: building the plan runs no job
    assert guarded.schema == _df(spark).schema
    with pytest.raises(Exception, match="constraint violated.*text_present"):
        guarded.collect()
    # a clean frame materializes unchanged through the guard
    clean = _df(spark).filter(F.col("doc_id") == 1)
    out = check_constraints(clean, RULES).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1


def test_violations_column_is_codegen_not_python(spark):
    plan = with_violations(_df(spark), RULES)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
