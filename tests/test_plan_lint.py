"""Universal plan lint: no registered relational query may plan a
CartesianProduct — the non-broadcast pair product that turns a 100 TB
input into an N² execution. The targeted pins in test_plans.py check the
heavy hitters' exact shapes; this lint is the blanket guarantee that no
NEW operator quietly ships the worst plan shape.

Scope: the LAZY operator modules (building the DataFrame only constructs
a plan). Imperative families — streaming runs-to-completion, checkpoint/
ACID writers, io roundtrips, the REST pipeline — execute real work on
call and are exercised end-to-end by the oracle suite instead; their
inner building blocks live in the lazy modules and are linted here.

BroadcastNestedLoopJoin is NOT blanket-banned: a 1-row aggregate attach
or a bounded-frame theta join legitimately plans as one (the per-query
pins bound those cases); CartesianProduct has no legitimate instance in
this codebase.
"""

from __future__ import annotations

import re

import pytest

from tmdb_movie_data_pipeline_spark.registry import (
    all_queries,
    deferred_queries,
)

#: modules whose query functions are lazy (plan-only on call)
_LAZY_MODULES = {
    "aggregates",
    "clustering",
    "dedup",
    "events",
    "graph",
    "joins",
    "llm_prep",
    "normalize",
    "pq",
    "profiling",
    "sampling",
    "scalars",
    "setops",
    "similarity",
    "sketches",
    "spatial",
    # sql_surface is NOT lazy (ADVICE r10 item 4): scripting_block runs
    # its BEGIN/WHILE loop on call, execute_immediate executes
    # DECLARE/SET VAR plus the dynamic query, and the rest mutate session
    # temp views — the "building the DataFrame only constructs a plan"
    # premise doesn't hold. Its five queries are exercised end-to-end by
    # the oracle suite like the other imperative families.
    "subqueries",
    "text",
    "tpch_extra",
    "windows",
}


def _lintable() -> list[str]:
    qs = {**all_queries(), **deferred_queries()}
    return sorted(
        n
        for n, fn in qs.items()
        if fn.__module__.rsplit(".", 1)[-1] in _LAZY_MODULES
    )


@pytest.mark.parametrize("name", _lintable())
def test_no_cartesian_product_anywhere(spark, sf_dir, name):
    qs = {**all_queries(), **deferred_queries()}
    df = qs[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    n = len(re.findall(r"\(\d+\) CartesianProduct\b", plan))
    assert n == 0, (
        f"{name} plans {n} CartesianProduct node(s) — a non-broadcast "
        "pair product; rewrite as an equi/banded/broadcast join"
    )
    # row-at-a-time Python evaluation (BatchEvalPython) is the 10-100x
    # slow path; the one deliberate exhibit lives in operators/udfs.py,
    # outside this lint's scope. Arrow-vectorized nodes (ArrowEvalPython,
    # mapInPandas/FlatMapGroupsInPandas) remain allowed.
    b = len(re.findall(r"\(\d+\) BatchEvalPython\b", plan))
    assert b == 0, (
        f"{name} plans {b} BatchEvalPython node(s) — a row-at-a-time "
        "Python UDF on the hot path; use builtins or a pandas_udf"
    )
