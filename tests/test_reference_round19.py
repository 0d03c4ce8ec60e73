"""Independent brute-force reference tests, round-19 sweep (VERDICT r18 #5/#6):
the query-time filtered probe THROUGH the incrementally-maintained IVF index
(`stream_ivf_index_filtered_probe`, r20 queue) — the full filtered top-k
rebuilt as literal Python walks over raw fixture pulls (assignment argmax,
eligibility set, probe selection, exact cosine rescore with SEQUENTIAL
left-assoc float accumulation bit-identical to the engine's explicit
expression chains), the query-level arrival-independence identity vs the
batch-routed `ann_ivf_filtered_topk`, and the scale-plan pin: the probe's
scan of the maintained cid-partitioned lists carries a dynamic-partition-
pruning subquery on cid (probed lists prune at runtime).

Same convention as the r15–r18 sweeps: NEVER the engine's DataFrame plans or
its oracle SQL for the primary rebuild; DuckDB supplies only raw column
pulls. Runs at sf0.001 AND sf0.01 (SPARK_GRAFT_TEST_SF_DIR) per the
two-scale protocol.
"""

from __future__ import annotations

import math

import duckdb

from tmdb_movie_data_pipeline_spark.registry import all_queries


def _embeddings(sf_dir: str) -> dict[int, list[float]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    con.close()
    return {int(v): [float(x) for x in e] for v, e in rows}


def _eligible_ids(sf_dir: str) -> set[int]:
    """Raw pull of the eligibility predicate's id set (documents.lang='en'),
    matching operators/similarity._FILTER_LANG by value."""
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id FROM "
        f"read_parquet('{sf_dir}/documents.parquet') WHERE lang = 'en'"
    ).fetchall()
    con.close()
    return {int(r[0]) for r in rows}


def _dot_py(a: list[float], b: list[float]) -> float:
    """SEQUENTIAL left-assoc accumulation — the same addition order as the
    engines' explicit `a[0]*b[0] + a[1]*b[1] + ...` chains."""
    s = 0.0
    for x, y in zip(a, b):
        s = s + x * y
    return s


def _python_filtered_probe(
    emb: dict[int, list[float]], eligible: set[int]
) -> list[tuple[int, int, float, int]]:
    """The whole filtered-probe result as literal loops: per-vector argmax
    assignment (cos DESC, cid ASC), per-query N_PROBE probe lists, eligible
    candidates in probed lists, exact cosine rescore, per-query top-k ranked
    by (cosine DESC, neighbor_id ASC). Returns (query_id, neighbor_id,
    cosine, rank) rows — cosine bit-identical to the engine's chain."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        CENTROID_BASE,
        N_CENTROIDS,
        N_PROBE,
        N_QUERIES,
        TOP_K,
    )

    cents = {cid: emb[CENTROID_BASE + cid] for cid in range(N_CENTROIDS)}
    cnorm = {cid: math.sqrt(_dot_py(c, c)) for cid, c in cents.items()}
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}

    def cos_to_cent(v: int, cid: int) -> float:
        return _dot_py(emb[v], cents[cid]) / (norms[v] * cnorm[cid])

    assign = {v: min(cents, key=lambda c: (-cos_to_cent(v, c), c)) for v in emb}

    out: list[tuple[int, int, float, int]] = []
    for q in range(N_QUERIES):
        probes = sorted(cents, key=lambda c: (-cos_to_cent(q, c), c))[:N_PROBE]
        cand = [
            v
            for v in emb
            if v != q and v in eligible and assign[v] in probes
        ]
        scored = sorted(
            (
                -(_dot_py(emb[q], emb[v]) / (norms[q] * norms[v])),
                v,
            )
            for v in cand
        )[:TOP_K]
        for rank, (neg_cos, v) in enumerate(scored, start=1):
            out.append((q, v, -neg_cos, rank))
    return out


def test_filtered_probe_matches_python_walk(spark, sf_dir):
    """The by-name independent rebuild for stream_ivf_index_filtered_probe
    (VERDICT r17 #6 / r18 #6: every registered name ships with its
    plain-Python rebuild in the registering round): the engine's filtered
    top-k served THROUGH the streamed index must equal the literal walk row
    for row — ids, ranks, AND bit-identical cosine doubles."""
    emb = _embeddings(sf_dir)
    want = sorted(_python_filtered_probe(emb, _eligible_ids(sf_dir)))
    got = sorted(
        (int(r["query_id"]), int(r["neighbor_id"]), float(r["cosine"]), int(r["rank"]))
        for r in all_queries()["stream_ivf_index_filtered_probe"](
            spark, sf_dir
        ).collect()
    )
    assert got == want


def test_filtered_probe_candidates_are_eligible_and_probed(spark, sf_dir):
    """Every returned neighbor satisfies the predicate (a filter-then-route
    result can never contain an ineligible id) and sits in one of its
    query's probed lists — both sets rebuilt from raw pulls."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        CENTROID_BASE,
        N_CENTROIDS,
        N_PROBE,
    )

    emb = _embeddings(sf_dir)
    eligible = _eligible_ids(sf_dir)
    cents = {cid: emb[CENTROID_BASE + cid] for cid in range(N_CENTROIDS)}
    cnorm = {cid: math.sqrt(_dot_py(c, c)) for cid, c in cents.items()}
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}

    def cos_to_cent(v: int, cid: int) -> float:
        return _dot_py(emb[v], cents[cid]) / (norms[v] * cnorm[cid])

    assign = {v: min(cents, key=lambda c: (-cos_to_cent(v, c), c)) for v in emb}
    rows = all_queries()["stream_ivf_index_filtered_probe"](
        spark, sf_dir
    ).collect()
    assert rows  # the probe returns neighbors at both protocol scales
    for r in rows:
        q, n = int(r["query_id"]), int(r["neighbor_id"])
        probes = sorted(cents, key=lambda c: (-cos_to_cent(q, c), c))[:N_PROBE]
        assert n in eligible, f"ineligible neighbor {n} for query {q}"
        assert assign[n] in probes, f"neighbor {n} outside query {q}'s lists"
        assert n != q


def test_filtered_probe_equals_batch_routed_query(spark, sf_dir):
    """Arrival-independence lifted to the QUERY level (the composition this
    registration exists to pin): serving the filtered top-k through the
    streamed, epoch-by-epoch maintained lists returns the bit-identical
    relation as `ann_ivf_filtered_topk`'s batch routing — the maintained
    index is a drop-in replacement for re-routing the corpus. (Secondary
    engine-vs-engine identity; the primary plan-free rebuild is
    test_filtered_probe_matches_python_walk.)"""
    via_index = sorted(
        map(
            tuple,
            all_queries()["stream_ivf_index_filtered_probe"](
                spark, sf_dir
            ).collect(),
        )
    )
    via_batch = sorted(
        map(tuple, all_queries()["ann_ivf_filtered_topk"](spark, sf_dir).collect())
    )
    assert via_index == via_batch


def test_filtered_probe_plan_prunes_list_partitions(spark, sf_dir):
    """The 100 TB plan property the maintained layout buys: the probe's scan
    of the cid-partitioned list store carries a dynamic-partition-pruning
    subquery on cid — at scale, only the probed lists' partitions are read,
    independent of how many epochs ever streamed in. Also re-pins the
    suite-wide bans (no cartesian product, no Python eval) and the pushed
    eligibility predicate on this composed plan.

    ADVICE r19 #3: the pins match case-insensitive TOKENS, not an exact
    PushedFilters rendering — filter ordering / spacing / casing are Spark
    formatting choices that can change across versions without any
    behavior regression; the behavior that matters is that the lang
    equality reaches the parquet scan and the list scan carries a runtime
    pruning subquery."""
    import re

    df = all_queries()["stream_ivf_index_filtered_probe"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan_l = plan.lower()
    assert "dynamicpruning" in plan_l
    assert "cartesianproduct" not in plan_l
    assert "batchevalpython" not in plan_l
    assert re.search(
        r"pushedfilters:\s*\[[^\]]*equalto\(lang,\s*en\)", plan_l
    ), "lang=en equality not pushed to the documents scan"
