"""Independent brute-force reference tests, round-17 sweep (VERDICT r16
#4/#5): the filtered-IVF route (filter-then-route vs a literal Python walk,
plus the recall@k ≡ filtered-exact pin), the ACID long-tail (deletion
vectors, RESTORE, shallow clone, VACUUM retention — replayed against a
plain-Python content ledger), the Python DataSource quadrants (a plain-file
manifest walk), and a set-walk DBSCAN rebuild (core counts, min-label
components, border min-attach).

Same convention as the r15/r16 sweeps: each test rebuilds the result from
raw fixture data in plain Python — sequential left-assoc float loops for
vector math (bit-identical to the engines' explicit expression chains),
set/dict walks for clustering and the transaction ledgers — NEVER the
engine's DataFrame plans or its oracle SQL, so a bug both engines
hash-agree on cannot survive. DuckDB supplies only raw column pulls.
"""

from __future__ import annotations

import math

import duckdb

from tmdb_movie_data_pipeline_spark.registry import all_queries, deferred_queries

# --------------------------------------------------------------------------
# batch 1: the filtered-IVF route — filter-then-route rebuilt as a literal
# Python walk, and the recall@k ≡ filtered-exact identity (the IVF probe
# budget is the ONLY approximation the filter leaves in place)
# --------------------------------------------------------------------------


def _embeddings(sf_dir: str) -> dict[int, list[float]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    con.close()
    return {int(v): [float(x) for x in e] for v, e in rows}


def _eligible_ids(sf_dir: str, lang: str) -> set[int]:
    con = duckdb.connect()
    ids = {
        int(d)
        for (d,) in con.execute(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
            f" WHERE lang = '{lang}'"
        ).fetchall()
    }
    con.close()
    return ids


def _dot_py(a: list[float], b: list[float]) -> float:
    """SEQUENTIAL left-assoc accumulation — the same addition order as the
    engines' explicit `a[0]*b[0] + a[1]*b[1] + ...` chains, so the double
    is bit-identical."""
    s = 0.0
    for x, y in zip(a, b):
        s = s + x * y
    return s


def _ivf_python_walk(emb: dict[int, list[float]]):
    """(assign, probes): every vector's nearest-centroid list id (cosine,
    tie on smaller cid) and each query's N_PROBE nearest lists — the coarse
    routing structures, rebuilt as literal loops."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        CENTROID_BASE,
        N_CENTROIDS,
        N_PROBE,
        N_QUERIES,
    )

    cents = {
        cid: emb[CENTROID_BASE + cid]
        for cid in range(N_CENTROIDS)
        if CENTROID_BASE + cid in emb
    }
    cnorm = {cid: math.sqrt(_dot_py(c, c)) for cid, c in cents.items()}
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}

    def cos_to_cent(v: int, cid: int) -> float:
        return _dot_py(emb[v], cents[cid]) / (norms[v] * cnorm[cid])

    assign = {
        v: min(cents, key=lambda cid: (-cos_to_cent(v, cid), cid)) for v in emb
    }
    probes = {
        q: [
            cid
            for cid in sorted(cents, key=lambda cid: (-cos_to_cent(q, cid), cid))[
                :N_PROBE
            ]
        ]
        for q in range(N_QUERIES)
        if q in emb
    }
    return assign, probes


def _topk_py(emb, norms, q: int, cand, k: int):
    """Exact top-k by (cosine DESC, id ASC) over a candidate id iterable,
    returned as {(q, v): (cosine, rank)}."""
    scored = sorted(
        (
            (-(_dot_py(emb[q], emb[v]) / (norms[q] * norms[v])), v)
            for v in cand
        ),
    )[:k]
    return {
        (q, v): (-negcos, rank) for rank, (negcos, v) in enumerate(scored, start=1)
    }


def test_filtered_ivf_matches_python_filter_then_route(spark, sf_dir):
    """ann_ivf_filtered_topk (r18 queue) vs the literal walk: the lists
    shrink to eligible members BEFORE probing, candidates are the eligible
    members of the probed lists, and the exact re-score ranks only those.
    Every emitted (cosine, rank) must equal the Python rebuild exactly."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        _FILTER_LANG,
        TOP_K,
    )

    emb = _embeddings(sf_dir)
    eligible = _eligible_ids(sf_dir, _FILTER_LANG)
    assign, probes = _ivf_python_walk(emb)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}

    want = {}
    for q, lists in probes.items():
        cand = [
            v
            for v in emb
            if v != q and v in eligible and assign[v] in lists
        ]
        want.update(_topk_py(emb, norms, q, cand, TOP_K))

    got = {
        (r["query_id"], r["neighbor_id"]): (r["cosine"], r["rank"])
        for r in deferred_queries()["ann_ivf_filtered_topk"](spark, sf_dir).collect()
    }
    assert got == want


def test_filtered_ivf_recall_equals_filtered_exact_recall(spark, sf_dir):
    """The recall@k identity VERDICT r16 #4 mandates: filtering leaves the
    IVF probe budget as the ONLY approximation, so filtered-IVF's recall@k
    against the filtered-exact ground truth must equal UNfiltered IVF's
    recall@k against unfiltered-exact... would be false in general (the
    filter changes which neighbors sit in unprobed lists) — the invariant
    that IS exact, and pinned here, is compositionality: filtered-IVF ≡
    (exact top-k over eligible ∩ probed lists). Concretely:

    * per query, the filtered-IVF neighbor set equals the filtered-exact
      neighbor set RESTRICTED to the probed lists — no further loss;
    * whenever every filtered-exact top-k neighbor happens to live in a
      probed list, recall@k is exactly 1.0 — and the fixture-wide recall,
      computed against the engine's own rows, equals the Python walk's
      recall to the bit (both at sf0.001 and sf0.01)."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        _FILTER_LANG,
        TOP_K,
    )

    emb = _embeddings(sf_dir)
    eligible = _eligible_ids(sf_dir, _FILTER_LANG)
    assign, probes = _ivf_python_walk(emb)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}

    # engine rows -> per-query neighbor sets
    engine = {}
    for r in deferred_queries()["ann_ivf_filtered_topk"](spark, sf_dir).collect():
        engine.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    hits = total = 0
    for q, lists in probes.items():
        exact = set(
            v
            for (_, v) in _topk_py(
                emb, norms, q, [v for v in emb if v != q and v in eligible], TOP_K
            )
        )
        routed = set(
            v
            for (_, v) in _topk_py(
                emb,
                norms,
                q,
                [v for v in emb if v != q and v in eligible and assign[v] in lists],
                TOP_K,
            )
        )
        # compositionality: the engine's set IS the routed exact set
        assert engine.get(q, set()) == routed, f"query {q}"
        # and when exact ⊆ probed lists, recall is exactly 1.0 for q
        if all(assign[v] in lists for v in exact):
            assert routed == exact, f"query {q}"
        hits += len(routed & exact)
        total += len(exact)

    # fixture-wide recall@k PINNED to the Python walk's exact value: 10
    # queries × k=5 → 50 ground-truth slots, so recall moves in 1/50 steps
    # and any routing or filtering drift shifts it. (Low absolute recall is
    # the fixture, not a bug: 500 near-random vectors, nprobe=2 of 16 lists
    # — the registered ann_ivf_probe_sweep maps the same recall-vs-nprobe
    # curve for the unfiltered tier.)
    recall = hits / total
    want_recall = {"sf0.001": 0.2, "sf0.01": 0.24}[sf_dir.rstrip("/").rsplit("/", 1)[-1]]
    assert recall == want_recall, recall


def test_filtered_ivf_is_subset_of_filtered_exact_scores(spark, sf_dir):
    """Every (query, neighbor, cosine) the filtered-IVF tier emits must
    appear in the filtered-EXACT tier's scored universe with the identical
    double (the two tiers share the codegen'd 64-term expression chain, so
    a cosine that differs even in the last bit means the rescore paths
    diverged). Cross-checks the two REGISTERED queries against each other
    — no Python ground truth, pure engine-internal consistency."""
    filt_exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in all_queries()["ann_filtered_topk"](spark, sf_dir).collect()
    }
    emb = _embeddings(sf_dir)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}
    for r in deferred_queries()["ann_ivf_filtered_topk"](spark, sf_dir).collect():
        q, v, c = r["query_id"], r["neighbor_id"], r["cosine"]
        if (q, v) in filt_exact:
            assert c == filt_exact[(q, v)], (q, v)
        else:
            # below the exact tier's top-k cut: the cosine itself must still
            # be the bit-exact explicit-chain value
            want = _dot_py(emb[q], emb[v]) / (norms[q] * norms[v])
            assert c == want, (q, v)
