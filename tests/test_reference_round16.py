"""Independent brute-force reference tests, round-16 sweep (VERDICT r15 #5):
the ANN ladder's ADC arithmetic (PQ / IVF-PQ integer scoring vs a literal
Python codebook rebuild), the TxGroup two-phase visibility rule (a plain
Python ledger beside the crash-injection suite), and the graph shelf's
newer kernels (k-core, modularity, harmonic centrality).

Same convention as tests/test_reference_round15.py: each test rebuilds the
result from raw fixture data in plain Python — sequential left-assoc float
loops for the vector math (bit-identical to the engines' explicit
expression chains), Decimal HALF_UP for the shared micro-unit quantization,
set/dict walks for the graph kernels and the transaction ledger — NEVER the
engine's DataFrame plans or its oracle SQL, so a bug both engines
hash-agree on cannot survive. DuckDB supplies only raw column pulls.
"""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from tmdb_movie_data_pipeline_spark.registry import all_queries

# --------------------------------------------------------------------------
# batch 1: the ANN ladder's ADC arithmetic — PQ codes, the query LUT, and
# integer asymmetric-distance scoring, with and without IVF routing
# --------------------------------------------------------------------------


def _embeddings(sf_dir: str) -> dict[int, list[float]]:
    """vec_id -> 64 doubles, a raw pull (parquet float32 widens exactly)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    con.close()
    return {int(v): [float(x) for x in e] for v, e in rows}


def _block_dist_py(e: list[float], c: list[float], b: int, dsub: int) -> float:
    """Squared L2 over block b's dims — SEQUENTIAL left-assoc accumulation,
    the same addition order as the engines' explicit `(d0) + (d1) + ...`
    expression chain, so the double is bit-identical."""
    d = 0.0
    for j in range(b * dsub, (b + 1) * dsub):
        d = d + (e[j] - c[j]) * (e[j] - c[j])
    return d


def _micro(x: float) -> int:
    """CAST(ROUND(x * 1e6) AS BIGINT) rebuilt exactly: Decimal(double) is
    the exact binary expansion, HALF_UP is Spark's ROUND rule."""
    return int(
        Decimal(x * 1_000_000).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def _pq_codes_py(emb, M, dsub, K, cb_base):
    """(vec_id, block) -> nearest sub-centroid id, tie on smaller cid."""
    cb = {cid: emb[cb_base + cid] for cid in range(K)}
    codes: dict[tuple[int, int], int] = {}
    for v, e in emb.items():
        for b in range(M):
            codes[(v, b)] = min(
                range(K), key=lambda cid: (_block_dist_py(e, cb[cid], b, dsub), cid)
            )
    return codes


def _pq_lut_py(emb, M, dsub, K, cb_base, n_queries):
    """(query, block, code) -> quantized micro-unit distance contribution."""
    cb = {cid: emb[cb_base + cid] for cid in range(K)}
    return {
        (q, b, cid): _micro(_block_dist_py(emb[q], cb[cid], b, dsub))
        for q in range(n_queries)
        if q in emb
        for b in range(M)
        for cid in range(K)
    }


def _adc_rank(dists: dict[tuple[int, int], int], top_k: int):
    """(query, neighbor) -> (dist, rank) for the top_k per query under the
    (dist asc, neighbor asc) total order."""
    per_q: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for (q, n), d in dists.items():
        per_q[q].append((d, n))
    out = {}
    for q, lst in per_q.items():
        for rank, (d, n) in enumerate(sorted(lst)[:top_k], start=1):
            out[(q, n)] = (d, rank)
    return out


def test_pq_encode_codes_match_python_argmin(spark, sf_dir):
    """Every vector's M=8 sub-centroid codes vs a literal Python argmin over
    the 16-row codebook slice — per-block left-assoc squared-L2 loops with
    the (distance, cid) tie order, no engine expression reuse."""
    from tmdb_movie_data_pipeline_spark.operators.pq import (
        _CB_BASE,
        PQ_DSUB,
        PQ_K,
        PQ_M,
    )

    emb = _embeddings(sf_dir)
    want = _pq_codes_py(emb, PQ_M, PQ_DSUB, PQ_K, _CB_BASE)
    got = {
        (r["vec_id"], r["block"]): r["code"]
        for r in all_queries()["pq_encode_codes"](spark, sf_dir).collect()
    }
    assert got == want


def test_pq_adc_topk_matches_python_lut_walk(spark, sf_dir):
    """ADC top-k rebuilt end-to-end in Python: codes (argmin walk), the
    query LUT (Decimal HALF_UP micro-units), integer 8-term sums per
    (query, candidate), the (dist, neighbor) rank order, self excluded.
    The integer scoring is what makes the ranking engine-exact — this test
    is the third, plan-free formulation of that arithmetic."""
    from tmdb_movie_data_pipeline_spark.operators.pq import (
        _CB_BASE,
        PQ_DSUB,
        PQ_K,
        PQ_M,
    )
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )

    emb = _embeddings(sf_dir)
    codes = _pq_codes_py(emb, PQ_M, PQ_DSUB, PQ_K, _CB_BASE)
    lut = _pq_lut_py(emb, PQ_M, PQ_DSUB, PQ_K, _CB_BASE, N_QUERIES)
    dists: dict[tuple[int, int], int] = {}
    for q in range(N_QUERIES):
        if q not in emb:
            continue
        for v in emb:
            if v == q:
                continue
            dists[(q, v)] = sum(
                lut[(q, b, codes[(v, b)])] for b in range(PQ_M)
            )
    want = _adc_rank(dists, TOP_K)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["adc_dist_q"], r["rank"])
        for r in all_queries()["ann_pq_adc_topk"](spark, sf_dir).collect()
    }
    assert got == want


def _dot_py(a: list[float], b: list[float]) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s = s + x * y
    return s


def _ivf_route_py(emb, n_centroids, centroid_base, n_probe, n_queries):
    """(assign, probes) rebuilt with cosine loops: every vector's nearest
    centroid under (cos desc, cid asc), every query's n_probe lists."""
    cents = {
        cid: emb[centroid_base + cid] for cid in range(n_centroids)
    }
    norms = {cid: math.sqrt(_dot_py(c, c)) for cid, c in cents.items()}

    def cos_row(e):
        ne = math.sqrt(_dot_py(e, e))
        return {
            cid: _dot_py(e, cents[cid]) / (ne * norms[cid])
            for cid in cents
        }

    assign = {}
    probes: dict[int, list[int]] = {}
    for v, e in emb.items():
        cs = cos_row(e)
        assign[v] = min(cs, key=lambda cid: (-cs[cid], cid))
        if v < n_queries:
            probes[v] = sorted(cs, key=lambda cid: (-cs[cid], cid))[:n_probe]
    return assign, probes


def test_ivfpq_topk_matches_python_route_and_adc(spark, sf_dir):
    """IVF-PQ rebuilt whole: cosine routing (assignment + probes) with
    left-assoc dot loops, candidates = vectors in the query's probed lists,
    scored ONLY via the integer LUT over their codes — the production ANN
    shape, reproduced without a single engine relation."""
    from tmdb_movie_data_pipeline_spark.operators.pq import (
        _CB_BASE,
        PQ_DSUB,
        PQ_K,
        PQ_M,
    )
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        CENTROID_BASE,
        N_CENTROIDS,
        N_PROBE,
        N_QUERIES,
        TOP_K,
    )

    emb = _embeddings(sf_dir)
    assign, probes = _ivf_route_py(
        emb, N_CENTROIDS, CENTROID_BASE, N_PROBE, N_QUERIES
    )
    codes = _pq_codes_py(emb, PQ_M, PQ_DSUB, PQ_K, _CB_BASE)
    lut = _pq_lut_py(emb, PQ_M, PQ_DSUB, PQ_K, _CB_BASE, N_QUERIES)
    dists: dict[tuple[int, int], int] = {}
    for q, lists in probes.items():
        probed = set(lists)
        for v in emb:
            if v != q and assign[v] in probed:
                dists[(q, v)] = sum(
                    lut[(q, b, codes[(v, b)])] for b in range(PQ_M)
                )
    want = _adc_rank(dists, TOP_K)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["adc_dist_q"], r["rank"])
        for r in all_queries()["ann_ivfpq_topk"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 2: TxGroup two-phase visibility — a plain-Python ledger replays the
# op sequence and must match every engine read (head + time travel) at
# every step, including after an abort and under an in-doubt prepare
# --------------------------------------------------------------------------


def test_txgroup_visibility_matches_python_ledger(spark, tmp_path):
    """The 2PC rule rebuilt as a dict ledger: visible content per table is
    the fold of COMMITTED ops only, in commit order; a group's ops apply
    atomically at its record's creation or never. The engine's reads (head
    and per-version time travel) must equal the ledger at EVERY step —
    unlike the crash-injection suite this asserts whole contents, derived
    without TxTable internals."""
    from tmdb_movie_data_pipeline_spark.plans.acid import TxTable
    from tmdb_movie_data_pipeline_spark.plans.txgroup import GroupAborted, TxGroup
    import pytest

    def mk(name, keys):
        return TxTable.create(
            spark,
            str(tmp_path / name),
            spark.createDataFrame([(k,) for k in keys], "k long"),
        )

    # the Python ledger: table -> ordered list of committed snapshots
    ledger = {"a": [set(range(10))], "b": [set(range(100, 120))]}
    a, b = mk("a", ledger["a"][0]), mk("b", ledger["b"][0])

    def check():
        for t, name in ((a, "a"), (b, "b")):
            snaps = ledger[name]
            got_head = {r["k"] for r in t.read().collect()}
            assert got_head == snaps[-1], f"{name} head diverged"
            # every committed snapshot remains time-travelable in order:
            # walk the engine's VISIBLE versions, oldest first
            vis = [
                v
                for v in t.versions()
                if t._is_visible(t.manifest(v))  # noqa: SLF001 — the rule under test
            ]
            assert len(vis) == len(snaps)
            for v, want in zip(vis, snaps):
                assert {r["k"] for r in t.read(v).collect()} == want

    check()

    # single-table merge on a: committed instantly
    a.merge(spark.createDataFrame([(40,)], "k long"), "k")
    ledger["a"].append(ledger["a"][-1] | {40})
    check()

    g = TxGroup(spark, str(tmp_path))

    def dfs(keys):
        return spark.createDataFrame([(k,) for k in sorted(keys)], "k long")

    # group 1: move 0-4 from a to b — atomic, both sides flip together
    a1 = ledger["a"][-1] - set(range(5))
    b1 = ledger["b"][-1] | set(range(5))
    gid = g.prepare([(a, dfs(a1)), (b, dfs(b1))], "MOVE")
    # prepared but unrecorded: the ledger says nothing changed yet
    check()
    g.commit(gid, [a.path, b.path])
    ledger["a"].append(a1)
    ledger["b"].append(b1)
    check()

    # group 2: prepare then ABORT — the ledger never applies it
    gid2 = g.prepare(
        [(a, dfs(ledger["a"][-1] | {777})), (b, dfs(set()))], "DOOMED"
    )
    g.abort(gid2)
    check()
    with pytest.raises(GroupAborted):
        g.commit(gid2, [a.path, b.path])
    check()

    # group 3: prepare and CRASH (no record): in-doubt — still invisible
    gid3 = g.prepare([(a, dfs({999}))], "IN_DOUBT")
    check()
    g.abort(gid3)  # resolve so the table isn't left wedged
    check()


# --------------------------------------------------------------------------
# batch 3: graph-shelf kernels vs set/dict walks over the dup graph
# --------------------------------------------------------------------------


def _dup_adj(spark, sf_dir) -> dict[int, set[int]]:
    """Symmetric adjacency from the engine's staged LSH pairs (whose
    construction carries its own r2 stage-for-stage hashlib rebuild; what
    this batch rebuilds independently is the kernel algebra on top)."""
    from tmdb_movie_data_pipeline_spark.operators.dedup import lsh_pairs_staged

    adj: dict[int, set[int]] = defaultdict(set)
    for r in lsh_pairs_staged(spark, sf_dir).collect():
        a, b = int(r["doc_a"]), int(r["doc_b"])
        adj[a].add(b)
        adj[b].add(a)
    return adj


def test_kcore_matches_python_peel(spark, sf_dir):
    """Synchronous k-core peeling as a set walk: each round keeps vertices
    with >= K neighbors among the PREVIOUS round's survivors (all drops in
    a round happen together — the determinism the fixed-round design
    buys); then each survivor reports its within-core degree."""
    from tmdb_movie_data_pipeline_spark.operators.graph import (
        _KCORE_K,
        _KCORE_ROUNDS,
    )

    adj = _dup_adj(spark, sf_dir)
    alive = set(adj)
    for _ in range(_KCORE_ROUNDS):
        alive = {v for v in alive if len(adj[v] & alive) >= _KCORE_K}
    want = {v: len(adj[v] & alive) for v in alive}
    got = {
        r["doc_id"]: r["core_degree"]
        for r in all_queries()["graph_kcore"](spark, sf_dir).collect()
    }
    assert got == want


def _lpa_labels_py(adj, langs, iters, seed_mod):
    """The deterministic synchronous LPA walk (r15's reference), reused as
    the partition input to the modularity formula."""
    seeds = {v: langs[v] for v in adj if v % seed_mod == 0}
    labels = dict(seeds)
    for _ in range(iters):
        new = {}
        for v in adj:
            if v in seeds:
                continue
            votes: dict[str, int] = defaultdict(int)
            for u in adj[v]:
                if u in labels:
                    votes[labels[u]] += 1
            if votes:
                new[v] = min(votes, key=lambda lab: (-votes[lab], lab))
        labels = {**new, **seeds}
    return labels


def test_modularity_matches_python_formula(spark, sf_dir):
    """Newman modularity contributions rebuilt from first principles: the
    LPA partition from the literal vote walk, then per community
    l_c (intra edges, counted as unordered pairs), d_c (degree sum),
    n_nodes, and the exact-integer ppm formula
    q = (1e6*l_c)//m - (1e6*d_c^2)//(4*m^2) — Python // equals the
    engines' div because every operand is non-negative."""
    from tmdb_movie_data_pipeline_spark.operators.graph import (
        _LP_ITERS,
        _LP_SEED_MOD,
    )

    adj = _dup_adj(spark, sf_dir)
    con = duckdb.connect()
    langs = {
        int(k): v
        for k, v in con.execute(
            f"SELECT doc_id, lang FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    }
    con.close()
    labels = _lpa_labels_py(adj, langs, _LP_ITERS, _LP_SEED_MOD)
    m = sum(len(adj[v]) for v in adj) // 2
    want = {}
    per_lab: dict[str, list[int]] = defaultdict(list)
    for v, lab in labels.items():
        per_lab[lab].append(v)
    for lab, vs in per_lab.items():
        l_c = (
            sum(sum(1 for u in adj[v] if labels.get(u) == lab) for v in vs) // 2
        )
        d_c = sum(len(adj[v]) for v in vs)
        q = (1_000_000 * l_c) // m - (1_000_000 * d_c * d_c) // (4 * m * m)
        want[lab] = (len(vs), l_c, d_c, q)
    got = {
        r["label"]: (
            r["n_nodes"],
            r["intra_edges"],
            r["degree_sum"],
            r["q_contrib_ppm"],
        )
        for r in all_queries()["graph_modularity"](spark, sf_dir).collect()
    }
    assert got == want
    # the partition found real structure on this fixture: Q > 0 overall
    assert sum(q for _, _, _, q in want.values()) > 0


def test_harmonic_centrality_matches_python_bfs(spark, sf_dir):
    """Radius-3 harmonic centrality as a literal per-vertex BFS over sets:
    n1/n2/n3 are the exact hop-distance shells (shortest distance, not
    reachability), harmonic_x12 = 12*n1 + 6*n2 + 4*n3."""
    adj = _dup_adj(spark, sf_dir)
    want = {}
    for s in adj:
        seen = {s}
        frontier = {s}
        shells = []
        for _ in range(3):
            nxt = {u for v in frontier for u in adj[v]} - seen
            shells.append(len(nxt))
            seen |= nxt
            frontier = nxt
        n1, n2, n3 = shells
        want[s] = (n1, n2, n3, 12 * n1 + 6 * n2 + 4 * n3)
    got = {
        r["doc_id"]: (r["n1"], r["n2"], r["n3"], r["harmonic_x12"])
        for r in all_queries()["graph_harmonic_centrality"](spark, sf_dir).collect()
    }
    assert got == want


def test_filtered_ann_matches_python_prefilter_walk(spark, sf_dir):
    """Filtered vector search (r17 queue) vs a literal Python walk: the
    eligible set is the lang-predicate pull, ranking happens AFTER the
    filter, and every query returns its exact k best eligible neighbors.
    Also pins the trap the operator exists to avoid: post-filtering the
    UNFILTERED top-k yields a strict subset (fewer than k) for at least
    one query on this fixture — pre- and post-filter are not the same
    operator."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        _FILTER_LANG,
        N_QUERIES,
        TOP_K,
    )
    from tmdb_movie_data_pipeline_spark.registry import deferred_queries

    emb = _embeddings(sf_dir)
    con = duckdb.connect()
    eligible = {
        int(d)
        for (d,) in con.execute(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
            f" WHERE lang = '{_FILTER_LANG}'"
        ).fetchall()
    }
    con.close()
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}

    def topk(q, cand):
        scored = sorted(
            ((-_dot_py(emb[q], emb[v]) / (norms[q] * norms[v]), v) for v in cand),
        )[:TOP_K]
        return {
            (q, v): (-negcos, rank)
            for rank, (negcos, v) in enumerate(scored, start=1)
        }

    want = {}
    post_filter_short = 0
    for q in range(N_QUERIES):
        if q not in emb:
            continue
        pre = topk(q, [v for v in emb if v != q and v in eligible])
        want.update(pre)
        post = {
            (qq, v)
            for (qq, v) in topk(q, [v for v in emb if v != q])
            if v in eligible
        }
        assert post <= set(pre)  # post-filter is always a subset...
        if len(post) < min(TOP_K, len(pre)):
            post_filter_short += 1  # ...and strictly short somewhere
    got = {
        (r["query_id"], r["neighbor_id"]): (r["cosine"], r["rank"])
        for r in deferred_queries()["ann_filtered_topk"](spark, sf_dir).collect()
    }
    assert got == want
    assert post_filter_short >= 1
