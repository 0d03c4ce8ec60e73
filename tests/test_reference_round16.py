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
        for r in all_queries()["ann_filtered_topk"](spark, sf_dir).collect()
    }
    assert got == want
    assert post_filter_short >= 1


# --------------------------------------------------------------------------
# batch 2: the sketch shelf — every member rebuilt from raw pulls with
# hashlib + integer arithmetic (registers, counters, order statistics),
# including the mergeability identities the engine queries pin
# --------------------------------------------------------------------------


def _md5_60(s: str) -> int:
    """First 15 hex digits of md5 -> uniform 60-bit int, the shelf's shared
    hash, rebuilt with hashlib."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


_HASH_RANGE = float(1 << 60)


def _kmv_est(n_exact: int, hvs: list[int], k: int) -> float:
    """(K-1) / (h_K / 2^60), exact-count fallback below capacity — the two
    IEEE divisions in the engines' order."""
    s = sorted(hvs)
    if len(s) < k:
        return float(n_exact)
    return float(k - 1) / (float(s[k - 1]) / _HASH_RANGE)


def _raw(sf_dir: str, sql: str):
    con = duckdb.connect()
    out = con.execute(sql.replace("{D}", sf_dir)).fetchall()
    con.close()
    return out


def test_kmv_distinct_matches_hashlib_order_stat(spark, sf_dir):
    """Per-type KMV estimate vs a hashlib rebuild: distinct 60-bit hashes,
    the 64th order statistic, two IEEE divisions."""
    from tmdb_movie_data_pipeline_spark.operators.sketches import KMV_K

    per: dict[str, set[int]] = defaultdict(set)
    for t, u in _raw(
        sf_dir, "SELECT event_type, user_id FROM read_parquet('{D}/events.parquet')"
    ):
        per[t].add(_md5_60(str(u)))
    want = {
        t: (len(hv), _kmv_est(len(hv), list(hv), KMV_K)) for t, hv in per.items()
    }
    got = {
        r["event_type"]: (r["n_exact"], r["est_distinct"])
        for r in all_queries()["sketch_kmv_distinct"](spark, sf_dir).collect()
    }
    assert got == want


def test_kmv_union_merges_states_exactly(spark, sf_dir):
    """Union KMV: the __all__ estimate folds PER-SOURCE 64-smallest states
    (never raw rows) — rebuilt by literally unioning the per-source
    K-smallest lists and re-trimming, the mergeability identity itself."""
    from tmdb_movie_data_pipeline_spark.operators.sketches import KMV_K

    per: dict[str, set[int]] = defaultdict(set)
    for s, txt in _raw(
        sf_dir, "SELECT source, text FROM read_parquet('{D}/documents.parquet')"
    ):
        per[s].add(_md5_60(txt))
    want = {
        s: (len(hv), _kmv_est(len(hv), list(hv), KMV_K)) for s, hv in per.items()
    }
    states = set()
    for hv in per.values():
        states |= set(sorted(hv)[:KMV_K])
    n_all = len(set().union(*per.values()))
    want["__all__"] = (n_all, _kmv_est(n_all, list(states), KMV_K))
    got = {
        r["scope"]: (r["n_exact"], r["est_distinct"])
        for r in all_queries()["sketch_kmv_union"](spark, sf_dir).collect()
    }
    assert got == want


_WMAX = 55
_HLL_M = 64


def _hll_regs(hvs) -> dict[int, int]:
    regs: dict[int, int] = {}
    for hv in hvs:
        reg, w = hv % _HLL_M, hv >> 6
        rho = _WMAX if w == 0 else _WMAX - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _hll_est(regs: dict[int, int]) -> tuple[int, float]:
    s_int = sum(1 << (_WMAX - mj) for mj in regs.values())
    v_zero = _HLL_M - len(regs)
    s_int += v_zero * (1 << _WMAX)
    return v_zero, 2904.064 * 2.0**_WMAX / float(s_int)


def test_hll_distinct_matches_register_rebuild(spark, sf_dir):
    """Deterministic HLL vs a dict register file: reg = hv % 64, rho =
    55 - bit_length(hv >> 6), integer harmonic sum, one float division."""
    per: dict[str, set[int]] = defaultdict(set)
    users: dict[str, set[int]] = defaultdict(set)
    for t, u in _raw(
        sf_dir, "SELECT event_type, user_id FROM read_parquet('{D}/events.parquet')"
    ):
        per[t].add(_md5_60(str(u)))
        users[t].add(u)
    want = {}
    for t, hvs in per.items():
        v_zero, est = _hll_est(_hll_regs(hvs))
        want[t] = (len(users[t]), v_zero, est)
    got = {
        r["event_type"]: (r["n_exact"], r["v_zero"], r["est_distinct"])
        for r in all_queries()["sketch_hll_distinct"](spark, sf_dir).collect()
    }
    assert got == want


def test_hll_union_is_registerwise_max(spark, sf_dir):
    """HLL merge vs the identity max(max(a), max(b)) == max(a U b): fold
    per-source register dicts by element-wise max and estimate from the
    folded state alone."""
    per: dict[str, set[int]] = defaultdict(set)
    for s, txt in _raw(
        sf_dir, "SELECT source, text FROM read_parquet('{D}/documents.parquet')"
    ):
        per[s].add(_md5_60(txt))
    states = {s: _hll_regs(hvs) for s, hvs in per.items()}
    merged: dict[int, int] = {}
    for regs in states.values():
        for reg, mj in regs.items():
            merged[reg] = max(merged.get(reg, 0), mj)
    want = {s: _hll_est(regs) for s, regs in states.items()}
    want["__all__"] = _hll_est(merged)
    got = {
        r["scope"]: (r["v_zero"], r["est_distinct"])
        for r in all_queries()["sketch_hll_union"](spark, sf_dir).collect()
    }
    assert got == want


def _cms_walk(rows, d, w):
    """(sketch counters, exact counts) from a key stream — counters over
    ALL occurrences, the d md5-salted positions per key."""
    sketch = [defaultdict(int) for _ in range(d)]
    exact: dict[str, int] = defaultdict(int)
    pos: dict[tuple[int, str], int] = {}
    for k in rows:
        exact[k] += 1
        for i in range(d):
            if (i, k) not in pos:
                pos[(i, k)] = _md5_60(f"{i}_{k}") % w
            sketch[i][pos[(i, k)]] += 1
    return sketch, exact, pos


def test_cms_heavy_hitters_match_counter_walk(spark, sf_dir):
    """Count-Min top-20 vs literal dict counters: per-key estimate is the
    MIN over 4 salted rows, one-sided by construction; ranking by
    (exact desc, key-string asc)."""
    from tmdb_movie_data_pipeline_spark.operators.sketches import (
        CMS_D,
        CMS_TOPN,
        CMS_W,
    )

    rows = [
        str(u)
        for (u,) in _raw(
            sf_dir, "SELECT user_id FROM read_parquet('{D}/events.parquet')"
        )
    ]
    sketch, exact, pos = _cms_walk(rows, CMS_D, CMS_W)
    want = {}
    for k in sorted(exact, key=lambda k: (-exact[k], k))[:CMS_TOPN]:
        est = min(sketch[i][pos[(i, k)]] for i in range(CMS_D))
        want[k] = (exact[k], est)
        assert est >= exact[k]  # the one-sided guarantee, rebuilt
    got = {
        r["user_key"]: (r["n_exact"], r["n_est"])
        for r in all_queries()["sketch_cms_heavy_hitters"](spark, sf_dir).collect()
    }
    assert got == want


def test_cms_union_is_cellwise_sum(spark, sf_dir):
    """CMS linearity: per-event-type counter grids folded by cell-wise sum
    must answer global probes identically to counting the union stream —
    rebuilt by building per-type dicts and adding them."""
    from tmdb_movie_data_pipeline_spark.operators.sketches import (
        CMS_D,
        CMS_TOPN,
        CMS_W,
    )

    per_type: dict[str, list[str]] = defaultdict(list)
    for t, u in _raw(
        sf_dir, "SELECT event_type, user_id FROM read_parquet('{D}/events.parquet')"
    ):
        per_type[t].append(str(u))
    merged = [defaultdict(int) for _ in range(CMS_D)]
    exact: dict[str, int] = defaultdict(int)
    pos: dict[tuple[int, str], int] = {}
    for t, ks in per_type.items():
        sk, ex, ps = _cms_walk(ks, CMS_D, CMS_W)
        pos.update(ps)
        for i in range(CMS_D):
            for c, n in sk[i].items():
                merged[i][c] += n
        for k, n in ex.items():
            exact[k] += n
    want = {}
    for k in sorted(exact, key=lambda k: (-exact[k], k))[:CMS_TOPN]:
        est = min(merged[i][pos[(i, k)]] for i in range(CMS_D))
        want[k] = (exact[k], est, est >= exact[k])
    got = {
        r["user_key"]: (r["n_exact"], r["n_est"], r["one_sided"])
        for r in all_queries()["sketch_cms_union"](spark, sf_dir).collect()
    }
    assert got == want
    assert all(os for _, _, os in got.values())


def test_kmv_intersection_matches_probe_walk(spark, sf_dir):
    """Theta-style intersection: union-KMV sample, exact membership probe
    against both per-set hash sets, Jaccard fraction x union estimate —
    all from hashlib sets."""
    from tmdb_movie_data_pipeline_spark.operators.sketches import KMV_K

    per: dict[str, set[int]] = defaultdict(set)
    for t, u in _raw(
        sf_dir,
        "SELECT event_type, user_id FROM read_parquet('{D}/events.parquet')"
        " WHERE event_type IN ('view', 'click', 'purchase')",
    ):
        per[t].add(_md5_60(str(u)))
    want = {}
    for ta, tb in (("click", "purchase"), ("click", "view"), ("purchase", "view")):
        a, b = per[ta], per[tb]
        unionk = sorted(a | b)[:KMV_K]
        k_eff, hk = len(unionk), max(unionk)
        shared = sum(1 for hv in unionk if hv in a and hv in b)
        est = (
            float(shared) / float(k_eff)
            * (float(k_eff - 1) / (float(hk) / _HASH_RANGE))
        )
        want[(ta, tb)] = (len(a & b), est)
    got = {
        (r["t_a"], r["t_b"]): (r["n_exact"], r["est_intersection"])
        for r in all_queries()["sketch_kmv_intersection"](spark, sf_dir).collect()
    }
    assert got == want


def test_kmv_difference_matches_churn_walk(spark, sf_dir):
    """Churn |A \\ B| per event type (days 1-3 actives never seen in 4-6):
    the anti-membership probe inside the union-KMV sample, rebuilt from
    epoch-day buckets and hashlib sets."""
    from tmdb_movie_data_pipeline_spark.operators.sketches import KMV_K

    A: dict[str, set[int]] = defaultdict(set)
    B: dict[str, set[int]] = defaultdict(set)
    for t, day, u in _raw(
        sf_dir,
        "SELECT event_type, CAST(strftime(ts, '%d') AS INTEGER), user_id"
        " FROM read_parquet('{D}/events.parquet')"
        " WHERE CAST(strftime(ts, '%d') AS INTEGER) <= 6",
    ):
        (A if day <= 3 else B)[t].add(_md5_60(str(u)))
    want = {}
    for t in set(A) | set(B):
        a, b = A[t], B[t]
        unionk = sorted(a | b)[:KMV_K]
        k_eff, hk = len(unionk), max(unionk)
        only_a = sum(1 for hv in unionk if hv in a and hv not in b)
        est = (
            float(only_a) / float(k_eff)
            * (float(k_eff - 1) / (float(hk) / _HASH_RANGE))
        )
        want[t] = (len(a - b), est)
    got = {
        r["event_type"]: (r["n_exact"], r["est_difference"])
        for r in all_queries()["sketch_kmv_difference"](spark, sf_dir).collect()
    }
    assert got == want


def test_quantile_histogram_matches_bin_walk(spark, sf_dir):
    """Fixed-grid histogram quantiles vs dict bins + a sorted list: bin =
    floor(v/512), k = (p*n+99)//100, hit bin = first with cum >= k, exact
    k-th order statistic, the within-bin accuracy contract."""
    from tmdb_movie_data_pipeline_spark.operators.sketches import (
        _QH_PS,
        _QH_WIDTH,
    )

    per: dict[str, list[float]] = defaultdict(list)
    for s, v in _raw(
        sf_dir,
        "SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE)"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        per[s].append(float(v))
        per["__all__"].append(float(v))
    want = {}
    for scope, vs in per.items():
        bins: dict[int, int] = defaultdict(int)
        for v in vs:
            bins[math.floor(v / _QH_WIDTH)] += 1
        n = len(vs)
        svs = sorted(vs)
        for p in _QH_PS:
            k = (p * n + 99) // 100
            cum = 0
            for b in sorted(bins):
                cum += bins[b]
                if cum >= k:
                    qbin = b
                    break
            exact_q = svs[k - 1]
            want[(scope, p)] = (
                n,
                k,
                float((qbin + 1) * _QH_WIDTH),
                exact_q,
                qbin * _QH_WIDTH <= exact_q < (qbin + 1) * _QH_WIDTH,
            )
    got = {
        (r["scope"], r["p"]): (
            r["n"],
            r["k"],
            r["est_q"],
            r["exact_q"],
            r["within_bin"],
        )
        for r in all_queries()["sketch_quantile_histogram"](spark, sf_dir).collect()
    }
    assert got == want
    assert all(wb for *_, wb in got.values())


def _tdiv(a: int, b: int) -> int:
    """SQL integer div (truncate toward zero) — Python // floors, which
    diverges on negative numerators."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_join_cardinality_matches_sampled_sum(spark, sf_dir):
    """Coordinated-sample join-size estimate vs dict count maps: exact
    pair sum, the 1/16 hash-gated sample, x16 scale, truncating-division
    basis-point error."""
    from tmdb_movie_data_pipeline_spark.operators.sketches import (
        _JC_CUT,
        _JC_SCALE,
    )

    ca: dict[int, int] = defaultdict(int)
    cb: dict[int, int] = defaultdict(int)
    for (k,) in _raw(
        sf_dir, "SELECT o_orderkey FROM read_parquet('{D}/orders.parquet')"
    ):
        ca[k] += 1
    for (k,) in _raw(
        sf_dir, "SELECT l_orderkey FROM read_parquet('{D}/lineitem.parquet')"
    ):
        cb[k] += 1
    shared = set(ca) & set(cb)
    exact = sum(ca[k] * cb[k] for k in shared)
    sampled = [k for k in shared if _md5_60(str(k)) < _JC_CUT]
    sampled_pairs = sum(ca[k] * cb[k] for k in sampled)
    est = sampled_pairs * _JC_SCALE
    err_bp = _tdiv((est - exact) * 10000, exact) if exact else None
    [r] = all_queries()["sketch_join_cardinality"](spark, sf_dir).collect()
    assert (r["exact_pairs"], r["sampled_keys"], r["est_pairs"], r["err_bp"]) == (
        exact,
        len(sampled),
        est,
        err_bp,
    )


def test_bloom_membership_matches_bitmap_walk(spark, sf_dir):
    """Bloom FPR vs a literal int-bitmap rebuild: 3 disjoint md5 hex
    slices per key, 63-bit words, 1000 disjoint probe keys, all-bits-set
    = certain false positive."""
    import hashlib

    from tmdb_movie_data_pipeline_spark.operators.sketches import (
        _BF_BITS,
        _BF_K,
        _BF_PROBE_BASE,
        _BF_PROBES,
    )

    def positions(key: int) -> list[int]:
        hx = hashlib.md5(str(key).encode()).hexdigest()
        return [int(hx[10 * i : 10 * i + 10], 16) % _BF_BITS for i in range(_BF_K)]

    members = {
        u
        for (u,) in _raw(
            sf_dir, "SELECT DISTINCT user_id FROM read_parquet('{D}/events.parquet')"
        )
    }
    words: dict[int, int] = defaultdict(int)
    for m in members:
        for pos in positions(m):
            words[pos // 63] |= 1 << (pos % 63)
    nfp = 0
    for pk in range(_BF_PROBE_BASE, _BF_PROBE_BASE + _BF_PROBES):
        hits = sum(
            1
            for pos in positions(pk)
            if pos // 63 in words and words[pos // 63] & (1 << (pos % 63))
        )
        nfp += hits == _BF_K
    [r] = all_queries()["sketch_bloom_membership"](spark, sf_dir).collect()
    assert (r["n_members"], r["n_probes"], r["n_false_pos"], r["fpr_ppm"]) == (
        len(members),
        _BF_PROBES,
        nfp,
        (1_000_000 * nfp) // _BF_PROBES,
    )


def test_ams_f2_matches_sign_sum_walk(spark, sf_dir):
    """AMS F2 vs a literal signed-sum walk: per-user counts, the salted
    parity sign, one integer per row, est = X_j^2, exact ppm error."""
    from tmdb_movie_data_pipeline_spark.operators.sketches import _AMS_ROWS

    cnt: dict[int, int] = defaultdict(int)
    for (u,) in _raw(
        sf_dir, "SELECT user_id FROM read_parquet('{D}/events.parquet')"
    ):
        cnt[u] += 1
    exact_f2 = sum(c * c for c in cnt.values())
    want = {}
    for j in range(_AMS_ROWS):
        ss = sum(
            c if _md5_60(f"{j}_{u}") % 2 == 0 else -c for u, c in cnt.items()
        )
        want[j] = (ss, ss * ss, exact_f2, (1_000_000 * abs(ss * ss - exact_f2)) // exact_f2)
    got = {
        r["j"]: (r["sketch_sum"], r["est_f2"], r["exact_f2"], r["err_ppm"])
        for r in all_queries()["sketch_ams_f2"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 3: the rest of the ANN ladder — every tier vs literal Python walks
# (left-assoc float loops; the ladder's tie orders and shortlist algebra)
# --------------------------------------------------------------------------


def _cos_py(emb, norms, a: int, b: int) -> float:
    return _dot_py(emb[a], emb[b]) / (norms[a] * norms[b])


def _rank_topk(scored: dict[int, float], k: int):
    """(neighbor -> cosine) -> [(neighbor, cosine, rank)] under the
    (cosine desc, neighbor asc) total order."""
    order = sorted(scored, key=lambda n: (-scored[n], n))[:k]
    return [(n, scored[n], r) for r, n in enumerate(order, start=1)]


def test_ann_cosine_topk_matches_python_walk(spark, sf_dir):
    """The exact tier: brute-force cosine top-k per query."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )

    emb = _embeddings(sf_dir)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}
    want = {}
    for q in range(N_QUERIES):
        scored = {v: _cos_py(emb, norms, q, v) for v in emb if v != q}
        for n, cos, r in _rank_topk(scored, TOP_K):
            want[(q, n)] = (cos, r)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["cosine"], r["rank"])
        for r in all_queries()["ann_cosine_topk"](spark, sf_dir).collect()
    }
    assert got == want


def test_ann_lsh_bucketed_matches_sign_projection_walk(spark, sf_dir):
    """Sign-random-projection LSH: the fixed md5-derived +-1 matrix
    rebuilt with hashlib, per-vector 8-bit bucket strings, exact cosine
    only within the query's bucket."""
    import hashlib

    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        DIM,
        N_PLANES,
        N_QUERIES,
        TOP_K,
    )

    signs = {
        (p, i): 1 if int(hashlib.md5(f"{p}_{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
        for p in range(N_PLANES)
        for i in range(DIM)
    }
    emb = _embeddings(sf_dir)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}

    def bucket(e):
        bits = []
        for p in range(N_PLANES):
            d = signs[(p, 0)] * e[0]
            for i in range(1, DIM):
                d = d + e[i] if signs[(p, i)] > 0 else d - e[i]
            bits.append("1" if d >= 0 else "0")
        return "".join(bits)

    buckets = {v: bucket(e) for v, e in emb.items()}
    want = {}
    for q in range(N_QUERIES):
        cand = [v for v in emb if v != q and buckets[v] == buckets[q]]
        scored = {v: _cos_py(emb, norms, q, v) for v in cand}
        for n, cos, r in _rank_topk(scored, TOP_K):
            want[(q, n)] = (cos, r)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["cosine"], r["rank"])
        for r in all_queries()["ann_lsh_bucketed"](spark, sf_dir).collect()
    }
    assert got == want


def test_ann_truncated_rerank_matches_shortlist_walk(spark, sf_dir):
    """Matryoshka two-stage retrieval: prefix-16 cosine shortlists 32
    candidates, the full 64-dim rerank picks the top-k — both stages'
    tie orders rebuilt literally."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        _TR_DIM,
        _TR_SHORTLIST,
        N_QUERIES,
        TOP_K,
    )

    emb = _embeddings(sf_dir)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}
    pre = {v: e[:_TR_DIM] for v, e in emb.items()}
    pnorm = {v: math.sqrt(_dot_py(p, p)) for v, p in pre.items()}
    want = {}
    for q in range(N_QUERIES):
        coarse = {
            v: _dot_py(pre[q], pre[v]) / (pnorm[q] * pnorm[v])
            for v in emb
            if v != q
        }
        short = sorted(coarse, key=lambda n: (-coarse[n], n))[:_TR_SHORTLIST]
        rer = {v: _cos_py(emb, norms, q, v) for v in short}
        for n, cos, r in _rank_topk(rer, TOP_K):
            want[(q, n)] = (cos, r)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["cosine"], r["rank"])
        for r in all_queries()["ann_truncated_rerank"](spark, sf_dir).collect()
    }
    assert got == want


def test_ann_ivf_topk_matches_route_walk(spark, sf_dir):
    """IVF-Flat: the Python routing from batch 1 supplies assignment and
    probes; candidates in the probed lists are scored with exact cosine."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        CENTROID_BASE,
        N_CENTROIDS,
        N_PROBE,
        N_QUERIES,
        TOP_K,
    )

    emb = _embeddings(sf_dir)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}
    assign, probes = _ivf_route_py(
        emb, N_CENTROIDS, CENTROID_BASE, N_PROBE, N_QUERIES
    )
    want = {}
    for q, lists in probes.items():
        probed = set(lists)
        scored = {
            v: _cos_py(emb, norms, q, v)
            for v in emb
            if v != q and assign[v] in probed
        }
        for n, cos, r in _rank_topk(scored, TOP_K):
            want[(q, n)] = (cos, r)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["cosine"], r["rank"])
        for r in all_queries()["ann_ivf_topk"](spark, sf_dir).collect()
    }
    assert got == want


def test_ann_ivf_probe_sweep_matches_recall_walk(spark, sf_dir):
    """The nprobe tuning curve: per (nprobe, query), hits = overlap of the
    probed-list top-k with the exact-cosine ground truth; also re-proves
    the nestedness monotonicity (recall never drops as nprobe grows)."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        _SWEEP_PROBES,
        CENTROID_BASE,
        N_CENTROIDS,
        N_QUERIES,
        TOP_K,
    )

    emb = _embeddings(sf_dir)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}
    assign, probes = _ivf_route_py(
        emb, N_CENTROIDS, CENTROID_BASE, max(_SWEEP_PROBES), N_QUERIES
    )
    want = {}
    for q in range(N_QUERIES):
        gt_scored = {v: _cos_py(emb, norms, q, v) for v in emb if v != q}
        gt = {n for n, _, _ in _rank_topk(gt_scored, TOP_K)}
        prev = -1
        for p in _SWEEP_PROBES:
            probed = set(probes[q][:p])
            scored = {
                v: gt_scored[v] for v in emb if v != q and assign[v] in probed
            }
            approx = {n for n, _, _ in _rank_topk(scored, TOP_K)}
            hits = len(approx & gt)
            assert hits >= prev  # nested candidate sets -> monotone recall
            prev = hits
            want[(p, q)] = (hits, (1_000_000 * hits) // TOP_K)
    got = {
        (r["nprobe"], r["query_id"]): (r["n_hits"], r["recall_ppm"])
        for r in all_queries()["ann_ivf_probe_sweep"](spark, sf_dir).collect()
    }
    assert got == want


def test_ml_knn_classify_matches_vote_walk(spark, sf_dir):
    """k-NN holdout classification: top-10 cosine neighbors vote, ties by
    (votes desc, label asc) — the vote fold rebuilt from dicts."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        _KNN_HOLDOUT_MOD,
        _KNN_HOLDOUT_REM,
        _KNN_K,
    )

    con = duckdb.connect()
    labels = {
        int(v): int(l)
        for v, l in con.execute(
            f"SELECT vec_id, label FROM read_parquet('{sf_dir}/embeddings.parquet')"
        ).fetchall()
    }
    con.close()
    emb = _embeddings(sf_dir)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}
    holdout = [v for v in emb if v % _KNN_HOLDOUT_MOD == _KNN_HOLDOUT_REM]
    corpus = [v for v in emb if v % _KNN_HOLDOUT_MOD != _KNN_HOLDOUT_REM]
    want = {}
    for q in holdout:
        scored = {v: _cos_py(emb, norms, q, v) for v in corpus}
        topk = sorted(scored, key=lambda n: (-scored[n], n))[:_KNN_K]
        votes: dict[int, int] = defaultdict(int)
        for n in topk:
            votes[labels[n]] += 1
        pred = min(votes, key=lambda lab: (-votes[lab], lab))
        want[q] = (
            labels[q],
            pred,
            votes[pred],
            1 if pred == labels[q] else 0,
        )
    got = {
        r["query_id"]: (r["true_label"], r["pred_label"], r["n_votes"], r["correct"])
        for r in all_queries()["ml_knn_classify"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 4: embedding-side quality operators — quantized-integer disciplines
# rebuilt literally (Decimal HALF_UP quantization, integer Gram products,
# the SemDeDup keep-first relation, the MMR greedy loop)
# --------------------------------------------------------------------------


def test_pq_distortion_matches_python_min_walk(spark, sf_dir):
    """Per-block codec distortion: each vector's min block distance over
    the 16-row codebook, micro-quantized then integer-aggregated; mean is
    a non-negative integer division."""
    from tmdb_movie_data_pipeline_spark.operators.pq import (
        _CB_BASE,
        PQ_DSUB,
        PQ_K,
        PQ_M,
    )

    emb = _embeddings(sf_dir)
    cb = {cid: emb[_CB_BASE + cid] for cid in range(PQ_K)}
    per_block: dict[int, list[int]] = defaultdict(list)
    for e in emb.values():
        for b in range(PQ_M):
            per_block[b].append(
                _micro(min(_block_dist_py(e, cb[cid], b, PQ_DSUB) for cid in range(PQ_K)))
            )
    want = {
        b: (len(ds), sum(ds), sum(ds) // len(ds), max(ds))
        for b, ds in per_block.items()
    }
    got = {
        r["block"]: (
            r["n_vecs"],
            r["total_dist_micro"],
            r["mean_dist_micro"],
            r["max_dist_micro"],
        )
        for r in all_queries()["ml_pq_distortion"](spark, sf_dir).collect()
    }
    assert got == want


def _q_half_away(x: float, scale: int) -> int:
    """CAST(ROUND(x * scale) AS BIGINT) incl. negatives: Decimal HALF_UP is
    round-half-away-from-zero, Spark's ROUND rule."""
    return int(Decimal(x * scale).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def test_embedding_gram_matches_integer_products(spark, sf_dir):
    """X^T X upper triangle vs literal integer accumulation over quantized
    components; the double column is exact IEEE scaling by 2^-20."""
    emb = _embeddings(sf_dir)
    qv = {v: [_q_half_away(x, 1024) for x in e] for v, e in emb.items()}
    want = {}
    for i in range(64):
        for j in range(i, 64):
            s = sum(q[i] * q[j] for q in qv.values())
            want[(i, j)] = (s, float(s) / 1048576)
    got = {
        (r["i"], r["j"]): (r["gram_q"], r["gram"])
        for r in all_queries()["ml_embedding_gram"](spark, sf_dir).collect()
    }
    assert got == want


def test_semantic_decontaminate_matches_ppm_walk(spark, sf_dir):
    """Embedding-space decontamination: per training vector, the floor-ppm
    max cosine against the eval slice, the lowest offending eval id, the
    leak verdict — floats quantized BEFORE the max, as the engine pins."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        _SDECON_TAU_PPM,
        N_QUERIES,
    )

    emb = _embeddings(sf_dir)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}
    evals = [v for v in emb if v < N_QUERIES]
    want = {}
    for v in emb:
        if v < N_QUERIES:
            continue
        ppm = {
            q: math.floor(1_000_000 * _cos_py(emb, norms, q, v)) for q in evals
        }
        mx = max(ppm.values())
        leaks = [q for q in evals if ppm[q] >= _SDECON_TAU_PPM]
        want[v] = (mx, min(leaks) if leaks else None, mx >= _SDECON_TAU_PPM)
    got = {
        r["vec_id"]: (r["max_cos_ppm"], r["leaked_from"], r["contaminated"])
        for r in all_queries()["llm_semantic_decontaminate"](spark, sf_dir).collect()
    }
    assert got == want


def test_semdedup_prune_matches_cluster_walk(spark, sf_dir):
    """SemDeDup keep-first: IVF clusters from the batch-1 routing walk;
    inside each cluster a member drops iff a LOWER-id member's
    integer-quantized cosine clears the threshold (zero-norm vectors
    never pair)."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        CENTROID_BASE,
        DUP_COSINE_THRESHOLD,
        DUP_QUANT_SCALE,
        N_CENTROIDS,
    )

    emb = _embeddings(sf_dir)
    assign, _ = _ivf_route_py(emb, N_CENTROIDS, CENTROID_BASE, 1, 0)
    q = {v: [_q_half_away(x, DUP_QUANT_SCALE) for x in e] for v, e in emb.items()}
    n2 = {v: sum(x * x for x in qq) for v, qq in q.items()}
    clusters: dict[int, list[int]] = defaultdict(list)
    for v, cid in assign.items():
        clusters[cid].append(v)
    want = {}
    for cid, vs in clusters.items():
        vs = sorted(vs)
        for idx, v in enumerate(vs):
            dropped = False
            if n2[v] > 0:
                for u in vs[:idx]:
                    if n2[u] == 0:
                        continue
                    cos = float(sum(a * b for a, b in zip(q[u], q[v]))) / (
                        math.sqrt(float(n2[u])) * math.sqrt(float(n2[v]))
                    )
                    if cos >= DUP_COSINE_THRESHOLD:
                        dropped = True
                        break
            want[v] = (cid, dropped)
    got = {
        r["vec_id"]: (r["cid"], r["dropped"])
        for r in all_queries()["dedup_semdedup_prune"](spark, sf_dir).collect()
    }
    assert got == want


def test_mmr_diversified_topk_matches_greedy_walk(spark, sf_dir):
    """MMR re-ranking as a literal integer greedy loop: micro-quantized
    relevance pool of 12, pairwise micro sims, argmax(rel) then
    argmax(rel - max-sim-to-selected) x3, every tie by neighbor id."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        _MMR_K,
        _MMR_POOL,
        N_QUERIES,
    )

    emb = _embeddings(sf_dir)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}
    want = {}
    for qid in range(N_QUERIES):
        rel = {
            v: _q_half_away(_cos_py(emb, norms, qid, v), 1_000_000)
            for v in emb
            if v != qid
        }
        pool = sorted(rel, key=lambda n: (-rel[n], n))[:_MMR_POOL]
        sim = {
            (a, b): _q_half_away(_cos_py(emb, norms, a, b), 1_000_000)
            for a in pool
            for b in pool
            if a != b
        }
        first = min(pool, key=lambda n: (-rel[n], n))
        selected = [first]
        want[(qid, first)] = (1, rel[first], rel[first])
        for step in range(2, _MMR_K + 1):
            remaining = [v for v in pool if v not in selected]
            score = {
                v: rel[v] - max(sim[(v, s)] for s in selected) for v in remaining
            }
            pick = min(remaining, key=lambda v: (-score[v], v))
            selected.append(pick)
            want[(qid, pick)] = (step, rel[pick], score[pick])
    got = {
        (r["query_id"], r["neighbor_id"]): (
            r["step"],
            r["rel_micro"],
            r["score_micro"],
        )
        for r in all_queries()["ml_mmr_diversified_topk"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 5: the window battery — frames, ranks, value and distribution
# functions rebuilt as literal sorted-partition walks over raw pulls
# --------------------------------------------------------------------------


def _round_dec(x, nd: int):
    """ROUND(x, nd) with Spark's HALF_UP-on-exact-decimal rule."""
    if x is None:
        return None
    return float(Decimal(x).quantize(Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP))


def test_window_topk_per_segment_matches_sort_walk(spark, sf_dir):
    want = {}
    per: dict[str, list] = defaultdict(list)
    for seg, ck, bal in _raw(
        sf_dir,
        "SELECT c_mktsegment, c_custkey, c_acctbal"
        " FROM read_parquet('{D}/customer.parquet')",
    ):
        per[seg].append((ck, float(bal)))
    for seg, rows in per.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        for rk, (ck, bal) in enumerate(rows[:3], start=1):
            want[(seg, ck)] = (_round_dec(bal, 2), rk)
    got = {
        (r["c_mktsegment"], r["c_custkey"]): (r["acctbal"], r["rk"])
        for r in all_queries()["window_topk_per_segment"](spark, sf_dir).collect()
    }
    assert got == want


def test_window_running_totals_matches_cumsum_walk(spark, sf_dir):
    """Quantized running sum + row_number + lag/lead per customer, ordered
    (orderdate, orderkey) — a literal per-partition fold."""
    per: dict[int, list] = defaultdict(list)
    for ck, ok, d, p in _raw(
        sf_dir,
        "SELECT o_custkey, o_orderkey, CAST(o_orderdate AS VARCHAR), o_totalprice"
        " FROM read_parquet('{D}/orders.parquet') WHERE o_custkey % 10 = 0",
    ):
        per[ck].append((d, ok, float(p)))
    want = {}
    for ck, rows in per.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        run = 0
        for seq, (_, ok, p) in enumerate(rows, start=1):
            run += _q_half_away(p, 100)
            prev = rows[seq - 2][2] if seq >= 2 else None
            nxt = rows[seq][2] if seq < len(rows) else None
            want[(ck, ok)] = (
                float(run) / 100.0,
                seq,
                _round_dec(prev, 2),
                _round_dec(nxt, 2),
            )
    got = {
        (r["o_custkey"], r["o_orderkey"]): (
            r["running_spend"],
            r["order_seq"],
            r["prev_price"],
            r["next_price"],
        )
        for r in all_queries()["window_running_totals"](spark, sf_dir).collect()
    }
    assert got == want


def test_window_rank_ntile_matches_tile_arithmetic(spark, sf_dir):
    """rank / dense_rank / ntile(4) on the supplier dim: fully tie-broken
    orders make rank a position; ntile sizes are the ceil/floor split."""
    rows = [
        (sk, nm, nk, float(b))
        for sk, nm, nk, b in _raw(
            sf_dir,
            "SELECT s_suppkey, s_name, s_nationkey, s_acctbal"
            " FROM read_parquet('{D}/supplier.parquet')",
        )
    ]
    n = len(rows)
    by_bal = sorted(rows, key=lambda t: (-t[3], t[0]))
    by_nat = sorted(rows, key=lambda t: (t[2], t[0]))
    size, rem = n // 4, n % 4
    tile_of = []
    for t in range(1, 5):
        tile_of += [t] * (size + (1 if t <= rem else 0))
    want = {}
    for pos, (sk, nm, _, _) in enumerate(by_bal):
        want[sk] = [nm, pos + 1, None, tile_of[pos]]
    for pos, (sk, *_), in enumerate(by_nat):
        want[sk][2] = pos + 1
    got = {
        r["s_suppkey"]: [r["s_name"], r["bal_rank"], r["nation_seq"], r["quartile"]]
        for r in all_queries()["window_rank_ntile"](spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in want.items()}


def test_window_frame_moving_avg_matches_rows_frame_walk(spark, sf_dir):
    """ROWS BETWEEN 2 PRECEDING AND CURRENT ROW: the 3-row moving average
    of quantized cents, two IEEE divisions in the engines' order."""
    per: dict[int, list] = defaultdict(list)
    for sk, ok, ln, d, p in _raw(
        sf_dir,
        "SELECT l_suppkey, l_orderkey, l_linenumber, CAST(l_shipdate AS VARCHAR),"
        " l_extendedprice FROM read_parquet('{D}/lineitem.parquet')"
        " WHERE l_suppkey <= 5",
    ):
        per[sk].append((d, ok, ln, _q_half_away(float(p), 100)))
    want = {}
    for sk, rows in per.items():
        rows.sort(key=lambda t: (t[0], t[1], t[2]))
        for i, (_, ok, ln, _) in enumerate(rows):
            frame = rows[max(0, i - 2) : i + 1]
            s = sum(c for *_, c in frame)
            want[(sk, ok, ln)] = (float(s) / float(len(frame))) / 100.0
    got = {
        (r["l_suppkey"], r["l_orderkey"], r["l_linenumber"]): r["moving_avg_price"]
        for r in all_queries()["window_frame_moving_avg"](spark, sf_dir).collect()
    }
    assert got == want


def test_window_range_frame_matches_value_scan(spark, sf_dir):
    """Numeric RANGE frame: peers within +-500 of the current balance —
    counted by VALUE against IEEE bounds, not by physical position."""
    rows = [
        (sk, float(b))
        for sk, b in _raw(
            sf_dir,
            "SELECT s_suppkey, s_acctbal FROM read_parquet('{D}/supplier.parquet')",
        )
    ]
    want = {
        sk: (
            _round_dec(b, 2),
            sum(1 for _, y in rows if b - 500 <= y <= b + 500),
        )
        for sk, b in rows
    }
    got = {
        r["s_suppkey"]: (r["acctbal"], r["peers_within_500"])
        for r in all_queries()["window_range_frame"](spark, sf_dir).collect()
    }
    assert got == want


def test_window_value_functions_match_partition_walk(spark, sf_dir):
    """first/last/nth_value + percent_rank/cume_dist per segment under the
    fully tie-broken (balance desc, key) order."""
    per: dict[str, list] = defaultdict(list)
    for seg, ck, b in _raw(
        sf_dir,
        "SELECT c_mktsegment, c_custkey, c_acctbal"
        " FROM read_parquet('{D}/customer.parquet') WHERE c_custkey % 10 = 0",
    ):
        per[seg].append((ck, float(b)))
    want = {}
    for seg, rows in per.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        n = len(rows)
        richest = rows[0][1]
        poorest = rows[-1][1]
        second = rows[1][1] if n >= 2 else None
        for pos, (ck, _) in enumerate(rows, start=1):
            pr = 0.0 if n == 1 else (pos - 1) / (n - 1)
            want[(seg, ck)] = (
                _round_dec(richest, 2),
                _round_dec(poorest, 2),
                _round_dec(second, 2),
                _round_dec(pr, 9),
                _round_dec(pos / n, 9),
            )
    got = {
        (r["c_mktsegment"], r["c_custkey"]): (
            r["seg_richest"],
            r["seg_poorest"],
            r["seg_second"],
            r["pct_rank"],
            r["cume"],
        )
        for r in all_queries()["window_value_functions"](spark, sf_dir).collect()
    }
    assert got == want


def test_window_time_range_frame_matches_micros_scan(spark, sf_dir):
    """Temporal RANGE frame: trailing 1h of quantized cents per user,
    bounded by EVENT TIME in epoch micros (ties share a frame)."""
    per: dict[int, list] = defaultdict(list)
    for uid, eid, us, v in _raw(
        sf_dir,
        "SELECT user_id, event_id, epoch_us(ts), value"
        " FROM read_parquet('{D}/events.parquet')",
    ):
        per[uid].append((int(us), eid, _q_half_away(float(v), 100)))
    want = {}
    for uid, rows in per.items():
        for us, eid, _ in rows:
            want[(uid, eid)] = sum(
                c for t, _, c in rows if us - 3_600_000_000 <= t <= us
            )
    got = {
        (r["user_id"], r["event_id"]): r["trailing_1h_cents"]
        for r in all_queries()["window_time_range_frame"](spark, sf_dir).collect()
    }
    assert got == want


def test_window_dist_functions_match_ppm_walk(spark, sf_dir):
    """PERCENT_RANK / CUME_DIST per nation in exact ppm, ordered by
    (cent balance desc, key): (pos-1)/(n-1) and pos/n on plain ints."""
    per: dict[int, list] = defaultdict(list)
    for sk, nk, b in _raw(
        sf_dir,
        "SELECT s_suppkey, s_nationkey, s_acctbal"
        " FROM read_parquet('{D}/supplier.parquet')",
    ):
        per[nk].append((sk, _q_half_away(float(b), 100)))
    want = {}
    for nk, rows in per.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        n = len(rows)
        for pos, (sk, _) in enumerate(rows, start=1):
            # the engines compute 1e6 * (ratio): keep that association
            pr = 0.0 if n == 1 else 1_000_000 * ((pos - 1) / (n - 1))
            want[sk] = (
                nk,
                _q_half_away(pr, 1),
                _q_half_away(1_000_000 * (pos / n), 1),
            )
    got = {
        r["s_suppkey"]: (r["nation"], r["pct_rank_ppm"], r["cume_dist_ppm"])
        for r in all_queries()["window_dist_functions"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 6: LLM-prep string operators — normalization, n-gram, regex, and
# funnel algebra rebuilt with Python str/re/hashlib
# --------------------------------------------------------------------------

import re as _re


def _norm_py(text: str) -> str:
    """lower(trim(regexp_replace(text, '\\s+', ' '))) — ASCII \\s, the
    engines' regex class."""
    return _re.sub(r"\s+", " ", text, flags=_re.ASCII).strip(" ").lower()


def _toks_py(text: str) -> list[str]:
    return _norm_py(text).split(" ")


def _docs(sf_dir: str):
    return _raw(
        sf_dir,
        "SELECT doc_id, text, lang FROM read_parquet('{D}/documents.parquet')",
    )


def test_text_lang_id_matches_marker_walk(spark, sf_dir):
    """Marker-word language ID: per-language token counts + the fixed
    argmax precedence (en >= es >= de, all-zero -> unknown)."""
    from tmdb_movie_data_pipeline_spark.operators.text import LANG_MARKERS

    want = {}
    for did, text, lang in _docs(sf_dir):
        toks = _toks_py(text)
        s = {
            lg: sum(1 for t in toks if t in set(ms))
            for lg, ms in LANG_MARKERS.items()
        }
        if s["en"] == 0 and s["es"] == 0 and s["de"] == 0:
            pred = "unknown"
        elif s["en"] >= s["es"] and s["en"] >= s["de"]:
            pred = "en"
        elif s["es"] >= s["de"]:
            pred = "es"
        else:
            pred = "de"
        want[did] = (lang, s["en"], s["es"], s["de"], pred)
    got = {
        r["doc_id"]: (
            r["labeled_lang"],
            r["s_en"],
            r["s_es"],
            r["s_de"],
            r["predicted_lang"],
        )
        for r in all_queries()["text_lang_id"](spark, sf_dir).collect()
    }
    assert got == want


def test_text_token_count_matches_three_counters(spark, sf_dir):
    """Whitespace split, the [a-z]+|[0-9]+ pre-tokenizer, and the chars/4
    BPE budget — three counters from str/re."""
    want = {}
    for did, text, _ in _docs(sf_dir):
        want[did] = (
            len(_toks_py(text)),
            len(_re.findall(r"[a-z]+|[0-9]+", text.lower())),
            math.ceil(len(text) / 4.0),
        )
    got = {
        r["doc_id"]: (r["ws_tokens"], r["word_tokens"], r["approx_bpe_tokens"])
        for r in all_queries()["text_token_count"](spark, sf_dir).collect()
    }
    assert got == want


def test_llm_pii_scrub_matches_re_chain(spark, sf_dir):
    """The email -> phone -> long-number redaction chain replayed with
    Python re in the same order; the md5 pins the exact rewrite."""
    import hashlib

    want = {}
    for did, text, _ in _docs(sf_dir):
        s = _re.sub(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>", text)
        s = _re.sub(r"\d{3}[-. ]\d{3,4}[-. ]\d{4}", "<PHONE>", s)
        s = _re.sub(r"\d{6,}", "<NUM>", s)
        want[did] = (
            hashlib.md5(s.encode()).hexdigest(),
            sum(c.isdigit() and c.isascii() for c in text),
        )
    got = {
        r["doc_id"]: (r["scrubbed_md5"], r["n_digits"])
        for r in all_queries()["llm_pii_scrub"](spark, sf_dir).collect()
    }
    assert got == want


def _grams_py(toks: list[str], k: int) -> list[str]:
    """slice(toks, i, k) semantics: 1-based start, shorter tail slices
    allowed, always >= 1 gram."""
    n = len(toks)
    return [
        " ".join(toks[i : i + k]) for i in range(max(n - k + 1, 1))
    ]


def test_llm_decontaminate_matches_gram_overlap(spark, sf_dir):
    """8-gram decontamination: benchmark gram set from doc_id < 5, per
    corpus doc the count of DISTINCT overlapping grams; docs with zero
    overlap are absent."""
    from tmdb_movie_data_pipeline_spark.operators.llm_prep import _DECON_NGRAM

    bench: set[str] = set()
    corpus = []
    for did, text, _ in _docs(sf_dir):
        toks = _toks_py(text)
        if did < 5:
            bench |= set(_grams_py(toks, _DECON_NGRAM))
        else:
            corpus.append((did, toks))
    want = {}
    for did, toks in corpus:
        hit = set(_grams_py(toks, _DECON_NGRAM)) & bench
        if hit:
            want[did] = len(hit)
    got = {
        r["doc_id"]: r["n_contaminated_grams"]
        for r in all_queries()["llm_decontaminate"](spark, sf_dir).collect()
    }
    assert got == want


def test_good_turing_matches_bigram_type_walk(spark, sf_dir):
    """Good-Turing missing mass per language over bigram types: N, V, N1,
    N2 from nested dicts, the two truncating ppm rationals, the N1=0
    degenerate."""
    types: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for _, text, lang in _docs(sf_dir):
        toks = _toks_py(text)
        if len(toks) < 2:
            continue
        for i in range(len(toks) - 1):
            types[lang][f"{toks[i]} {toks[i + 1]}"] += 1
    want = {}
    for lang, tc in types.items():
        n = sum(tc.values())
        v = len(tc)
        n1 = sum(1 for r in tc.values() if r == 1)
        n2 = sum(1 for r in tc.values() if r == 2)
        want[lang] = (
            n,
            v,
            n1,
            n2,
            (1_000_000 * n1) // n,
            0 if n1 == 0 else (2_000_000 * n2) // n1,
        )
    got = {
        r["lang"]: (
            r["n_tokens"],
            r["n_types"],
            r["n_singletons"],
            r["n_doubletons"],
            r["missing_mass_ppm"],
            r["r1_star_ppm"],
        )
        for r in all_queries()["llm_good_turing_missing_mass"](spark, sf_dir).collect()
    }
    assert got == want


def _funnel_survivors(spark, sf_dir):
    """The prepare-corpus funnel in plain Python: quality gate, md5
    keep-first, LSH-loser drop (the pair relation from the engine's staged
    build, whose construction carries its own hashlib rebuild)."""
    import hashlib

    from tmdb_movie_data_pipeline_spark.operators.dedup import lsh_pairs_staged

    stop = {"the", "a", "and", "of", "is", "to", "in"}
    quality = {}
    for did, text, lang in _docs(sf_dir):
        toks = _toks_py(text)
        n = len(toks)
        ratio = sum(1 for t in toks if t in stop) / float(n) if n else None
        if 20 <= n <= 1000 and ratio is not None and ratio >= 0.01:
            quality[did] = (lang, n, hashlib.md5(_norm_py(text).encode()).hexdigest())
    keep_by_hash: dict[str, int] = {}
    for did in sorted(quality):
        h = quality[did][2]
        keep_by_hash.setdefault(h, did)
    kept = set(keep_by_hash.values())
    losers = {int(r["doc_b"]) for r in lsh_pairs_staged(spark, sf_dir).collect()}
    return {
        did: quality[did][:2] for did in kept if did not in losers
    }


def test_llm_prepare_corpus_matches_funnel_walk(spark, sf_dir):
    want = {
        did: (lang, n) for did, (lang, n) in _funnel_survivors(spark, sf_dir).items()
    }
    got = {
        r["doc_id"]: (r["lang"], r["ws_tokens"])
        for r in all_queries()["llm_prepare_corpus"](spark, sf_dir).collect()
    }
    assert got == want


def test_llm_corpus_stats_match_funnel_rollup(spark, sf_dir):
    """The per-language token-budget report folded from the same Python
    funnel: docs, total/min/max whitespace tokens."""
    per: dict[str, list[int]] = defaultdict(list)
    for _, (lang, n) in _funnel_survivors(spark, sf_dir).items():
        per[lang].append(n)
    want = {
        lang: (len(ns), sum(ns), min(ns), max(ns)) for lang, ns in per.items()
    }
    got = {
        r["lang"]: (r["n_docs"], r["total_tokens"], r["min_tokens"], r["max_tokens"])
        for r in all_queries()["llm_corpus_stats"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 7: the profiling shelf — audits and advisors vs dict rollups
# --------------------------------------------------------------------------


def test_profile_table_stats_match_dict_rollup(spark, sf_dir):
    """Lineitem column profile: nulls / exact distincts / string-cast
    extremes per audited column, from raw typed pulls."""
    rows = _raw(
        sf_dir,
        "SELECT CAST(l_orderkey AS BIGINT), CAST(l_quantity AS BIGINT),"
        " l_returnflag, CAST(CAST(l_shipdate AS DATE) AS VARCHAR)"
        " FROM read_parquet('{D}/lineitem.parquet')",
    )
    cols = list(zip(*rows))
    names = ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"]
    want = {}
    for name, vals in zip(names, cols):
        nn = [v for v in vals if v is not None]
        want[name] = (
            len(vals),
            len(vals) - len(nn),
            len(set(nn)),
            str(min(nn)),
            str(max(nn)),
        )
    got = {
        r["column"]: (
            r["n_rows"],
            r["n_null"],
            r["n_distinct"],
            r["min_value"],
            r["max_value"],
        )
        for r in all_queries()["profile_table_stats"](spark, sf_dir).collect()
    }
    assert got == want


def test_profile_column_stats_match_canonical_strings(spark, sf_dir):
    """Orders profile through the canonical string projection: min/max are
    LEXICOGRAPHIC over the canonical form (ints as strings — '9' > '10'),
    which this rebuild exercises deliberately."""
    rows = _raw(
        sf_dir,
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,"
        " CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_totalprice"
        " FROM read_parquet('{D}/orders.parquet')",
    )
    proj = {
        "o_orderkey": [str(r[0]) for r in rows],
        "o_custkey": [str(r[1]) for r in rows],
        "o_orderstatus": [r[2] for r in rows],
        "o_orderpriority": [r[3] for r in rows],
        "o_orderdate": [r[4] for r in rows],
        "o_totalprice_cents": [str(_q_half_away(float(r[5]), 100)) for r in rows],
    }
    want = {}
    for col, vals in proj.items():
        nn = [v for v in vals if v is not None]
        want[col] = (len(vals), len(vals) - len(nn), len(set(nn)), min(nn), max(nn))
    got = {
        r["col"]: (r["n_rows"], r["n_null"], r["n_distinct"], r["min_val"], r["max_val"])
        for r in all_queries()["profile_column_stats"](spark, sf_dir).collect()
    }
    assert got == want


def test_profile_fk_integrity_matches_set_probe(spark, sf_dir):
    """Every declared FK edge: orphans = non-null child keys outside the
    (optionally predicated) parent key set — plain set membership."""
    con = duckdb.connect()

    def col(table, c, pred=None):
        where = f" WHERE {pred}" if pred else ""
        return [
            v
            for (v,) in con.execute(
                f"SELECT {c} FROM read_parquet('{sf_dir}/{table}.parquet'){where}"
            ).fetchall()
        ]

    edges = [
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey", None),
        ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey", None),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey", None),
        ("supplier.s_nationkey -> nation", "supplier", "s_nationkey", "nation", "n_nationkey", None),
        ("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey", None),
        ("orders.o_custkey -> customer[c_acctbal >= 0]", "orders", "o_custkey",
         "customer", "c_custkey", "c_acctbal >= 0"),
    ]
    want = {}
    for label, child, ckey, parent, pkey, pred in edges:
        ck = col(child, ckey)
        pk = {v for v in col(parent, pkey, pred) if v is not None}
        nn = [v for v in ck if v is not None]
        want[label] = (len(ck), sum(1 for v in nn if v not in pk), len(ck) - len(nn))
    con.close()
    got = {
        r["fk_edge"]: (r["n_child_rows"], r["n_orphans"], r["n_null_keys"])
        for r in all_queries()["profile_fk_integrity"](spark, sf_dir).collect()
    }
    assert got == want


def test_profile_join_key_skew_matches_histogram_walk(spark, sf_dir):
    """The skew advisor: per candidate key, group-size histogram ->
    max / exact p50 / p99 group sizes, top-key ppm share, and the
    cross-multiplied salt recommendation — dict counters only. The
    planted skew exhibit must flag, the organic keys must not."""
    from tmdb_movie_data_pipeline_spark.operators.profiling import (
        _SKEWP_DIM_N,
        _SKEWP_RATIO,
    )

    groups: dict[str, dict[int, int]] = {
        "lineitem.l_orderkey": defaultdict(int),
        "events.user_id": defaultdict(int),
        "skew_exhibit.k": defaultdict(int),
    }
    for (k,) in _raw(
        sf_dir, "SELECT l_orderkey FROM read_parquet('{D}/lineitem.parquet')"
    ):
        groups["lineitem.l_orderkey"][k] += 1
    for (u,) in _raw(
        sf_dir, "SELECT user_id FROM read_parquet('{D}/events.parquet')"
    ):
        groups["events.user_id"][u] += 1
    for ok, ln in _raw(
        sf_dir,
        "SELECT l_orderkey, l_linenumber FROM read_parquet('{D}/lineitem.parquet')",
    ):
        k = 0 if ln % 7 != 0 else ok % _SKEWP_DIM_N
        groups["skew_exhibit.k"][k] += 1
    want = {}
    for src, g in groups.items():
        sizes = sorted(g.values())
        n_keys, n_rows, mx = len(sizes), sum(sizes), max(sizes)

        def pctl(num, den):
            cum = 0
            hist: dict[int, int] = defaultdict(int)
            for s in sizes:
                hist[s] += 1
            for c in sorted(hist):
                cum += hist[c]
                if den * cum >= num * n_keys:
                    return c
            return None

        want[src] = (
            n_rows,
            n_keys,
            mx,
            pctl(1, 2),
            pctl(99, 100),
            (1_000_000 * mx) // n_rows,
            mx * n_keys > _SKEWP_RATIO * n_rows,
        )
    assert want["skew_exhibit.k"][6] and not want["lineitem.l_orderkey"][6]
    got = {
        r["src"]: (
            r["n_rows"],
            r["n_keys"],
            r["max_group"],
            r["p50_group"],
            r["p99_group"],
            r["top_share_ppm"],
            r["salt_recommended"],
        )
        for r in all_queries()["profile_join_key_skew"](spark, sf_dir).collect()
    }
    assert got == want


def test_profile_mode_imputation_matches_argmax_walk(spark, sf_dir):
    """Mode imputation with leak-free evaluation: the per-source mode over
    OBSERVED rows only, (count desc, label asc) argmax, and the held-back
    truth comparison for every masked row."""
    from tmdb_movie_data_pipeline_spark.operators.profiling import _IMP_MISS_MOD

    rows = _raw(
        sf_dir,
        "SELECT doc_id, source, lang FROM read_parquet('{D}/documents.parquet')",
    )
    counts: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for did, src, lang in rows:
        if did % _IMP_MISS_MOD != 0:
            counts[src][lang] += 1
    modes = {
        src: min(c, key=lambda lab: (-c[lab], lab)) for src, c in counts.items()
    }
    want = {
        did: (src, modes[src], lang, 1 if modes[src] == lang else 0)
        for did, src, lang in rows
        if did % _IMP_MISS_MOD == 0 and src in modes
    }
    got = {
        r["doc_id"]: (r["source"], r["imputed_lang"], r["true_lang"], r["correct"])
        for r in all_queries()["profile_mode_imputation"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 8: events/BI kernels — sessionization algebra, cohorts, streaks,
# funnels, attribution rebuilt as per-user timeline walks
# --------------------------------------------------------------------------


def _ev_rows(sf_dir: str):
    """(user_id, event_id, epoch_us, event_type, value) sorted pulls."""
    return [
        (int(u), int(e), int(us), t, float(v))
        for u, e, us, t, v in _raw(
            sf_dir,
            "SELECT user_id, event_id, epoch_us(ts), event_type, value"
            " FROM read_parquet('{D}/events.parquet')",
        )
    ]


def _sessions_py(rows):
    """user -> list of sessions, each a list of (us, event_id, event_type)
    under the 30-min-gap rule with the (ts, event_id) tie order."""
    from tmdb_movie_data_pipeline_spark.operators.events import SESSION_GAP_MIN

    gap = SESSION_GAP_MIN * 60 * 1_000_000
    per: dict[int, list] = defaultdict(list)
    for u, e, us, t, _ in rows:
        per[u].append((us, e, t))
    out: dict[int, list] = {}
    for u, evs in per.items():
        evs.sort()
        sessions = []
        for us, e, t in evs:
            if not sessions or us - sessions[-1][-1][0] > gap:
                sessions.append([])
            sessions[-1].append((us, e, t))
        out[u] = sessions
    return out


def test_events_sessionize_matches_gap_walk(spark, sf_dir):
    rows = _ev_rows(sf_dir)
    want = {}
    for u, sessions in _sessions_py(rows).items():
        for seq, s in enumerate(sessions, start=1):
            want[(u, seq)] = (len(s), s[0][0], s[-1][0])
    got = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"],
            r["session_start_us"],
            r["session_end_us"],
        )
        for r in all_queries()["events_sessionize"](spark, sf_dir).collect()
    }
    assert got == want


def test_events_session_funnel_matches_step_walk(spark, sf_dir):
    """view -> click -> purchase at session grain: a step counts only when
    strictly later than the previous step inside the SAME session."""
    rows = _ev_rows(sf_dir)
    n_sessions = s1 = s2 = s3 = 0
    for _, sessions in _sessions_py(rows).items():
        for s in sessions:
            n_sessions += 1
            t1 = min((us for us, _, t in s if t == "view"), default=None)
            t2 = min((us for us, _, t in s if t == "click"), default=None)
            t3 = min((us for us, _, t in s if t == "purchase"), default=None)
            if t1 is not None:
                s1 += 1
                if t2 is not None and t2 > t1:
                    s2 += 1
                    if t3 is not None and t3 > t2:
                        s3 += 1
    want = {
        1: ("view", n_sessions, s1, 1_000_000),
        2: ("click", n_sessions, s2, (1_000_000 * s2) // s1),
        3: ("purchase", n_sessions, s3, (1_000_000 * s3) // s1),
    }
    got = {
        r["step"]: (r["step_type"], r["n_sessions"], r["n_reached"], r["conv_ppm"])
        for r in all_queries()["events_session_funnel"](spark, sf_dir).collect()
    }
    assert got == want


def test_events_latest_per_user_matches_max_walk(spark, sf_dir):
    rows = _ev_rows(sf_dir)
    per: dict[int, tuple] = {}
    for u, e, us, t, v in rows:
        if u not in per or (us, e) > (per[u][0], per[u][1]):
            per[u] = (us, e, t, v)
    want = {
        u: (e, us, t, _round_dec(v, 4)) for u, (us, e, t, v) in per.items()
    }
    got = {
        r["user_id"]: (r["last_event_id"], r["last_ts_us"], r["event_type"], r["value"])
        for r in all_queries()["events_latest_per_user"](spark, sf_dir).collect()
    }
    assert got == want


def test_events_cohort_retention_matches_week_walk(spark, sf_dir):
    """First-active-week cohorts: Monday-truncated weeks from epoch
    micros, integer day-diff/7 offsets, distinct (user, week) counting."""
    from datetime import datetime, timedelta, timezone

    rows = _ev_rows(sf_dir)
    uw = set()
    for u, _, us, _, _ in rows:
        dt = datetime.fromtimestamp(us / 1_000_000, tz=timezone.utc)
        monday = (dt - timedelta(days=dt.weekday())).replace(
            hour=0, minute=0, second=0, microsecond=0
        )
        uw.add((u, int(monday.timestamp() * 1_000_000)))
    first = {}
    for u, w in uw:
        first[u] = min(first.get(u, w), w)
    want: dict[tuple[int, int], int] = defaultdict(int)
    for u, w in uw:
        want[(first[u], (w - first[u]) // (7 * 86_400_000_000))] += 1
    got = {
        (r["cohort_week_us"], r["weeks_since"]): r["n_users"]
        for r in all_queries()["events_cohort_retention"](spark, sf_dir).collect()
    }
    assert got == dict(want)


def test_events_user_streaks_matches_islands_walk(spark, sf_dir):
    """Gaps-and-islands over distinct active days, rebuilt by literally
    scanning each user's sorted day list for consecutive runs."""
    from datetime import datetime, timezone

    rows = _ev_rows(sf_dir)
    days: dict[int, set] = defaultdict(set)
    for u, _, us, _, _ in rows:
        days[u].add(
            datetime.fromtimestamp(us / 1_000_000, tz=timezone.utc).date().toordinal()
        )
    want = {}
    for u, ds in days.items():
        sd = sorted(ds)
        streaks = [1]
        for a, b in zip(sd, sd[1:]):
            if b == a + 1:
                streaks[-1] += 1
            else:
                streaks.append(1)
        want[u] = (max(streaks), len(streaks), sum(streaks))
    got = {
        r["user_id"]: (r["longest_streak"], r["n_streaks"], r["active_days"])
        for r in all_queries()["events_user_streaks"](spark, sf_dir).collect()
    }
    assert got == want


def test_events_interarrival_histogram_matches_pow2_walk(spark, sf_dir):
    """Power-of-two gap buckets per event type: floor-second gaps under
    the (ts, value) tie order, bucket = bit_length (0 for gap <= 0)."""
    per: dict[tuple[str, int], list] = defaultdict(list)
    for u, _, us, t, v in _ev_rows(sf_dir):
        per[(t, u)].append((us, v))
    want: dict[tuple[str, int], int] = defaultdict(int)
    for (t, _), evs in per.items():
        evs.sort()
        for (a, _), (b, _) in zip(evs, evs[1:]):
            gap = b // 1_000_000 - a // 1_000_000
            want[(t, 0 if gap <= 0 else gap.bit_length())] += 1
    got = {
        (r["event_type"], r["gap_bucket"]): r["n_gaps"]
        for r in all_queries()["events_interarrival_histogram"](spark, sf_dir).collect()
    }
    assert got == dict(want)


def test_events_attribution_last_touch_matches_timeline_walk(spark, sf_dir):
    """Last-touch attribution: each purchase credits the most recent
    view/click STRICTLY before it (and within the lookback window);
    otherwise 'none'. Rebuilt as a per-user ordered scan."""
    from tmdb_movie_data_pipeline_spark.operators.events import (
        _ATTR_LOOKBACK_DAYS,
        _Z_SCALE,
    )

    lookback = _ATTR_LOOKBACK_DAYS * 86_400_000_000
    per: dict[int, list] = defaultdict(list)
    for u, e, us, t, v in _ev_rows(sf_dir):
        per[u].append((us, e, t, v))
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for u, evs in per.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        touch = None  # (us, type) of last view/click so far
        for us, e, t, v in evs:
            if t == "purchase":
                ch = (
                    touch[1]
                    if touch is not None and touch[0] >= us - lookback
                    else "none"
                )
                want[ch][0] += 1
                want[ch][1] += _q_half_away(v, _Z_SCALE)
            if t in ("view", "click"):
                touch = (us, t)
    got = {
        r["channel"]: [r["n_purchases"], r["revenue_cents"]]
        for r in all_queries()["events_attribution_last_touch"](spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in want.items()}


# --------------------------------------------------------------------------
# batch 9: grouping algebra and distribution aggregates vs dict rollups
# --------------------------------------------------------------------------


def test_agg_rollup_matches_three_level_fold(spark, sf_dir):
    """ROLLUP (flag, status): leaf, per-flag subtotal, grand total — each
    level folded independently from the same raw pull (NULL = the
    rolled-up dimension)."""
    rows = [
        (f, s, _q_half_away(float(q), 100))
        for f, s, q in _raw(
            sf_dir,
            "SELECT l_returnflag, l_linestatus, l_quantity"
            " FROM read_parquet('{D}/lineitem.parquet')",
        )
    ]
    want: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for f, s, qc in rows:
        for key in ((f, s), (f, None), (None, None)):
            want[key][0] += 1
            want[key][1] += qc
    wexp = {k: (n, float(c) / 100.0) for k, (n, c) in want.items()}
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["sum_qty"])
        for r in all_queries()["agg_rollup"](spark, sf_dir).collect()
    }
    assert got == wexp


def test_agg_cube_matches_four_level_fold(spark, sf_dir):
    """CUBE (status, priority): all four grouping levels from one pull."""
    rows = [
        (st, pr, _q_half_away(float(p), 100))
        for st, pr, p in _raw(
            sf_dir,
            "SELECT o_orderstatus, o_orderpriority, o_totalprice"
            " FROM read_parquet('{D}/orders.parquet')",
        )
    ]
    want: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for st, pr, pc in rows:
        for key in ((st, pr), (st, None), (None, pr), (None, None)):
            want[key][0] += 1
            want[key][1] += pc
    wexp = {k: (n, float(c) / 100.0) for k, (n, c) in want.items()}
    got = {
        (r["o_orderstatus"], r["o_orderpriority"]): (r["n"], r["sum_price"])
        for r in all_queries()["agg_cube"](spark, sf_dir).collect()
    }
    assert got == wexp


def test_agg_grouped_median_matches_sorted_pick(spark, sf_dir):
    """Exact per-group lower median: rank (n+1)//2 in the sorted cents
    multiset — the engine's histogram-offset plan must agree with a plain
    sorted-list pick."""
    per: dict[str, list[int]] = defaultdict(list)
    for t, v in _raw(
        sf_dir, "SELECT event_type, value FROM read_parquet('{D}/events.parquet')"
    ):
        per[t].append(_q_half_away(float(v), 100))
    want = {
        t: (len(vs), sorted(vs)[(len(vs) + 1) // 2 - 1]) for t, vs in per.items()
    }
    got = {
        r["event_type"]: (r["n"], r["median_cents"])
        for r in all_queries()["agg_grouped_median"](spark, sf_dir).collect()
    }
    assert got == want


def test_agg_mode_per_group_matches_argmax(spark, sf_dir):
    """Per-segment modal order priority through the dimension join, ties
    to the lexicographically smallest priority."""
    cust = dict(
        _raw(
            sf_dir,
            "SELECT c_custkey, c_mktsegment FROM read_parquet('{D}/customer.parquet')",
        )
    )
    cnt: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for ck, pr in _raw(
        sf_dir,
        "SELECT o_custkey, o_orderpriority FROM read_parquet('{D}/orders.parquet')",
    ):
        if ck in cust:
            cnt[cust[ck]][pr] += 1
    want = {}
    for seg, c in cnt.items():
        pr = min(c, key=lambda p: (-c[p], p))
        want[seg] = (pr, c[pr])
    got = {
        r["c_mktsegment"]: (r["mode_priority"], r["n"])
        for r in all_queries()["agg_mode_per_group"](spark, sf_dir).collect()
    }
    assert got == want


def test_agg_hhi_matches_integer_formula(spark, sf_dir):
    """HHI in exact basis points over $1000-quantized per-customer
    revenue, including the overflow-guard branch choice."""
    rev: dict[int, int] = defaultdict(int)
    for ck, p in _raw(
        sf_dir, "SELECT o_custkey, o_totalprice FROM read_parquet('{D}/orders.parquet')"
    ):
        rev[ck] += _q_half_away(float(p), 100)
    rev_k = {ck: c // 100000 for ck, c in rev.items()}
    total_k = sum(rev_k.values())
    sum_sq = sum(v * v for v in rev_k.values())
    if sum_sq < 900_000_000_000_000:
        hhi = (10_000 * sum_sq) // (total_k * total_k)
    else:
        hhi = sum_sq // ((total_k * total_k) // 10_000)
    [r] = all_queries()["agg_hhi_concentration"](spark, sf_dir).collect()
    assert (r["n_cust"], r["total_k"], r["hhi_bp"]) == (len(rev_k), total_k, hhi)


def test_agg_pareto_matches_cumulative_walk(spark, sf_dir):
    """The 80% revenue head: descending cumulative cents with the
    (revenue desc, custkey) tie order; a customer is in the head while
    the revenue BEFORE them hasn't covered the threshold."""
    from tmdb_movie_data_pipeline_spark.operators.aggregates import _PARETO_PCT

    rev: dict[int, int] = defaultdict(int)
    for ck, p in _raw(
        sf_dir, "SELECT o_custkey, o_totalprice FROM read_parquet('{D}/orders.parquet')"
    ):
        rev[ck] += _q_half_away(float(p), 100)
    total = sum(rev.values())
    order = sorted(rev, key=lambda c: (-rev[c], c))
    want = {}
    cum = 0
    for rk, ck in enumerate(order, start=1):
        before = cum
        cum += rev[ck]
        if before * 100 < total * _PARETO_PCT:
            want[ck] = (rev[ck], cum, rk)
    got = {
        r["c_custkey"]: (r["revenue_cents"], r["cum_cents"], r["rk"])
        for r in all_queries()["agg_pareto_contribution"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 10: multimodal leftovers — fingerprints and closed-form media
# walks as a third independent derivation beside engine bytes + oracle SQL
# --------------------------------------------------------------------------


def test_multimodal_features_match_byte_walk(spark, sf_dir):
    import hashlib

    want = {}
    for did, text, _ in _docs(sf_dir):
        b = text.encode("utf-8")
        n = len(b)
        want[did] = (
            n,
            hashlib.md5(b).hexdigest(),
            64 + n % 512,
            64 + (n * 7) % 512,
        )
    got = {
        r["doc_id"]: (r["n_bytes"], r["payload_md5"], r["fake_width"], r["fake_height"])
        for r in all_queries()["multimodal_features"](spark, sf_dir).collect()
    }
    assert got == want


def test_multimodal_block_dedup_matches_md5_blocks(spark, sf_dir):
    """64-char block fingerprints (ASCII contract: chars == bytes), corpus
    redundancy counters, one IEEE ratio division."""
    import hashlib

    blocks = []
    for _, text, _ in _docs(sf_dir):
        for i in range((len(text) + 63) // 64):
            blocks.append(hashlib.md5(text[i * 64 : i * 64 + 64].encode()).hexdigest())
    [r] = all_queries()["multimodal_block_dedup"](spark, sf_dir).collect()
    assert (r["total_blocks"], r["distinct_blocks"]) == (len(blocks), len(set(blocks)))
    assert r["unique_ratio"] == float(len(set(blocks))) / float(len(blocks))


def test_multimodal_dhash_pairs_match_bit_walk(spark, sf_dir):
    """dHash 56-bit fingerprints from ord() comparisons over the padded
    grid, then brute-force Hamming pairs at radius 6 — proving the
    engine's banded plan has perfect recall."""
    from tmdb_movie_data_pipeline_spark.operators.multimodal import (
        _DH_COLS,
        _DH_MAX_HAMMING,
        _DH_ROWS,
    )

    hs = {}
    width = _DH_ROWS * _DH_COLS + 1
    for did, text, _ in _docs(sf_dir):
        px = (text + " " * width)[:width]
        h = 0
        for r in range(_DH_ROWS):
            for c in range(_DH_COLS - 1):
                pos = r * _DH_COLS + c  # 0-based
                if ord(px[pos]) < ord(px[pos + 1]):
                    h |= 1 << (r * (_DH_COLS - 1) + c)
        hs[did] = h
    ids = sorted(hs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(hs[a] ^ hs[b]).count("1")
            if d <= _DH_MAX_HAMMING:
                want[(a, b)] = d
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in all_queries()["multimodal_dhash_pairs"](spark, sf_dir).collect()
    }
    assert got == want


def test_multimodal_rle_matches_closed_form(spark, sf_dir):
    """RLE audit vs the synthetic block rule alone: run counts, encoded
    length, ratio ppm, run-value sum — a third derivation beside the
    engine's real container round-trip and the oracle's SQL."""
    want = {}
    for did, *_ in _docs(sf_dir):
        n_bytes = 3 * (2 + did % 7) * (2 + did % 5)
        blk = 1 + did % 4
        n_runs = (n_bytes + blk - 1) // blk
        want[did] = (
            "bmp" if did % 2 == 0 else "ppm",
            n_bytes,
            n_runs,
            2 * n_runs,
            (1_000_000 * 2 * n_runs) // n_bytes,
            sum((did * 11 + j * 13) % 256 for j in range(n_runs)),
        )
    got = {
        r["doc_id"]: (
            r["container"],
            r["n_bytes"],
            r["n_runs"],
            r["encoded_len"],
            r["ratio_ppm"],
            r["run_value_sum"],
        )
        for r in all_queries()["multimodal_rle_compression"](spark, sf_dir).collect()
    }
    assert got == want


def test_multimodal_scene_change_matches_frame_rule(spark, sf_dir):
    """Shot boundaries vs the closed-form frame rule: per-pixel absolute
    diffs (incl. the mod-256 wrap where |a-b| = 206), nonzero = change."""
    from tmdb_movie_data_pipeline_spark.operators.multimodal import _VID_PIXELS

    want = {}
    for did, *_ in _docs(sf_dir):
        n_f, seg = 4 + did % 4, 2 + did % 3
        for f in range(1, n_f):
            s = sum(
                abs(
                    (did * 7 + (f // seg) * 50 + p) % 256
                    - (did * 7 + ((f - 1) // seg) * 50 + p) % 256
                )
                for p in range(_VID_PIXELS)
            )
            want[(did, f)] = (s, s > 0)
    got = {
        (r["doc_id"], r["frame_idx"]): (r["diff_abs_sum"], r["is_change"])
        for r in all_queries()["multimodal_scene_change_detect"](spark, sf_dir).collect()
    }
    assert got == want


def test_multimodal_pcm_silence_trim_matches_sample_rule(spark, sf_dir):
    """Silence trim vs the planted sample rule: frame energies, the
    first/last loud frames, trimmed counts, kept energy."""
    from tmdb_movie_data_pipeline_spark.operators.multimodal import (
        _PCM_FRAME,
        _TRIM_FRAMES,
        _TRIM_THRESH,
    )

    want = {}
    for did, *_ in _docs(sf_dir):
        energies = []
        for f in range(_TRIM_FRAMES):
            e = 0
            for k in range(f * _PCM_FRAME, (f + 1) * _PCM_FRAME):
                quiet = f < did % 2 or f >= _TRIM_FRAMES - (did // 2) % 2
                v = (did + k) % 9 - 4 if quiet else (did * 31 + k) % 4096 - 2048
                e += v * v
            energies.append(e)
        loud = [f for f, e in enumerate(energies) if e >= _TRIM_THRESH]
        first, last = min(loud), max(loud)
        want[did] = (
            _TRIM_FRAMES,
            first,
            _TRIM_FRAMES - 1 - last,
            sum(energies[first : last + 1]),
        )
    got = {
        r["doc_id"]: (r["n_frames"], r["lead_trimmed"], r["tail_trimmed"], r["kept_energy"])
        for r in all_queries()["multimodal_pcm_silence_trim"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 11: the dedup estimator family — shingle algebra, MinHash accuracy
# contracts, IDF weighting, cluster accounting vs hashlib/dict rebuilds
# --------------------------------------------------------------------------


def _shingles_py(text: str) -> set[str]:
    """Distinct word-3-gram shingles, incl. the short-doc degenerate
    (sub-3-token docs yield their whole token join)."""
    toks = _toks_py(text)
    n = len(toks)
    if n < 3:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + 3]) for i in range(n - 2)}


def _minhash_sigs_py(sh: set[str], n: int) -> list[int]:
    import hashlib

    h12 = [
        (int(h[:15], 16), int(h[16:30], 16))
        for h in (hashlib.md5(s.encode()).hexdigest() for s in sh)
    ]
    return [min(h1 + i * h2 for h1, h2 in h12) for i in range(n)]


def _cand_pairs(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.operators.dedup import lsh_pairs_staged

    return [
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in lsh_pairs_staged(spark, sf_dir).collect()
    ]


def test_dedup_exact_matches_md5_groups(spark, sf_dir):
    import hashlib

    groups: dict[str, list[int]] = defaultdict(list)
    for did, text, _ in _docs(sf_dir):
        groups[hashlib.md5(_norm_py(text).encode()).hexdigest()].append(did)
    want = {h: (min(ds), len(ds)) for h, ds in groups.items()}
    got = {
        r["content_hash"]: (r["canonical_id"], r["dup_count"])
        for r in all_queries()["dedup_exact"](spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_ngram_jaccard_matches_set_walk(spark, sf_dir):
    """Exact 3-gram Jaccard per LSH candidate pair (zero-intersection
    candidates drop out), one IEEE int/int division, 0.0375 gate."""
    sh = {did: _shingles_py(text) for did, text, _ in _docs(sf_dir)}
    want = {}
    for a, b in _cand_pairs(spark, sf_dir):
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        j = float(inter) / float(len(sh[a]) + len(sh[b]) - inter)
        if j >= 0.0375:
            want[(a, b)] = j
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in all_queries()["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_minhash_estimate_matches_sig_walk(spark, sf_dir):
    """The MinHash accuracy contract: matching-slot fraction (ppm) next to
    the exact Jaccard, signatures rebuilt with hashlib Kirsch-Mitzenmacher
    h1 + i*h2."""
    from tmdb_movie_data_pipeline_spark.operators.dedup import NUM_HASHES

    sh = {did: _shingles_py(text) for did, text, _ in _docs(sf_dir)}
    sigs = {did: _minhash_sigs_py(s, NUM_HASHES) for did, s in sh.items()}
    want = {}
    for a, b in _cand_pairs(spark, sf_dir):
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        m = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        want[(a, b)] = (
            m,
            (1_000_000 * m) // NUM_HASHES,
            (1_000_000 * inter) // (len(sh[a]) + len(sh[b]) - inter),
        )
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_sig_match"],
            r["est_jaccard_ppm"],
            r["exact_jaccard_ppm"],
        )
        for r in all_queries()["dedup_minhash_jaccard_estimate"](spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_bbit_estimate_matches_low_bit_walk(spark, sf_dir):
    """b=1-bit MinHash: lowest-bit matches and the clamped 2f-1 estimator
    beside the exact Jaccard."""
    from tmdb_movie_data_pipeline_spark.operators.dedup import NUM_HASHES

    sh = {did: _shingles_py(text) for did, text, _ in _docs(sf_dir)}
    sigs = {did: _minhash_sigs_py(s, NUM_HASHES) for did, s in sh.items()}
    want = {}
    for a, b in _cand_pairs(spark, sf_dir):
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        m = sum(1 for x, y in zip(sigs[a], sigs[b]) if x % 2 == y % 2)
        want[(a, b)] = (
            m,
            max((2_000_000 * m) // NUM_HASHES - 1_000_000, 0),
            (1_000_000 * inter) // (len(sh[a]) + len(sh[b]) - inter),
        )
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_bit_match"],
            r["bbit_est_ppm"],
            r["exact_jaccard_ppm"],
        )
        for r in all_queries()["dedup_bbit_minhash_estimate"](spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_weighted_jaccard_matches_idf_walk(spark, sf_dir):
    """IDF-weighted Jaccard: rational weights (1e6*(N+1))//(df+1), per-doc
    and per-intersection integer sums, union weight as wa+wb-w_inter."""
    docs = _docs(sf_dir)
    sh = {did: _shingles_py(text) for did, text, _ in docs}
    n_docs = len(docs)
    df: dict[str, int] = defaultdict(int)
    for s in sh.values():
        for g in s:
            df[g] += 1
    w = {g: (1_000_000 * (n_docs + 1)) // (d + 1) for g, d in df.items()}
    w_doc = {did: sum(w[g] for g in s) for did, s in sh.items()}
    want = {}
    for a, b in _cand_pairs(spark, sf_dir):
        inter_set = sh[a] & sh[b]
        if not inter_set:
            continue
        w_inter = sum(w[g] for g in inter_set)
        want[(a, b)] = (
            len(inter_set),
            w_inter,
            w_doc[a],
            w_doc[b],
            (1_000_000 * w_inter) // (w_doc[a] + w_doc[b] - w_inter),
        )
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["inter"],
            r["w_inter"],
            r["w_a"],
            r["w_b"],
            r["wjaccard_ppm"],
        )
        for r in all_queries()["dedup_weighted_jaccard_pairs"](spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_threshold_sweep_matches_operating_points(spark, sf_dir):
    """The tau sweep over estimator-vs-truth rows: kept / true and false
    positives / candidate misses / precision ppm at every operating
    point, folded from the same Python contract rows."""
    from tmdb_movie_data_pipeline_spark.operators.dedup import (
        _SWEEP_TAUS,
        NUM_HASHES,
    )

    sh = {did: _shingles_py(text) for did, text, _ in _docs(sf_dir)}
    sigs = {did: _minhash_sigs_py(s, NUM_HASHES) for did, s in sh.items()}
    est_rows = []
    for a, b in _cand_pairs(spark, sf_dir):
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        m = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        est_rows.append(
            (
                (1_000_000 * m) // NUM_HASHES,
                (1_000_000 * inter) // (len(sh[a]) + len(sh[b]) - inter),
            )
        )
    want = {}
    for tau in _SWEEP_TAUS:
        kept = sum(1 for e, _ in est_rows if e >= tau)
        tp = sum(1 for e, x in est_rows if e >= tau and x >= tau)
        fp = sum(1 for e, x in est_rows if e >= tau and x < tau)
        miss = sum(1 for e, x in est_rows if e < tau and x >= tau)
        prec = 1_000_000 if kept == 0 else (1_000_000 * tp) // kept
        want[tau] = (kept, tp, fp, miss, prec)
    got = {
        r["tau_ppm"]: (
            r["kept"],
            r["true_pos"],
            r["false_pos"],
            r["missed_in_candidates"],
            r["precision_ppm"],
        )
        for r in all_queries()["dedup_threshold_sweep"](spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_cluster_stats_match_component_walk(spark, sf_dir):
    """Per-cluster accounting over the LSH pair graph: BFS components,
    min-id cluster labels, size and keep-canonical removal counts."""
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in _cand_pairs(spark, sf_dir):
        adj[a].add(b)
        adj[b].add(a)
    seen: set[int] = set()
    want = {}
    for v in adj:
        if v in seen:
            continue
        comp = {v}
        frontier = {v}
        while frontier:
            frontier = {u for x in frontier for u in adj[x]} - comp
            comp |= frontier
        seen |= comp
        want[min(comp)] = (len(comp), len(comp) - 1)
    got = {
        r["component_id"]: (r["n_docs"], r["n_removed"])
        for r in all_queries()["dedup_cluster_stats"](spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_chunk_dupshare_matches_chunk_walk(spark, sf_dir):
    """C4-style duplicated-chunk share: non-overlapping 8-word chunks,
    cross-document frequency, per-doc ppm share (within-doc repeats of a
    single-doc chunk are NOT dups)."""
    from tmdb_movie_data_pipeline_spark.operators.dedup import _CHUNK_W

    per_doc: dict[int, list[str]] = {}
    chunk_docs: dict[str, set[int]] = defaultdict(set)
    for did, text, _ in _docs(sf_dir):
        toks = _toks_py(text)
        chunks = [
            " ".join(toks[_CHUNK_W * i : _CHUNK_W * i + _CHUNK_W])
            for i in range(len(toks) // _CHUNK_W)
        ]
        if chunks:
            per_doc[did] = chunks
            for c in chunks:
                chunk_docs[c].add(did)
    want = {}
    for did, chunks in per_doc.items():
        dup = sum(1 for c in chunks if len(chunk_docs[c]) > 1)
        want[did] = (len(chunks), dup, (1_000_000 * dup) // len(chunks))
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["dup_share_ppm"])
        for r in all_queries()["dedup_chunk_dupshare"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 12: the join menu — asof variants, intervals, skyline, lateral,
# null semantics, division vs brute-force Python walks
# --------------------------------------------------------------------------


def test_join_asof_nearest_matches_two_sided_walk(spark, sf_dir):
    """Nearest-purchase asof: per user, prev/next purchase around every
    view under the (t, event_id) order, tie to backward."""
    per: dict[int, list] = defaultdict(list)
    for u, e, us, t, _ in _ev_rows(sf_dir):
        if t in ("view", "purchase"):
            per[u].append((us, e, t))
    want = {}
    for u, evs in per.items():
        evs.sort()
        p_times = [us for us, _, t in evs if t == "purchase"]
        prev = None
        nxt_idx = 0  # purchases strictly after current row position
        n_purch_seen = 0
        for us, e, t in evs:
            if t == "purchase":
                n_purch_seen += 1
                prev = us
                continue
            nxt = p_times[n_purch_seen] if n_purch_seen < len(p_times) else None
            if prev is None and nxt is None:
                continue
            if nxt is None:
                best = prev
            elif prev is None:
                best = nxt
            else:
                best = prev if us - prev <= nxt - us else nxt
            want[e] = (u, us, best)
    got = {
        r["event_id"]: (r["user_id"], r["view_us"], r["nearest_purchase_us"])
        for r in all_queries()["join_asof_nearest"](spark, sf_dir).collect()
    }
    assert got == want


def test_join_asof_tolerance_matches_staleness_walk(spark, sf_dir):
    """Bounded asof: the most recent purchase, surfaced only within the
    1-hour freshness tolerance, NULL-with-flag otherwise."""
    from tmdb_movie_data_pipeline_spark.operators.joins import _ASOF_TOL_US

    per: dict[int, list] = defaultdict(list)
    for u, e, us, t, _ in _ev_rows(sf_dir):
        if t in ("view", "purchase"):
            per[u].append((us, e, t))
    want = {}
    for u, evs in per.items():
        evs.sort()
        prev = None
        for us, e, t in evs:
            if t == "purchase":
                prev = us
                continue
            if prev is None:
                continue
            fresh = us - prev <= _ASOF_TOL_US
            want[e] = (u, us, prev if fresh else None, fresh)
    got = {
        r["event_id"]: (r["user_id"], r["view_us"], r["fresh_purchase_us"], r["is_fresh"])
        for r in all_queries()["join_asof_tolerance"](spark, sf_dir).collect()
    }
    assert got == want


def test_join_skyline_matches_dominance_scan(spark, sf_dir):
    """2-D Pareto frontier by literal O(n^2) strict-dominance checks —
    the engine's one-pass sweep must produce the identical set."""
    pts = {
        pk: (_q_half_away(float(p), 100), int(s))
        for pk, p, s in _raw(
            sf_dir,
            "SELECT p_partkey, p_retailprice, p_size FROM read_parquet('{D}/part.parquet')",
        )
    }
    want = {
        pk: v
        for pk, v in pts.items()
        if not any(q[0] < v[0] and q[1] < v[1] for q in pts.values())
    }
    got = {
        r["p_partkey"]: (r["price_cents"], r["size"])
        for r in all_queries()["join_skyline_pareto"](spark, sf_dir).collect()
    }
    assert got == want


def test_join_interval_overlap_matches_session_pairs(spark, sf_dir):
    """Session-interval overlap across the even/odd user split: counts and
    total overlapping micros per user pair, from the shared Python
    session builder."""
    rows = _ev_rows(sf_dir)
    iv: dict[int, list] = defaultdict(list)
    for u, sessions in _sessions_py(rows).items():
        for s in sessions:
            iv[u].append((s[0][0], s[-1][0]))
    a = [(u, s, e) for u, ivs in iv.items() if u % 2 == 0 for s, e in ivs]
    b = [(u, s, e) for u, ivs in iv.items() if u % 2 == 1 for s, e in ivs]
    want: dict[tuple[int, int], list[int]] = defaultdict(lambda: [0, 0])
    for ua, sa, ea in a:
        for ub, sb, eb in b:
            if sa <= eb and sb <= ea:
                want[(ua, ub)][0] += 1
                want[(ua, ub)][1] += min(ea, eb) - max(sa, sb)
    got = {
        (r["a_user"], r["b_user"]): [r["n_overlaps"], r["total_overlap_us"]]
        for r in all_queries()["join_interval_overlap"](spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in want.items()}


def test_join_lateral_topn_matches_per_key_sort(spark, sf_dir):
    """Correlated LATERAL top-2: per sampled customer, the two priciest
    orders under the (price desc, orderkey) order."""
    per: dict[int, list] = defaultdict(list)
    for ck, ok, p in _raw(
        sf_dir,
        "SELECT o_custkey, o_orderkey, o_totalprice FROM read_parquet('{D}/orders.parquet')",
    ):
        if ck % 50 == 0:
            per[ck].append((-float(p), ok))
    want = {}
    for ck, lst in per.items():
        for negp, ok in sorted(lst)[:2]:
            want[(ck, ok)] = _q_half_away(-negp, 100)
    got = {
        (r["c_custkey"], r["o_orderkey"]): r["price_cents"]
        for r in all_queries()["join_lateral_topn"](spark, sf_dir).collect()
    }
    assert got == want


def test_join_null_safe_eq_matches_null_bucket_walk(spark, sf_dir):
    """IS NOT DISTINCT FROM join: the NULL keys match each other and land
    in one group with the NULL dim row's weight."""
    ks = [
        None if ck % 7 == 3 else ck % 7
        for (ck,) in _raw(
            sf_dir, "SELECT c_custkey FROM read_parquet('{D}/customer.parquet')"
        )
    ]
    rhs = {None if i == 3 else i: i * 2 for i in range(7)}
    want: dict = defaultdict(lambda: [0, 0])
    for k in ks:
        want[k][0] += 1
        want[k][1] += rhs[k]
    got = {
        r["k"]: [r["n_rows"], r["sum_w"]]
        for r in all_queries()["join_null_safe_eq"](spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in want.items()}


def test_join_null_aware_anti_matches_3vl_counts(spark, sf_dir):
    """NOT IN three-valued logic: the clean set keeps the complement, one
    NULL in the set annihilates every row."""
    rows = _raw(
        sf_dir,
        "SELECT c_custkey, c_mktsegment FROM read_parquet('{D}/customer.parquet')",
    )
    clean = {ck for ck, seg in rows if seg == "BUILDING"}
    want = {
        "no_null": sum(1 for ck, _ in rows if ck not in clean),
        "with_null": 0,
    }
    got = {
        r["variant"]: r["n_kept"]
        for r in all_queries()["join_null_aware_anti"](spark, sf_dir).collect()
    }
    assert got == want


def test_join_relational_division_matches_coverage(spark, sf_dir):
    """Codd's division: customers whose orders span EVERY priority in the
    data-derived universe."""
    per: dict[int, set] = defaultdict(set)
    n_orders: dict[int, int] = defaultdict(int)
    univ = set()
    for ck, pr in _raw(
        sf_dir,
        "SELECT o_custkey, o_orderpriority FROM read_parquet('{D}/orders.parquet')",
    ):
        per[ck].add(pr)
        n_orders[ck] += 1
        univ.add(pr)
    want = {ck: n_orders[ck] for ck, prs in per.items() if len(prs) == len(univ)}
    got = {
        r["c_custkey"]: r["n_orders"]
        for r in all_queries()["join_relational_division"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 13: text modeling kernels — bigram LM, inverted index, trigram
# language ID vs nested-dict rebuilds
# --------------------------------------------------------------------------


def test_text_bigram_lm_matches_count_walk(spark, sf_dir):
    """Count-based bigram LM: per frequent context, the top-3 next tokens
    with exact ppm conditional probability and the (n desc, w2) rank."""
    from tmdb_movie_data_pipeline_spark.operators.text import (
        _LM_MIN_CTX,
        _LM_TOPN,
    )

    cnt: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for _, text, _ in _docs(sf_dir):
        toks = _toks_py(text)
        for a, b in zip(toks, toks[1:]):
            cnt[a][b] += 1
    want = {}
    for w1, nexts in cnt.items():
        n_ctx = sum(nexts.values())
        if n_ctx < _LM_MIN_CTX:
            continue
        order = sorted(nexts, key=lambda w2: (-nexts[w2], w2))
        for rk, w2 in enumerate(order[:_LM_TOPN], start=1):
            want[(w1, w2)] = (
                nexts[w2],
                n_ctx,
                (1_000_000 * nexts[w2]) // n_ctx,
                rk,
            )
    got = {
        (r["w1"], r["w2"]): (r["n"], r["n_ctx"], r["cond_ppm"], r["rk"])
        for r in all_queries()["text_bigram_lm"](spark, sf_dir).collect()
    }
    assert got == want


def test_text_inverted_index_matches_postings_walk(spark, sf_dir):
    """term -> (df, capped sorted postings): distinct (doc, term) pairs,
    the absolute df floor and the relative 4n/5 ceiling, 10 smallest ids
    comma-joined."""
    from tmdb_movie_data_pipeline_spark.operators.text import (
        _IDX_CAP,
        _IDX_MAX_DF_DEN,
        _IDX_MAX_DF_NUM,
        _IDX_MIN_DF,
    )

    docs = _docs(sf_dir)
    postings: dict[str, set[int]] = defaultdict(set)
    for did, text, _ in docs:
        for t in set(_toks_py(text)):
            if len(t) >= 3:
                postings[t].add(did)
    ceil_df = (_IDX_MAX_DF_NUM * len(docs)) // _IDX_MAX_DF_DEN
    want = {}
    for t, ds in postings.items():
        if _IDX_MIN_DF <= len(ds) <= ceil_df:
            want[t] = (
                len(ds),
                ",".join(str(d) for d in sorted(ds)[:_IDX_CAP]),
            )
    got = {
        r["term"]: (r["df"], r["postings"])
        for r in all_queries()["text_inverted_index"](spark, sf_dir).collect()
    }
    assert got == want


def test_text_char_trigram_langid_matches_lift_walk(spark, sf_dir):
    """Cavnar-Trenkle-style language ID with LIFT-ranked trigram profiles:
    integer lift ranks, per-doc profile-hit argmax, und fallback, the
    confusion-matrix rollup."""
    from tmdb_movie_data_pipeline_spark.operators.text import (
        _TRI_MIN_COUNT,
        _TRI_PROFILE,
    )

    docs = _docs(sf_dir)
    lg: dict[tuple[str, str], int] = defaultdict(int)
    doc_grams: dict[int, list[str]] = {}
    actual: dict[int, str] = {}
    for did, text, lang in docs:
        t = _norm_py(text)
        grams = [t[i : i + 3] for i in range(max(len(t) - 2, 0))]
        doc_grams[did] = grams
        actual[did] = lang
        for g in grams:
            lg[(lang, g)] += 1
    tot: dict[str, int] = defaultdict(int)
    ltot: dict[str, int] = defaultdict(int)
    for (lang, g), c in lg.items():
        tot[g] += c
        ltot[lang] += c
    n = sum(lg.values())
    prof: dict[str, set[str]] = {}
    for lang in ltot:
        ranked = sorted(
            (
                (-((1_000_000 * c * n) // (tot[g] * ltot[lang])), g)
                for (lg_lang, g), c in lg.items()
                if lg_lang == lang and c >= _TRI_MIN_COUNT
            )
        )
        prof[lang] = {g for _, g in ranked[:_TRI_PROFILE]}
    conf: dict[tuple[str, str], int] = defaultdict(int)
    for did, grams in doc_grams.items():
        scores = {
            lang: sum(1 for g in grams if g in p) for lang, p in prof.items()
        }
        scores = {lang: s for lang, s in scores.items() if s > 0}
        pred = (
            min(scores, key=lambda lang: (-scores[lang], lang))
            if scores
            else "und"
        )
        conf[(actual[did], pred)] += 1
    got = {
        (r["actual"], r["predicted"]): r["n_docs"]
        for r in all_queries()["text_char_trigram_langid"](spark, sf_dir).collect()
    }
    assert got == dict(conf)


# --------------------------------------------------------------------------
# batch 14: ML metric kernels — MCC, calibration error, the hashing trick
# --------------------------------------------------------------------------


def test_ml_matthews_corr_matches_confusion_walk(spark, sf_dir):
    """MCC of the marker-threshold classifier: integer confusion cells,
    sign carried separately, MCC^2 in exact ppm."""
    markers = {"the", "a", "and", "of", "is"}
    tp = fp = fn = tn = 0
    for _, text, lang in _docs(sf_dir):
        pred = 1 if sum(1 for t in _toks_py(text) if t in markers) >= 1 else 0
        actual = 1 if lang == "en" else 0
        tp += pred & actual
        fp += pred & (1 - actual)
        fn += (1 - pred) & actual
        tn += (1 - pred) & (1 - actual)
    denom = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    mcc2 = 0 if denom == 0 else (1_000_000 * (tp * tn - fp * fn) ** 2) // denom
    [r] = all_queries()["ml_matthews_corr"](spark, sf_dir).collect()
    assert (r["tp"], r["fp"], r["fn"], r["tn"], r["mcc_sign"], r["mcc2_ppm"]) == (
        tp,
        fp,
        fn,
        tn,
        1 if tp * tn >= fp * fn else -1,
        mcc2,
    )


def test_ml_ece_matches_bin_gap_walk(spark, sf_dir):
    """ECE/MCE over the equal-width n_chars bins: integer gap numerators
    |2B*n_pos - n*(2bin+1)| folded over the common denominators."""
    from tmdb_movie_data_pipeline_spark.operators.clustering import (
        _CAL_BINS,
        _CAL_POS_LANG,
    )

    rows = _raw(
        sf_dir,
        "SELECT n_chars, lang FROM read_parquet('{D}/documents.parquet')",
    )
    mn = min(n for n, _ in rows)
    mx = max(n for n, _ in rows)
    bins: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for n_chars, lang in rows:
        b = ((n_chars - mn) * _CAL_BINS) // (mx - mn + 1)
        bins[b][0] += 1
        bins[b][1] += 1 if lang == _CAL_POS_LANG else 0
    gaps = {
        b: abs(2 * _CAL_BINS * npos - n * (2 * b + 1))
        for b, (n, npos) in bins.items()
    }
    n_total = sum(n for n, _ in bins.values())
    ece = (1_000_000 * sum(gaps.values())) // (2 * _CAL_BINS * n_total)
    mce = max(
        (1_000_000 * gaps[b]) // (2 * _CAL_BINS * bins[b][0]) for b in bins
    )
    [r] = all_queries()["ml_expected_calibration_error"](spark, sf_dir).collect()
    assert (r["n_bins"], r["n_total"], r["ece_ppm"], r["mce_ppm"]) == (
        len(bins),
        n_total,
        ece,
        mce,
    )


def test_ml_feature_hashing_matches_salted_md5(spark, sf_dir):
    """The hashing trick: salted md5 modulus into the fixed feature
    space, (doc, idx, tf) cells, the df >= 3 feature floor."""
    from tmdb_movie_data_pipeline_spark.operators.clustering import (
        _FH_DIM,
        _FH_MIN_DF,
    )

    cells: dict[tuple[int, int], int] = defaultdict(int)
    for did, text, _ in _docs(sf_dir):
        for t in _toks_py(text):
            if len(t) >= 2:
                cells[(did, _md5_60(f"fh_{t}") % _FH_DIM)] += 1
    df: dict[int, set[int]] = defaultdict(set)
    for (did, idx) in cells:
        df[idx].add(did)
    want = {
        (did, idx): tf
        for (did, idx), tf in cells.items()
        if len(df[idx]) >= _FH_MIN_DF
    }
    got = {
        (r["doc_id"], r["feature_idx"]): r["tf"]
        for r in all_queries()["ml_feature_hashing"](spark, sf_dir).collect()
    }
    assert got == want


def test_ml_feature_hashing_stats_match_sign_audit(spark, sf_dir):
    """The collision audit: per bucket distinct terms, raw tf, the signed
    net under the disjoint-slice sign bit, and df."""
    import hashlib

    from tmdb_movie_data_pipeline_spark.operators.text import _FH_BUCKETS

    terms: dict[int, set[str]] = defaultdict(set)
    tf: dict[int, int] = defaultdict(int)
    net: dict[int, int] = defaultdict(int)
    docs_in: dict[int, set[int]] = defaultdict(set)
    for did, text, _ in _docs(sf_dir):
        for t in _toks_py(text):
            h = hashlib.md5(t.encode()).hexdigest()
            b = int(h[:15], 16) % _FH_BUCKETS
            terms[b].add(t)
            tf[b] += 1
            net[b] += 1 if int(h[16], 16) % 2 == 0 else -1
            docs_in[b].add(did)
    want = {
        b: (len(terms[b]), tf[b], net[b], len(docs_in[b])) for b in terms
    }
    got = {
        r["bucket"]: (r["n_terms"], r["total_tf"], r["net_signed"], r["df"])
        for r in all_queries()["ml_feature_hashing_stats"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 15: substring/minimizer/containment dedup — the long-match axis
# rebuilt with rolling-window hashlib walks
# --------------------------------------------------------------------------


def _windows_py(toks: list[str], k: int) -> list[str]:
    """1-based rolling k-token windows, shorter whole-doc window for
    sub-k docs (the engines' sequence/slice semantics)."""
    n = len(toks)
    return [" ".join(toks[i : i + k]) for i in range(max(n - k + 1, 1))]


def test_dedup_exact_substring_matches_window_join(spark, sf_dir):
    """Shared >= 15-token verbatim windows per doc pair: distinct md5'd
    windows, set-intersection counts."""
    import hashlib

    from tmdb_movie_data_pipeline_spark.operators.dedup import _SUBSTR_K

    gd = {
        did: {
            hashlib.md5(w.encode()).hexdigest()
            for w in _windows_py(_toks_py(text), _SUBSTR_K)
        }
        for did, text, _ in _docs(sf_dir)
    }
    ids = sorted(gd)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(gd[a] & gd[b])
            if shared:
                want[(a, b)] = shared
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared_windows"]
        for r in all_queries()["dedup_exact_substring"](spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_longest_dup_run_matches_island_walk(spark, sf_dir):
    """Lee-et-al reporting statistic: cross-document duplicated window
    positions merged by consecutive-position islands; run length =
    span + K; within-doc-only repeats excluded."""
    import hashlib

    from tmdb_movie_data_pipeline_spark.operators.dedup import _SUBSTR_K

    wins: dict[int, list[str]] = {}
    owners: dict[str, list[int]] = defaultdict(list)
    for did, text, _ in _docs(sf_dir):
        ws = [
            hashlib.md5(w.encode()).hexdigest()
            for w in _windows_py(_toks_py(text), _SUBSTR_K)
        ]
        wins[did] = ws
        for g in ws:
            owners[g].append(did)
    span = {g: (min(ds), max(ds)) for g, ds in owners.items()}
    want = {}
    for did, ws in wins.items():
        dup_pos = [
            pos
            for pos, g in enumerate(ws, start=1)
            if span[g] != (did, did)
        ]
        if not dup_pos:
            continue
        runs = [[dup_pos[0], dup_pos[0]]]
        for p in dup_pos[1:]:
            if p == runs[-1][1] + 1:
                runs[-1][1] = p
            else:
                runs.append([p, p])
        want[did] = (
            len(dup_pos),
            len(runs),
            max(b - a + _SUBSTR_K for a, b in runs),
        )
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["n_runs"], r["longest_dup_run"])
        for r in all_queries()["dedup_longest_dup_run"](spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_minimizer_pairs_match_winnowing_walk(spark, sf_dir):
    """Schleimer winnowing: per-window minimum of md5(gram)+padded-pos
    strings, full-window starts only, >= 2 shared fingerprints."""
    import hashlib

    from tmdb_movie_data_pipeline_spark.operators.dedup import (
        _MZ_K,
        _MZ_MIN_SHARED,
        _MZ_W,
    )

    sels: dict[int, set[str]] = {}
    for did, text, _ in _docs(sf_dir):
        toks = _toks_py(text)
        grams = _windows_py(toks, _MZ_K)
        m = len(grams)
        hp = [
            hashlib.md5(g.encode()).hexdigest() + str(i + 1).zfill(8)
            for i, g in enumerate(grams)
        ]
        keep = set()
        for pos in range(1, max(m - _MZ_W + 1, 1) + 1):
            sel = min(hp[pos - 1 : pos - 1 + _MZ_W])
            keep.add(sel[:32])
        sels[did] = keep
    ids = sorted(sels)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(sels[a] & sels[b])
            if shared >= _MZ_MIN_SHARED:
                want[(a, b)] = shared
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared_minimizers"]
        for r in all_queries()["dedup_minimizer_pairs"](spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_containment_matches_capped_set_walk(spark, sf_dir):
    """Asymmetric containment over RARE shingles: df-capped sets, pair
    intersections, |A n B| / min sizes in exact ppm with the 7.5% gate."""
    from tmdb_movie_data_pipeline_spark.operators.dedup import (
        _CONTAIN_DF_CAP,
        _CONTAIN_MIN_PPM,
    )

    sh = {did: _shingles_py(text) for did, text, _ in _docs(sf_dir)}
    df: dict[str, int] = defaultdict(int)
    for s in sh.values():
        for g in s:
            df[g] += 1
    capped = {
        did: {g for g in s if df[g] <= _CONTAIN_DF_CAP} for did, s in sh.items()
    }
    sizes = {did: len(s) for did, s in capped.items() if s}
    ids = sorted(sizes)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(capped[a] & capped[b])
            if inter == 0:
                continue
            ppm = (1_000_000 * inter) // min(sizes[a], sizes[b])
            if ppm >= _CONTAIN_MIN_PPM:
                want[(a, b)] = (inter, sizes[a], sizes[b], ppm)
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["n_a"], r["n_b"], r["containment_ppm"])
        for r in all_queries()["dedup_containment_pairs"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 16: market-basket, sequence and seasonality kernels + deterministic
# stratified sampling vs dict walks
# --------------------------------------------------------------------------


def test_events_association_rules_match_basket_walk(spark, sf_dir):
    """Support / confidence / lift over per-user type baskets, the
    two-step bounded integer ppm forms with truncating division."""
    from tmdb_movie_data_pipeline_spark.operators.events import _AR_MINSUP

    baskets: dict[int, set[str]] = defaultdict(set)
    for u, _, _, t, _ in _ev_rows(sf_dir):
        baskets[u].add(t)
    tc: dict[str, int] = defaultdict(int)
    nboth: dict[tuple[str, str], int] = defaultdict(int)
    for types in baskets.values():
        for t in types:
            tc[t] += 1
        st = sorted(types)
        for i, a in enumerate(st):
            for b in st[i + 1 :]:
                nboth[(a, b)] += 1
    n_users = len(baskets)
    want = {}
    for (a, b), nb in nboth.items():
        if nb < _AR_MINSUP:
            continue
        conf = (1_000_000 * nb) // tc[a]
        want[(a, b)] = (nb, tc[a], tc[b], conf, (conf * n_users) // tc[b])
    got = {
        (r["ant"], r["cons"]): (
            r["n_both"],
            r["n_ant"],
            r["n_cons"],
            r["conf_ppm"],
            r["lift_ppm"],
        )
        for r in all_queries()["events_association_rules"](spark, sf_dir).collect()
    }
    assert got == want


def test_events_cooccurrence_matches_user_set_jaccard(spark, sf_dir):
    baskets: dict[str, set[int]] = defaultdict(set)
    for u, _, _, t, _ in _ev_rows(sf_dir):
        baskets[t].add(u)
    types = sorted(baskets)
    want = {}
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            nb = len(baskets[a] & baskets[b])
            if nb:
                want[(a, b)] = (
                    nb,
                    float(nb) / float(len(baskets[a]) + len(baskets[b]) - nb),
                )
    got = {
        (r["type_a"], r["type_b"]): (r["n_both"], r["jaccard"])
        for r in all_queries()["events_cooccurrence_pairs"](spark, sf_dir).collect()
    }
    assert got == want


def test_events_sequence_trigrams_match_timeline_walk(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.operators.events import _SEQ_TOPN

    per: dict[int, list] = defaultdict(list)
    for u, e, us, t, _ in _ev_rows(sf_dir):
        per[u].append((us, e, t))
    cnt: dict[tuple[str, str, str], int] = defaultdict(int)
    for evs in per.values():
        evs.sort()
        ts = [t for _, _, t in evs]
        for tri in zip(ts, ts[1:], ts[2:]):
            cnt[tri] += 1
    top = sorted(cnt, key=lambda k: (-cnt[k], *k))[:_SEQ_TOPN]
    want = {tri: cnt[tri] for tri in top}
    got = {
        (r["t1"], r["t2"], r["t3"]): r["n"]
        for r in all_queries()["events_sequence_trigrams"](spark, sf_dir).collect()
    }
    assert got == want


def test_events_seasonality_index_matches_dow_walk(spark, sf_dir):
    """Day-of-week revenue index per type in exact ppm (1e6 = average
    day), daily cents from the quantized rollup, Sunday-anchored dow."""
    from datetime import datetime, timezone

    daily: dict[tuple[str, str], int] = defaultdict(int)
    for _, _, us, t, v in _ev_rows(sf_dir):
        d = datetime.fromtimestamp(us / 1_000_000, tz=timezone.utc).date()
        daily[(t, d.isoformat())] += _q_half_away(v, 100)
    dows: dict[tuple[str, int], list[int]] = defaultdict(lambda: [0, 0])
    for (t, ds), v in daily.items():
        d = datetime.strptime(ds, "%Y-%m-%d").date()
        dow = (d.weekday() + 1) % 7 + 1  # Sunday -> 1 ... Saturday -> 7
        dows[(t, dow)][0] += v
        dows[(t, dow)][1] += 1
    tot: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for (t, _), (s, n) in dows.items():
        tot[t][0] += s
        tot[t][1] += n
    want = {}
    for (t, dow), (s, n) in dows.items():
        total, n_all = tot[t]
        want[(t, dow)] = (n, s, (((1_000_000 * s) // n) * n_all) // total)
    got = {
        (r["event_type"], r["dow"]): (r["n_dow"], r["sum_dow"], r["index_ppm"])
        for r in all_queries()["events_seasonality_index"](spark, sf_dir).collect()
    }
    assert got == want


def test_sample_stratified_hash_matches_knuth_walk(spark, sf_dir):
    """Deterministic stratified sampling: Fibonacci-hash the doc id, keep
    under the per-language cut — pure integer arithmetic, replayed
    verbatim."""
    from tmdb_movie_data_pipeline_spark.operators.sampling import (
        _DEFAULT_RATE,
        _KEY_MASK,
        _KNUTH,
        _MOD,
        _RATES,
    )

    want = {}
    for did, _, lang in _docs(sf_dir):
        h = ((did % _KEY_MASK) * _KNUTH) % _MOD
        cut = int(_RATES.get(lang, _DEFAULT_RATE) * _MOD)
        if h < cut:
            want[did] = (lang, h)
    got = {
        r["doc_id"]: (r["lang"], r["sample_key"])
        for r in all_queries()["sample_stratified_hash"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 17: Spark-4 SQL-surface sugars — the inferred/linear dialects must
# equal plain dict rollups of the underlying relation
# --------------------------------------------------------------------------


def test_sql_group_by_all_matches_dict_rollup(spark, sf_dir):
    want: dict = defaultdict(lambda: [0, 0])
    for pr, d, p in _raw(
        sf_dir,
        "SELECT o_orderpriority, CAST(o_orderdate AS VARCHAR), o_totalprice"
        " FROM read_parquet('{D}/orders.parquet')",
    ):
        key = (pr, int(d[:4]))
        want[key][0] += 1
        want[key][1] += _q_half_away(float(p), 100)
    got = {
        (r["o_orderpriority"], r["order_year"]): [r["n_orders"], r["total_cents"]]
        for r in all_queries()["sql_group_by_all_report"](spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in want.items()}


def test_sql_unpivot_matches_melt_walk(spark, sf_dir):
    want = {}
    for ok, ln, q, d, t in _raw(
        sf_dir,
        "SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax"
        " FROM read_parquet('{D}/lineitem.parquet') WHERE l_orderkey % 1000 = 0",
    ):
        for m, v in (("quantity", q), ("discount", d), ("tax", t)):
            want[(ok, ln, m)] = _q_half_away(float(v), 100)
    got = {
        (r["l_orderkey"], r["l_linenumber"], r["measure"]): r["val_centi"]
        for r in all_queries()["sql_unpivot_syntax"](spark, sf_dir).collect()
    }
    assert got == want


def test_sql_pipe_syntax_matches_rollup_topn(spark, sf_dir):
    per: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for f, q, d in _raw(
        sf_dir,
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT), CAST(l_shipdate AS VARCHAR)"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if d >= "1995-01-01":
            per[f][0] += 1
            per[f][1] += q
    top = sorted(per, key=lambda f: (-per[f][1], f))[:2]
    want = {f: (per[f][0], per[f][1]) for f in top}
    got = {
        r["l_returnflag"]: (r["n_items"], r["sum_qty"])
        for r in all_queries()["sql_pipe_syntax_report"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 18: transaction-log exhibits — version diff, history, time travel
# rebuilt as plain-Python dict ledgers of the fixture's commit sequence
# --------------------------------------------------------------------------


def _tx_ledger(sf_dir: str):
    """v0/v1/v2 content dicts of the Delta-shaped fixture: CREATE from
    customer (2-decimal balances), MERGE the %5 updates + nation inserts,
    DELETE the [301, 450] key slice."""
    base = {}
    for ck, nm, bal, seg in _raw(
        sf_dir,
        "SELECT c_custkey, c_name, c_acctbal, c_mktsegment"
        " FROM read_parquet('{D}/customer.parquet')",
    ):
        base[ck] = (nm, _round_dec(float(bal), 2), seg)
    source = {
        ck: (nm + "+", _round_dec(bal + 50, 2), seg)
        for ck, (nm, bal, seg) in base.items()
        if ck % 5 == 0
    }
    for nk, nname in _raw(
        sf_dir, "SELECT n_nationkey, n_name FROM read_parquet('{D}/nation.parquet')"
    ):
        source[2_000_000 + nk] = (f"tx-{nname}", 0.0, "TX")
    v1 = {**base, **source}
    from tmdb_movie_data_pipeline_spark.operators.merge import (
        _DIFF_DEL_HI,
        _DIFF_DEL_LO,
    )

    v2 = {k: v for k, v in v1.items() if not (_DIFF_DEL_LO <= k <= _DIFF_DEL_HI)}
    return base, v1, v2


def test_delta_version_diff_matches_ledger_diff(spark, sf_dir):
    """v0 -> v2 typed change rows from the dict ledger: deletes, inserts,
    and value-differing updates."""
    v0, _, v2 = _tx_ledger(sf_dir)
    want = {}
    for ck in v0:
        if ck not in v2:
            nm, bal, _ = v0[ck]
            want[("delete", ck)] = (nm, bal)
    for ck, (nm, bal, seg) in v2.items():
        if ck not in v0:
            want[("insert", ck)] = (nm, bal)
        elif (nm, bal, seg) != v0[ck]:
            want[("update", ck)] = (nm, bal)
    got = {
        (r["change_type"], r["c_custkey"]): (r["c_name"], r["c_acctbal"])
        for r in all_queries()["delta_version_diff"](spark, sf_dir).collect()
    }
    assert got == want


def test_delta_time_travel_matches_ledger_aggregates(spark, sf_dir):
    """Snapshot isolation's observable: v0 aggregates stay pre-merge, v1
    reflects the upsert — both folded from the dict ledger."""
    v0, v1, _ = _tx_ledger(sf_dir)
    want = {
        0: (len(v0), sum(_q_half_away(b, 100) for _, b, _ in v0.values())),
        1: (len(v1), sum(_q_half_away(b, 100) for _, b, _ in v1.values())),
    }
    got = {
        r["version"]: (r["n_rows"], r["bal_cents"])
        for r in all_queries()["delta_time_travel_stats"](spark, sf_dir).collect()
    }
    assert got == want


def test_delta_cdc_feed_matches_ledger_diffs(spark, sf_dir):
    """The full change feed (both commits) against the ledger: v0->v1
    merge changes and v1->v2 delete changes with their commit stamps —
    the third formulation beside the write-time recorder and the
    snapshot-diff oracle."""
    v0, v1, v2 = _tx_ledger(sf_dir)
    want = {}
    for ck, (nm, bal, seg) in v1.items():
        if ck not in v0:
            want[(1, "insert", ck)] = (nm, bal)
        elif (nm, bal, seg) != v0[ck]:
            want[(1, "update", ck)] = (nm, bal)
    for ck in v1:
        if ck not in v2:
            nm, bal, _ = v1[ck]
            want[(2, "delete", ck)] = (nm, bal)
    got = {
        (r["commit_version"], r["change_type"], r["c_custkey"]): (
            r["c_name"],
            r["c_acctbal"],
        )
        for r in all_queries()["delta_cdc_feed_commits"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 19: ordered-alternative trend tests vs integer-rational walks
# --------------------------------------------------------------------------


def test_cochran_armitage_matches_contingency_walk(spark, sf_dir):
    """Trend in proportions across dose groups: the 5-row contingency
    from dicts, z^2 as one floored integer rational, degenerate guards."""
    g: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for pr, st in _raw(
        sf_dir,
        "SELECT o_orderpriority, o_orderstatus FROM read_parquet('{D}/orders.parquet')",
    ):
        dose = int(pr[0])
        g[dose][0] += 1
        g[dose][1] += 1 if st == "F" else 0
    n = sum(ni for ni, _ in g.values())
    s = sum(si for _, si in g.values())
    t = sum(d * si for d, (_, si) in g.items())
    w1 = sum(d * ni for d, (ni, _) in g.items())
    w2 = sum(d * d * ni for d, (ni, _) in g.items())
    if s == 0 or s == n or n * w2 == w1 * w1:
        z2 = 0
    else:
        z2 = (1_000_000 * n * (n * t - s * w1) ** 2) // (
            s * (n - s) * (n * w2 - w1 * w1)
        )
    want = {
        d: (ni, si, (1_000_000 * si) // ni, z2) for d, (ni, si) in g.items()
    }
    got = {
        r["dose"]: (r["n"], r["successes"], r["success_ppm"], r["z2_ppm"])
        for r in all_queries()["stats_cochran_armitage_trend"](spark, sf_dir).collect()
    }
    assert got == want


def test_page_trend_matches_midrank_walk(spark, sf_dir):
    """Page's L after Friedman: doubled midranks per block (2*rank +
    ties - 1), alphabetical treatment order, the signed z^2 ppm rational
    with both branches' floor semantics."""
    from tmdb_movie_data_pipeline_spark.operators.aggregates import _FRIED_BLOCKS

    cells: dict[tuple[int, str], int] = defaultdict(int)
    for u, _, _, t, v in _ev_rows(sf_dir):
        cells[(u % _FRIED_BLOCKS, t)] += _q_half_away(v, 100)
    blocks: dict[int, list[tuple[str, int]]] = defaultdict(list)
    for (blk, t), cv in cells.items():
        blocks[blk].append((t, cv))
    r2: dict[str, int] = defaultdict(int)
    nblk: dict[str, int] = defaultdict(int)
    for blk, rows in blocks.items():
        cvs = sorted(cv for _, cv in rows)
        for t, cv in rows:
            rank = 1 + sum(1 for x in cvs if x < cv)  # competition rank
            ties = sum(1 for x in cvs if x == cv)
            r2[t] += 2 * rank + ties - 1
            nblk[t] += 1
    types = sorted(r2)
    j = {t: i + 1 for i, t in enumerate(types)}
    l2 = sum(j[t] * r2[t] for t in types)
    b = max(nblk.values())
    k = len(types)
    mean2 = b * k * (k + 1) * (k + 1) // 2
    var_den = (b * (k**3 - k) * (k**3 - k)) // (36 * (k - 1))
    if l2 >= mean2:
        z2 = (1_000_000 * (l2 - mean2) ** 2) // var_den
    else:
        z2 = -((1_000_000 * (mean2 - l2) ** 2) // var_den)
    want = {t: (j[t], r2[t], l2, z2) for t in types}
    got = {
        r["event_type"]: (r["j"], r["r2j"], r["l2"], r["signed_z2_ppm"])
        for r in all_queries()["stats_page_trend_test"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 20: rolling order-statistics/regression, closed-form EWMA, and the
# recursive BOM explosion vs literal Python folds
# --------------------------------------------------------------------------


def _daily_purchase_cents(sf_dir: str) -> dict[int, int]:
    """day-offset-from-2024-01-01 -> quantized daily purchase revenue."""
    from datetime import date, datetime, timezone

    daily: dict[int, int] = defaultdict(int)
    epoch = date(2024, 1, 1).toordinal()
    for _, _, us, t, v in _ev_rows(sf_dir):
        if t == "purchase":
            d = datetime.fromtimestamp(us / 1_000_000, tz=timezone.utc).date()
            daily[d.toordinal() - epoch] += _q_half_away(v, 100)
    return dict(daily)


def test_window_rolling_median_matches_sorted_frame(spark, sf_dir):
    """Trailing 7-day RANGE median as lo+hi of the sorted frame (x2 so
    the even case stays integer); gap days shrink the frame."""
    daily = _daily_purchase_cents(sf_dir)
    want = {}
    for day, rev in daily.items():
        win = sorted(v for d, v in daily.items() if day - 6 <= d <= day)
        n = len(win)
        want[day] = (rev, n, win[(n + 1) // 2 - 1] + win[n // 2])
    got = {
        r["day"]: (r["rev_cents"], r["n_in_window"], r["median_x2_cents"])
        for r in all_queries()["window_rolling_median"](spark, sf_dir).collect()
    }
    assert got == want


def test_window_rolling_ols_matches_moment_walk(spark, sf_dir):
    """Trailing OLS slope per type from integer moment sums, the signed
    ppm division split."""
    from datetime import date, datetime, timezone

    from tmdb_movie_data_pipeline_spark.operators.windows import _ROLS_DAYS

    daily: dict[tuple[str, int], int] = defaultdict(int)
    epoch = date(2024, 1, 1).toordinal()
    for _, _, us, t, v in _ev_rows(sf_dir):
        d = datetime.fromtimestamp(us / 1_000_000, tz=timezone.utc).date()
        daily[(t, d.toordinal() - epoch)] += _q_half_away(v, 1)
    per: dict[str, dict[int, int]] = defaultdict(dict)
    for (t, d), rev in daily.items():
        per[t][d] = rev
    want = {}
    for t, days in per.items():
        for d, rev in days.items():
            frame = [
                (x, y) for x, y in days.items() if d - (_ROLS_DAYS - 1) <= x <= d
            ]
            n = len(frame)
            sx = sum(x for x, _ in frame)
            sy = sum(y for _, y in frame)
            sxy = sum(x * y for x, y in frame)
            sxx = sum(x * x for x, _ in frame)
            if n < 2:
                slope = None
            else:
                num = n * sxy - sx * sy
                den = n * sxx - sx * sx
                slope = (
                    (1_000_000 * num) // den
                    if num >= 0
                    else -((1_000_000 * -num) // den)
                )
            want[(t, d)] = (rev, n, slope)
    got = {
        (r["event_type"], r["day"]): (r["rev"], r["n"], r["slope_ppm"])
        for r in all_queries()["window_rolling_ols_slope"](spark, sf_dir).collect()
    }
    assert got == want


def test_events_ewma_matches_rational_weights(spark, sf_dir):
    """Closed-form EWMA: exact integer weights 3^k * 4^(L-k) over present
    days, floored rational per anchor day."""
    from datetime import date

    from tmdb_movie_data_pipeline_spark.operators.events import _EWMA_LAGS

    daily = _daily_purchase_cents(sf_dir)
    epoch = date(2024, 1, 1).toordinal()
    # anchor day -> contributions from day d at lag = anchor - d
    num: dict[int, int] = defaultdict(int)
    den: dict[int, int] = defaultdict(int)
    nl: dict[int, int] = defaultdict(int)
    for d, x in daily.items():
        for lag in range(_EWMA_LAGS + 1):
            w = 3**lag * 4 ** (_EWMA_LAGS - lag)
            a = d + lag
            num[a] += x * w
            den[a] += w
            nl[a] += 1
    want = {}
    for d, x in daily.items():
        day_str = date.fromordinal(epoch + d).isoformat()
        want[day_str] = (x, num[d] // den[d], nl[d])
    got = {
        r["day"]: (r["rev_cents"], r["ewma_cents"], r["n_lags"])
        for r in all_queries()["events_ewma_smoothing"](spark, sf_dir).collect()
    }
    assert got == want


def test_graph_bom_explosion_matches_dfs_walk(spark, sf_dir):
    """The BOM fixed point as a literal DFS: child -> parent = key div
    FANOUT edges, extended quantity = product along the path."""
    from tmdb_movie_data_pipeline_spark.operators.graph import (
        _BOM_FANOUT,
        _BOM_QTY_MOD,
    )

    keys = [
        int(k)
        for (k,) in _raw(
            sf_dir, "SELECT p_partkey FROM read_parquet('{D}/part.parquet')"
        )
    ]
    children: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for k in keys:
        if k >= _BOM_FANOUT:
            children[k // _BOM_FANOUT].append((k, k % _BOM_QTY_MOD + 1))
    want = {}
    for root in (k for k in keys if k < _BOM_FANOUT):
        n = 0
        max_depth = 0
        total = 1  # the root itself (depth 0, ext_qty 1)
        stack = [(root, 0, 1)]
        while stack:
            node, depth, ext = stack.pop()
            for child, qty in children.get(node, ()):
                n += 1
                max_depth = max(max_depth, depth + 1)
                total += ext * qty
                stack.append((child, depth + 1, ext * qty))
        want[root] = (n, max_depth, total)
    got = {
        r["root"]: (r["n_components"], r["max_depth"], r["total_ext_qty"])
        for r in all_queries()["graph_bom_explosion"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 21: segment dedup with reassembly + the pandas-UDF battery's
# arithmetic contracts as plain Python folds
# --------------------------------------------------------------------------


def test_text_segment_dedup_matches_keepfirst_reassembly(spark, sf_dir):
    """RefinedWeb-style paragraph dedup: fixed-width token segments (raw
    space split, NOT the normalized tokens), corpus-wide keep-first by
    (doc_id, position), md5 of the ordered reassembly."""
    import hashlib

    from tmdb_movie_data_pipeline_spark.operators.text import (
        _SEG_MAX,
        _SEG_TOKENS,
    )

    segs = []  # (doc_id, j, seg) in corpus order
    for did, text, _ in sorted(_docs(sf_dir)):
        toks = text.split(" ")
        for j in range(_SEG_MAX):
            if j * _SEG_TOKENS >= len(toks):
                break
            segs.append(
                (did, j, " ".join(toks[j * _SEG_TOKENS : (j + 1) * _SEG_TOKENS]))
            )
    first: dict[str, tuple[int, int]] = {}
    for did, j, seg in sorted(segs):
        first.setdefault(seg, (did, j))
    want = {}
    per: dict[int, list] = defaultdict(list)
    for did, j, seg in segs:
        per[did].append((j, seg, first[seg] == (did, j)))
    for did, rows in per.items():
        rows.sort()
        keptsegs = [seg for _, seg, kept in rows if kept]
        want[did] = (
            len(rows),
            len(keptsegs),
            hashlib.md5(" ".join(keptsegs).encode()).hexdigest(),
        )
    got = {
        r["doc_id"]: (r["n_segments"], r["n_kept"], r["kept_md5"])
        for r in all_queries()["text_segment_dedup"](spark, sf_dir).collect()
    }
    assert got == want


def test_udf_pandas_scalar_matches_math_walk(spark, sf_dir):
    """The vectorized scalar UDF's arithmetic — sqrt(price) +
    floor(qty/10) — replayed with math.sqrt (IEEE-correct on all three
    engines)."""
    want = {}
    for ok, ln, p, q in _raw(
        sf_dir,
        "SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity"
        " FROM read_parquet('{D}/lineitem.parquet') WHERE l_orderkey % 200 = 0",
    ):
        want[(ok, ln)] = math.sqrt(float(p)) + math.floor(float(q) / 10.0)
    got = {
        (r["l_orderkey"], r["l_linenumber"]): r["scored"]
        for r in all_queries()["udf_pandas_scalar"](spark, sf_dir).collect()
    }
    assert got == want


def test_udf_grouped_agg_matches_weighted_fold(spark, sf_dir):
    """The grouped-agg UDF's quantity-weighted mean: integer cents*qty
    sums folded in Python, the same two-division tail."""
    num: dict[str, int] = defaultdict(int)
    den: dict[str, int] = defaultdict(int)
    for f, p, q in _raw(
        sf_dir,
        "SELECT l_returnflag, l_extendedprice, l_quantity"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        num[f] += _q_half_away(float(p), 100) * int(q)
        den[f] += int(q)
    want = {f: num[f] / den[f] / 100.0 for f in num}
    got = {
        r["l_returnflag"]: r["weighted_avg_price"]
        for r in all_queries()["udf_grouped_agg"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 22: TPC-H flagship shapes — q1/q3/q5 rebuilt as dict folds with the
# per-row quantization discipline
# --------------------------------------------------------------------------


def test_q1_pricing_summary_matches_dict_fold(spark, sf_dir):
    """The flagship scan+agg: per-row quantized integer sums (money,
    price, unit scales), two-division averages, the shipdate cutoff."""
    from tmdb_movie_data_pipeline_spark.functions.numeric import (
        MONEY_SCALE,
        PRICE_SCALE,
        UNIT_SCALE,
    )

    acc: dict[tuple[str, str], list[int]] = defaultdict(lambda: [0] * 7)
    for f, s, q, p, d, t, sd in _raw(
        sf_dir,
        "SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice,"
        " l_discount, l_tax, CAST(l_shipdate AS VARCHAR)"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        # l_shipdate is a midnight TIMESTAMP: its VARCHAR form carries
        # " 00:00:00", so compare against the full-instant cutoff (the
        # engine's <= TIMESTAMP '1998-09-02' includes the boundary rows)
        if sd > "1998-09-02 00:00:00":
            continue
        q, p, d, t = float(q), float(p), float(d), float(t)
        a = acc[(f, s)]
        a[0] += _q_half_away(q, MONEY_SCALE)
        a[1] += _q_half_away(p, MONEY_SCALE)
        a[2] += _q_half_away(p * (1 - d), PRICE_SCALE)
        a[3] += _q_half_away(p * (1 - d) * (1 + t), PRICE_SCALE)
        a[4] += _q_half_away(d, UNIT_SCALE)
        a[5] += 1
    want = {}
    for key, a in acc.items():
        n = a[5]
        want[key] = (
            float(a[0]) / float(MONEY_SCALE),
            float(a[1]) / float(MONEY_SCALE),
            float(a[2]) / float(PRICE_SCALE),
            float(a[3]) / float(PRICE_SCALE),
            (float(a[0]) / float(n)) / float(MONEY_SCALE),
            (float(a[1]) / float(n)) / float(MONEY_SCALE),
            (float(a[4]) / float(n)) / float(UNIT_SCALE),
            n,
        )
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["sum_qty"],
            r["sum_base_price"],
            r["sum_disc_price"],
            r["sum_charge"],
            r["avg_qty"],
            r["avg_price"],
            r["avg_disc"],
            r["count_order"],
        )
        for r in all_queries()["q1_pricing_summary"](spark, sf_dir).collect()
    }
    assert got == want


def test_q3_shipping_priority_matches_join_fold(spark, sf_dir):
    """3-way join -> grouped quantized revenue -> top-10 under
    (revenue desc, orderkey)."""
    from tmdb_movie_data_pipeline_spark.functions.numeric import PRICE_SCALE

    building = {
        ck
        for ck, seg in _raw(
            sf_dir,
            "SELECT c_custkey, c_mktsegment FROM read_parquet('{D}/customer.parquet')",
        )
        if seg == "BUILDING"
    }
    orders = {
        ok: (d, pr)
        for ok, ck, d, pr in _raw(
            sf_dir,
            "SELECT o_orderkey, o_custkey, CAST(o_orderdate AS VARCHAR),"
            " o_orderpriority FROM read_parquet('{D}/orders.parquet')",
        )
        if ck in building and d < "1998-03-15"
    }
    rev: dict[int, int] = defaultdict(int)
    for ok, p, d, sd in _raw(
        sf_dir,
        "SELECT l_orderkey, l_extendedprice, l_discount, CAST(l_shipdate AS VARCHAR)"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        # strict > on the timestamp: the midnight boundary row is excluded
        if ok in orders and sd > "1995-03-15 00:00:00":
            rev[ok] += _q_half_away(float(p) * (1 - float(d)), PRICE_SCALE)
    top = sorted(rev, key=lambda ok: (-rev[ok], ok))[:10]
    want = {
        ok: (float(rev[ok]) / float(PRICE_SCALE), orders[ok][0][:10], orders[ok][1])
        for ok in top
    }
    got = {
        r["l_orderkey"]: (r["revenue"], r["o_orderdate"], r["o_orderpriority"])
        for r in all_queries()["q3_shipping_priority"](spark, sf_dir).collect()
    }
    assert got == want


def test_q5_region_revenue_matches_star_fold(spark, sf_dir):
    """6-way star join: the local-supplier constraint (c_nationkey =
    s_nationkey), the ASIA region filter, quantized revenue per nation."""
    from tmdb_movie_data_pipeline_spark.functions.numeric import PRICE_SCALE

    asia = {
        rk
        for rk, rn in _raw(
            sf_dir, "SELECT r_regionkey, r_name FROM read_parquet('{D}/region.parquet')"
        )
        if rn == "ASIA"
    }
    nations = {
        nk: nn
        for nk, nn, rk in _raw(
            sf_dir,
            "SELECT n_nationkey, n_name, n_regionkey FROM read_parquet('{D}/nation.parquet')",
        )
        if rk in asia
    }
    supp_nation = dict(
        _raw(
            sf_dir,
            "SELECT s_suppkey, s_nationkey FROM read_parquet('{D}/supplier.parquet')",
        )
    )
    cust_nation = dict(
        _raw(
            sf_dir,
            "SELECT c_custkey, c_nationkey FROM read_parquet('{D}/customer.parquet')",
        )
    )
    order_cust = {
        ok: ck
        for ok, ck, d in _raw(
            sf_dir,
            "SELECT o_orderkey, o_custkey, CAST(o_orderdate AS VARCHAR)"
            " FROM read_parquet('{D}/orders.parquet')",
        )
        if "1996-01-01" <= d < "1998-01-01"
    }
    rev: dict[str, int] = defaultdict(int)
    for ok, sk, p, d in _raw(
        sf_dir,
        "SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if ok not in order_cust:
            continue
        nk = supp_nation.get(sk)
        if nk is None or nk not in nations:
            continue
        if cust_nation.get(order_cust[ok]) != nk:
            continue
        rev[nations[nk]] += _q_half_away(float(p) * (1 - float(d)), PRICE_SCALE)
    want = {nn: float(c) / float(PRICE_SCALE) for nn, c in rev.items()}
    got = {
        r["n_name"]: r["revenue"]
        for r in all_queries()["q5_region_revenue"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 23: more TPC-H shapes — conditional counts across a join, the
# promo share ratio, disjunctive predicates
# --------------------------------------------------------------------------


def test_q12_shipmode_matches_case_counts(spark, sf_dir):
    prio = dict(
        _raw(
            sf_dir,
            "SELECT o_orderkey, o_orderpriority FROM read_parquet('{D}/orders.parquet')",
        )
    )
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for ok, f, sd in _raw(
        sf_dir,
        "SELECT l_orderkey, l_returnflag, CAST(l_shipdate AS VARCHAR)"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if not ("1996-01-01" <= sd < "1997-01-01") or ok not in prio:
            continue
        hi = prio[ok] in ("1-URGENT", "2-HIGH")
        want[f][0 if hi else 1] += 1
    got = {
        r["l_returnflag"]: [r["high_line_count"], r["low_line_count"]]
        for r in all_queries()["q12_shipmode_priority"](spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in want.items()}


def test_q14_promo_share_matches_like_fold(spark, sf_dir):
    ptype = dict(
        _raw(sf_dir, "SELECT p_partkey, p_type FROM read_parquet('{D}/part.parquet')")
    )
    promo = total = n = 0
    for pk, p, d, sd in _raw(
        sf_dir,
        "SELECT l_partkey, l_extendedprice, l_discount, CAST(l_shipdate AS VARCHAR)"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if not ("1997-06-01" <= sd < "1997-07-01") or pk not in ptype:
            continue
        v = _q_half_away(float(p) * (1 - float(d)), 10_000)
        total += v
        n += 1
        if ptype[pk].startswith("TYPE_1"):
            promo += v
    want = float(promo) * 100.0 / float(total)
    [r] = all_queries()["q14_promo_revenue"](spark, sf_dir).collect()
    assert (r["promo_pct"], r["n"]) == (want, n)


def test_q19_disjunctive_matches_predicate_fold(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.functions.numeric import PRICE_SCALE

    part = {
        pk: (b, s)
        for pk, b, s in _raw(
            sf_dir,
            "SELECT p_partkey, p_brand, p_size FROM read_parquet('{D}/part.parquet')",
        )
    }
    rev = n = 0
    for pk, q, p, d in _raw(
        sf_dir,
        "SELECT l_partkey, l_quantity, l_extendedprice, l_discount"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if pk not in part:
            continue
        b, s = part[pk]
        q = float(q)
        if (
            (b == "Brand#1" and 1 <= s <= 15 and q >= 5)
            or (b == "Brand#2" and 10 <= s <= 30 and q >= 10)
            or (b == "Brand#3" and 20 <= s <= 50 and q >= 20)
        ):
            rev += _q_half_away(float(p) * (1 - float(d)), PRICE_SCALE)
            n += 1
    [r] = all_queries()["q19_disjunctive_predicates"](spark, sf_dir).collect()
    assert (r["revenue"], r["n"]) == (float(rev) / float(PRICE_SCALE), n)


# --------------------------------------------------------------------------
# batch 24: set operators, JSON extraction, and the string battery
# (incl. a from-scratch Levenshtein DP)
# --------------------------------------------------------------------------


def test_setop_intersect_and_except_match_set_walks(spark, sf_dir):
    orders = _raw(
        sf_dir,
        "SELECT o_custkey, o_orderstatus FROM read_parquet('{D}/orders.parquet')",
    )
    f = {ck for ck, st in orders if st == "F"}
    o = {ck for ck, st in orders if st == "O"}
    custs = {
        ck for (ck,) in _raw(sf_dir, "SELECT c_custkey FROM read_parquet('{D}/customer.parquet')")
    }
    got_i = {
        r["custkey"]
        for r in all_queries()["setop_intersect"](spark, sf_dir).collect()
    }
    assert got_i == (f & o)
    got_e = {
        r["c_custkey"]
        for r in all_queries()["setop_except"](spark, sf_dir).collect()
    }
    assert got_e == custs - {ck for ck, _ in orders}


def test_json_extract_props_matches_json_walk(spark, sf_dir):
    import json as _json

    want: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for t, props in _raw(
        sf_dir, "SELECT event_type, props FROM read_parquet('{D}/events.parquet')"
    ):
        want[t][1] += 1
        k = _json.loads(props).get("k") if props else None
        if k is not None:
            want[t][0] += int(k)
    got = {
        r["event_type"]: [r["sum_k"], r["n"]]
        for r in all_queries()["json_extract_props"](spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in want.items()}


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_string_battery_matches_str_walk(spark, sf_dir):
    """The 14-function string menu replayed with Python str/re, incl. a
    from-scratch Levenshtein DP."""
    want = {}
    for pk, nm, br, tp, sz in _raw(
        sf_dir,
        "SELECT p_partkey, p_name, p_brand, p_type, p_size"
        " FROM read_parquet('{D}/part.parquet') WHERE p_partkey % 20 = 0",
    ):
        m = _re.search(r"([a-z]+)", nm)
        want[pk] = (
            nm.upper(),
            br.lower(),
            tp.strip(" "),
            nm[:5],
            len(nm),
            tp.replace(" ", "_"),
            f"{br}#{sz}",
            m.group(1) if m else "",
            _re.sub(r"[aeiou]", "", nm),
            nm.find("a") + 1,
            str(pk).zfill(8),
            br[::-1],
            _lev(br, "Brand#1"),
        )
    got = {
        r["p_partkey"]: (
            r["name_upper"],
            r["brand_lower"],
            r["type_trim"],
            r["name_prefix"],
            r["name_len"],
            r["type_snake"],
            r["brand_size"],
            r["first_word"],
            r["name_novowels"],
            r["first_a"],
            r["padded_key"],
            r["brand_rev"],
            r["brand_dist"],
        )
        for r in all_queries()["string_battery"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 25: the plain-join menu — outer/semi/anti/theta/lookup/enrichment
# as set and dict walks
# --------------------------------------------------------------------------


def test_join_full_outer_matches_set_reconciliation(spark, sf_dir):
    buyers = {
        ck
        for ck, st in _raw(
            sf_dir, "SELECT o_custkey, o_orderstatus FROM read_parquet('{D}/orders.parquet')"
        )
        if st == "F"
    }
    rich = {
        ck
        for ck, b in _raw(
            sf_dir, "SELECT c_custkey, c_acctbal FROM read_parquet('{D}/customer.parquet')"
        )
        if float(b) > 9000
    }
    want = {}
    for side, n in (
        ("both", len(buyers & rich)),
        ("buyer_only", len(buyers - rich)),
        ("rich_only", len(rich - buyers)),
    ):
        if n:
            want[side] = n
    got = {
        r["side"]: r["n"]
        for r in all_queries()["join_full_outer"](spark, sf_dir).collect()
    }
    assert got == want


def test_join_semi_and_anti_match_exists_walks(spark, sf_dir):
    orders = _raw(
        sf_dir,
        "SELECT o_orderkey, o_custkey, o_orderpriority, CAST(o_orderdate AS VARCHAR)"
        " FROM read_parquet('{D}/orders.parquet')",
    )
    heavy = {
        ok
        for ok, q in _raw(
            sf_dir, "SELECT l_orderkey, l_quantity FROM read_parquet('{D}/lineitem.parquet')"
        )
        if float(q) > 45
    }
    want_semi: dict[str, int] = defaultdict(int)
    for ok, _, pr, _ in orders:
        if ok in heavy:
            want_semi[pr] += 1
    got_semi = {
        r["o_orderpriority"]: r["n_orders"]
        for r in all_queries()["join_semi_exists"](spark, sf_dir).collect()
    }
    assert got_semi == dict(want_semi)

    active_1995 = {
        ck for _, ck, _, d in orders if "1995-01-01" <= d < "1996-01-01"
    }
    want_anti: dict[str, int] = defaultdict(int)
    for ck, seg in _raw(
        sf_dir, "SELECT c_custkey, c_mktsegment FROM read_parquet('{D}/customer.parquet')"
    ):
        if ck not in active_1995:
            want_anti[seg] += 1
    got_anti = {
        r["c_mktsegment"]: r["n_customers"]
        for r in all_queries()["join_anti_not_exists"](spark, sf_dir).collect()
    }
    assert got_anti == dict(want_anti)


def test_join_range_nonequi_matches_theta_scan(spark, sf_dir):
    parts = [
        (int(s), float(p))
        for s, p in _raw(
            sf_dir,
            "SELECT p_size, p_retailprice FROM read_parquet('{D}/part.parquet')"
            " WHERE p_size <= 5",
        )
    ]
    bals = [
        float(b)
        for (b,) in _raw(
            sf_dir, "SELECT s_acctbal FROM read_parquet('{D}/supplier.parquet')"
        )
    ]
    want: dict[int, int] = defaultdict(int)
    for size, price in parts:
        thresh = price / 100.0
        want[size] += sum(1 for b in bals if b > thresh)
    got = {
        r["size_class"]: r["n_pairs"]
        for r in all_queries()["join_range_nonequi"](spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in want.items() if v}


def test_join_broadcast_lookup_fallback_matches_coalesce(spark, sf_dir):
    regions = {
        rk: rn
        for rk, rn in _raw(
            sf_dir, "SELECT r_regionkey, r_name FROM read_parquet('{D}/region.parquet')"
        )
        if rk != 0
    }
    want: dict[str, int] = defaultdict(int)
    for (nk,) in _raw(
        sf_dir, "SELECT n_regionkey FROM read_parquet('{D}/nation.parquet')"
    ):
        want[regions.get(nk, str(nk))] += 1
    got = {
        r["region_label"]: r["n_nations"]
        for r in all_queries()["join_broadcast_lookup_fallback"](spark, sf_dir).collect()
    }
    assert got == dict(want)


def test_join_events_enrichment_matches_dim_fold(spark, sf_dir):
    seg = dict(
        _raw(
            sf_dir,
            "SELECT c_custkey, c_mktsegment FROM read_parquet('{D}/customer.parquet')",
        )
    )
    want: dict = defaultdict(lambda: [0, 0])
    for u, _, _, t, v in _ev_rows(sf_dir):
        if u in seg:
            k = (seg[u], t)
            want[k][0] += 1
            want[k][1] += _q_half_away(v, 1_000_000)
    wexp = {k: (n, float(s) / 1_000_000.0) for k, (n, s) in want.items()}
    got = {
        (r["c_mktsegment"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in all_queries()["join_events_enrichment"](spark, sf_dir).collect()
    }
    assert got == wexp


# --------------------------------------------------------------------------
# batch 26: more grouping/aggregation shapes
# --------------------------------------------------------------------------


def test_agg_grouping_sets_matches_two_folds(spark, sf_dir):
    rows = [
        (st, pr, _q_half_away(float(p), 100))
        for st, pr, p in _raw(
            sf_dir,
            "SELECT o_orderstatus, o_orderpriority, o_totalprice"
            " FROM read_parquet('{D}/orders.parquet')",
        )
    ]
    want: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for st, pr, pc in rows:
        for key in ((st, None), (None, pr)):
            want[key][0] += 1
            want[key][1] += pc
    wexp = {
        k: (n, (float(s) / float(n)) / 100.0) for k, (n, s) in want.items()
    }
    got = {
        (r["o_orderstatus"], r["o_orderpriority"]): (r["n"], r["avg_price"])
        for r in all_queries()["agg_grouping_sets"](spark, sf_dir).collect()
    }
    assert got == wexp


def test_agg_pivot_status_matches_conditional_fold(spark, sf_dir):
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for f, s, q in _raw(
        sf_dir,
        "SELECT l_returnflag, l_linestatus, l_quantity"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        qc = _q_half_away(float(q), 100)
        a = want[f]
        if s == "O":
            a[0] += qc
            a[2] += 1
        else:
            a[1] += qc if s == "F" else 0
            a[3] += 1 if s == "F" else 0
    wexp = {
        f: (float(o) / 100.0, float(fl) / 100.0, no, nf)
        for f, (o, fl, no, nf) in want.items()
    }
    got = {
        r["l_returnflag"]: (r["qty_open"], r["qty_filled"], r["n_open"], r["n_filled"])
        for r in all_queries()["agg_pivot_status"](spark, sf_dir).collect()
    }
    assert got == wexp


def test_agg_weighted_median_matches_crossing_walk(spark, sf_dir):
    rows = sorted(
        (_q_half_away(float(p), 100), int(q))
        for p, q in _raw(
            sf_dir,
            "SELECT l_extendedprice, l_quantity FROM read_parquet('{D}/lineitem.parquet')",
        )
    )
    total_w = sum(w for _, w in rows)
    target = (total_w + 1) // 2
    cum = 0
    for v, w in rows:
        cum += w
        if cum >= target:
            med = v
            break
    [r] = all_queries()["agg_weighted_median"](spark, sf_dir).collect()
    assert (r["n_rows"], r["total_w"], r["weighted_median_cents"]) == (
        len(rows),
        total_w,
        med,
    )


def test_agg_distinct_counts_match_set_fold(spark, sf_dir):
    per: dict[str, dict] = defaultdict(
        lambda: {"ok": set(), "pk": set(), "ln": 0, "mn": None, "mx": None}
    )
    for f, ok, pk, ln, p in _raw(
        sf_dir,
        "SELECT l_returnflag, l_orderkey, l_partkey, l_linenumber, l_extendedprice"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        a = per[f]
        a["ok"].add(ok)
        a["pk"].add(pk)
        a["ln"] += int(ln)
        p = float(p)
        a["mn"] = p if a["mn"] is None else min(a["mn"], p)
        a["mx"] = p if a["mx"] is None else max(a["mx"], p)
    want = {
        f: (
            len(a["ok"]),
            len(a["pk"]),
            a["ln"],
            _round_dec(a["mn"], 2),
            _round_dec(a["mx"], 2),
        )
        for f, a in per.items()
    }
    got = {
        r["l_returnflag"]: (
            r["n_orders"],
            r["n_parts"],
            r["sum_lines"],
            r["min_price"],
            r["max_price"],
        )
        for r in all_queries()["agg_distinct_counts"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 27: scalar batteries — math functions, positional explode, MapType
# probing vs math/list/dict walks
# --------------------------------------------------------------------------


def test_math_battery_matches_math_walk(spark, sf_dir):
    """The 12-function math menu replayed with the math module (IEEE
    sqrt; ln/log10 same libm inputs both engines already hash-agree on),
    each rounded with the engines' HALF_UP."""
    want = {}
    for ok, ln_, q, p, d, t in _raw(
        sf_dir,
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,"
        " l_discount, l_tax FROM read_parquet('{D}/lineitem.parquet')"
        " WHERE l_orderkey % 500 = 0",
    ):
        q, p, d, t = float(q), float(p), float(d), float(t)
        want[(ok, ln_)] = (
            _round_dec(abs(p - 30000), 2),
            math.ceil(q),
            math.floor(q),
            _round_dec(math.sqrt(p), 4),
            _round_dec(math.log(p + 1), 4),
            _round_dec(math.log10(p + 1), 4),
            _round_dec((1 + d) ** 2, 6),
            ok % 7,
            _round_dec(max(d, t), 2),
            _round_dec(min(d, t), 2),
            float((d - 0.05 > 0) - (d - 0.05 < 0)),
        )
    got = {
        (r["l_orderkey"], r["l_linenumber"]): (
            r["abs_dev"],
            r["qty_ceil"],
            r["qty_floor"],
            r["price_sqrt"],
            r["price_ln"],
            r["price_log10"],
            r["disc_sq"],
            r["key_mod7"],
            r["max_rate"],
            r["min_rate"],
            r["disc_sign"],
        )
        for r in all_queries()["math_battery"](spark, sf_dir).collect()
    }
    assert got == want


def test_array_posexplode_matches_enumerate(spark, sf_dir):
    want = {}
    for did, text, _ in _docs(sf_dir):
        if did % 100 == 0:
            for pos, tok in enumerate(_toks_py(text), start=1):
                want[(did, pos)] = tok
    got = {
        (r["doc_id"], r["pos"]): r["token"]
        for r in all_queries()["array_posexplode"](spark, sf_dir).collect()
    }
    assert got == want


def test_map_functions_battery_matches_dict_probe(spark, sf_dir):
    n: dict[str, int] = defaultdict(int)
    users: dict[str, set[int]] = defaultdict(set)
    for u, _, _, t, _ in _ev_rows(sf_dir):
        n[t] += 1
        users[t].add(u)
    want = {t: (n[t], len(users[t]), 2) for t in n}
    got = {
        r["event_type"]: (r["n"], r["users"], r["n_keys"])
        for r in all_queries()["map_functions_battery"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 28: the date kit and the deterministic corpus split
# --------------------------------------------------------------------------


def test_date_battery_matches_calendar_walk(spark, sf_dir):
    """P10-P15 date kit via the calendar module: truncation, month
    arithmetic, last-day, components, day diffs, ISO formatting."""
    import calendar
    from datetime import date

    want = {}
    for ok, d in _raw(
        sf_dir,
        "SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR)"
        " FROM read_parquet('{D}/orders.parquet') WHERE o_orderkey % 100 = 0",
    ):
        dt = date.fromisoformat(d)
        month_start = dt.replace(day=1)
        ny, nm = (dt.year + 1, 1) if dt.month == 12 else (dt.year, dt.month + 1)
        next_month = date(ny, nm, 1)
        month_end = dt.replace(day=calendar.monthrange(dt.year, dt.month)[1])
        want[ok] = (
            d,
            month_start.isoformat(),
            next_month.isoformat(),
            month_end.isoformat(),
            dt.year,
            dt.month,
            (dt - date(1995, 1, 1)).days,
            d,
        )
    got = {
        r["o_orderkey"]: (
            r["order_date"],
            r["month_start"],
            r["next_month"],
            r["month_end"],
            r["order_year"],
            r["order_month"],
            r["days_since_epoch_start"],
            r["iso_date"],
        )
        for r in all_queries()["date_battery"](spark, sf_dir).collect()
    }
    assert got == want


def test_date_month_ranges_matches_spine_walk(spark, sf_dir):
    """The month spine: first-of-month steps from the data's min month to
    its max date, each month clamped to the data's end."""
    import calendar
    from datetime import date

    ds = [
        date.fromisoformat(d)
        for (d,) in _raw(
            sf_dir,
            "SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR)"
            " FROM read_parquet('{D}/orders.parquet')",
        )
    ]
    lo, hi = min(ds).replace(day=1), max(ds)
    want = set()
    cur = lo
    while cur <= hi:
        month_end = cur.replace(day=calendar.monthrange(cur.year, cur.month)[1])
        want.add((cur.isoformat(), min(month_end, hi).isoformat()))
        ny, nm = (cur.year + 1, 1) if cur.month == 12 else (cur.year, cur.month + 1)
        cur = date(ny, nm, 1)
    got = {
        (r["month_start"], r["month_end"])
        for r in all_queries()["date_month_ranges"](spark, sf_dir).collect()
    }
    assert got == want


def test_llm_train_val_test_split_matches_hash_walk(spark, sf_dir):
    """The leakage-proof deterministic split: Fibonacci-hash slots, the
    train/val/test percent bands, per-(source, split) rollups with the
    id-sum integrity column."""
    from tmdb_movie_data_pipeline_spark.operators.llm_prep import (
        _SPLIT_KNUTH,
        _SPLIT_MASK,
        _SPLIT_MOD,
        _SPLIT_TRAIN_PCT,
        _SPLIT_VAL_PCT,
    )

    cells: dict = defaultdict(lambda: [0, 0, 0])
    totals: dict[str, int] = defaultdict(int)
    for did, src, n_chars in _raw(
        sf_dir,
        "SELECT doc_id, source, length(text) FROM read_parquet('{D}/documents.parquet')",
    ):
        slot = ((did % _SPLIT_MASK) * _SPLIT_KNUTH) % _SPLIT_MOD % 100
        split = (
            "train"
            if slot < _SPLIT_TRAIN_PCT
            else "val"
            if slot < _SPLIT_TRAIN_PCT + _SPLIT_VAL_PCT
            else "test"
        )
        a = cells[(src, split)]
        a[0] += 1
        a[1] += did
        a[2] += int(n_chars)
        totals[src] += 1
    want = {
        k: (n, sid, nc, float(n) / float(totals[k[0]]))
        for k, (n, sid, nc) in cells.items()
    }
    got = {
        (r["source"], r["split"]): (r["n_docs"], r["sum_doc_id"], r["n_chars"], r["share"])
        for r in all_queries()["llm_train_val_test_split"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 29: LLM-prep composites — keep-canonical accounting, DPO pairs,
# chat-template rendering
# --------------------------------------------------------------------------


def test_llm_dedup_keep_canonical_matches_component_walk(spark, sf_dir):
    """The near-dup pipeline's final act: BFS components over the staged
    pair graph, non-minimum members drop, per-source accounting."""
    adj = _dup_adj(spark, sf_dir)
    dropped: set[int] = set()
    seen: set[int] = set()
    for v in adj:
        if v in seen:
            continue
        comp = {v}
        frontier = {v}
        while frontier:
            frontier = {u for x in frontier for u in adj[x]} - comp
            comp |= frontier
        seen |= comp
        dropped |= comp - {min(comp)}
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    con = duckdb.connect()
    for did, src in con.execute(
        f"SELECT doc_id, source FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall():
        a = want[src]
        a[0] += 1
        if did in dropped:
            a[2] += 1
        else:
            a[1] += 1
    con.close()
    got = {
        r["source"]: [r["n_docs"], r["n_kept"], r["n_dropped"]]
        for r in all_queries()["llm_dedup_keep_canonical"](spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in want.items()}


def test_llm_dpo_pairs_match_extreme_walk(spark, sf_dir):
    """One (chosen, rejected) pair per (source, lang) group: the length-
    reward extremes with doc_id tie-breaks, distinct-pair and margin
    floors."""
    groups: dict[tuple[str, str], list[tuple[int, int]]] = defaultdict(list)
    con = duckdb.connect()
    for did, src, lang, nc in con.execute(
        f"SELECT doc_id, source, lang, n_chars FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall():
        groups[(src, lang)].append((int(nc), int(did)))
    con.close()
    want = {}
    for key, rows in groups.items():
        best = min(rows, key=lambda t: (-t[0], t[1]))
        worst = min(rows, key=lambda t: (t[0], t[1]))
        if best[1] != worst[1] and best[0] - worst[0] >= 1:
            want[key] = (best[1], worst[1], best[0] - worst[0])
    got = {
        (r["source"], r["lang"]): (
            r["chosen_doc_id"],
            r["rejected_doc_id"],
            r["reward_gap"],
        )
        for r in all_queries()["llm_dpo_pair_builder"](spark, sf_dir).collect()
    }
    assert got == want


def test_llm_chat_template_matches_render_walk(spark, sf_dir):
    """SFT chat assembly: the fixed special-token template rendered in
    Python and md5-pinned, with the loss-mask token accounting."""
    import hashlib

    from tmdb_movie_data_pipeline_spark.operators.llm_prep import (
        _CHAT_PROMPT_TOKENS,
        _CHAT_SYS,
    )

    want = {}
    for did, text, _ in _docs(sf_dir):
        toks = _toks_py(text)
        user = " ".join(toks[:_CHAT_PROMPT_TOKENS])
        asst = " ".join(toks[_CHAT_PROMPT_TOKENS:])
        pt = min(len(toks), _CHAT_PROMPT_TOKENS)
        rt = max(len(toks) - _CHAT_PROMPT_TOKENS, 0)
        rendered = f"<|system|>{_CHAT_SYS}<|user|>{user}<|assistant|>{asst}<|end|>"
        want[did] = (
            pt,
            rt,
            hashlib.md5(rendered.encode()).hexdigest(),
            0 if pt + rt == 0 else (1_000_000 * rt) // (pt + rt),
        )
    got = {
        r["doc_id"]: (
            r["prompt_tokens"],
            r["response_tokens"],
            r["rendered_md5"],
            r["trained_ratio_ppm"],
        )
        for r in all_queries()["llm_chat_template_render"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 30: SCD2 intervals, subquery shapes, global top-n, bucketing,
# bitwise scalars
# --------------------------------------------------------------------------


def test_scd2_user_value_history_matches_lead_walk(spark, sf_dir):
    """SCD2 intervals over the purchase stream: validity from each change
    to the next under the (ts, value) order, open-ended current rows."""
    per: dict[int, list] = defaultdict(list)
    for u, _, us, t, v in _ev_rows(sf_dir):
        if t == "purchase":
            per[u].append((us, _round_dec(v, 4)))
    want = {}
    for u, rows in per.items():
        rows.sort()
        for i, (us, v) in enumerate(rows):
            nxt = rows[i + 1][0] if i + 1 < len(rows) else None
            want[(u, us)] = (v, nxt, nxt is None)
    got = {
        (r["user_id"], r["valid_from_us"]): (
            r["value"],
            r["valid_to_us"],
            r["is_current"],
        )
        for r in all_queries()["scd2_user_value_history"](spark, sf_dir).collect()
    }
    assert got == want


def test_subq_in_filter_matches_membership(spark, sf_dir):
    big = {
        ck
        for ck, p in _raw(
            sf_dir,
            "SELECT o_custkey, o_totalprice FROM read_parquet('{D}/orders.parquet')",
        )
        if float(p) > 150_000
    }
    want: dict[str, int] = defaultdict(int)
    for ck, seg in _raw(
        sf_dir, "SELECT c_custkey, c_mktsegment FROM read_parquet('{D}/customer.parquet')"
    ):
        if ck in big:
            want[seg] += 1
    got = {
        r["c_mktsegment"]: r["n"]
        for r in all_queries()["subq_in_filter"](spark, sf_dir).collect()
    }
    assert got == dict(want)


def test_sort_global_topn_matches_heap_walk(spark, sf_dir):
    rows = [
        (ok, float(p), pr)
        for ok, p, pr in _raw(
            sf_dir,
            "SELECT o_orderkey, o_totalprice, o_orderpriority"
            " FROM read_parquet('{D}/orders.parquet')",
        )
    ]
    top = sorted(rows, key=lambda t: (-t[1], t[0]))[:25]
    want = {ok: (_round_dec(p, 2), pr) for ok, p, pr in top}
    got = {
        r["o_orderkey"]: (r["totalprice"], r["o_orderpriority"])
        for r in all_queries()["sort_global_topn"](spark, sf_dir).collect()
    }
    assert got == want


def test_conditional_bucketing_matches_case_walk(spark, sf_dir):
    want: dict = defaultdict(lambda: [0, 0])
    for b, nk in _raw(
        sf_dir,
        "SELECT c_acctbal, c_nationkey FROM read_parquet('{D}/customer.parquet')",
    ):
        b = float(b)
        bucket = (
            "debt" if b < 0 else "low" if b < 5000 else "mid" if b < 9000 else "high"
        )
        path = f"nation/{nk}" if nk is not None else None
        a = want[(bucket, path)]
        a[0] += 1
        a[1] += _q_half_away(b, 100)
    wexp = {k: (n, (float(s) / float(n)) / 100.0) for k, (n, s) in want.items()}
    got = {
        (r["bal_bucket"], r["nation_path"]): (r["n"], r["avg_bal"])
        for r in all_queries()["conditional_bucketing"](spark, sf_dir).collect()
    }
    assert got == wexp


def test_bitwise_battery_matches_int_ops(spark, sf_dir):
    want = {}
    for (ok,) in _raw(
        sf_dir,
        "SELECT o_orderkey FROM read_parquet('{D}/orders.parquet')"
        " WHERE o_orderkey % 50 = 0",
    ):
        want[ok] = (
            ok & 255,
            ok | 4096,
            ok ^ 21845,
            ok << 3,
            ok >> 2,
            bin(ok).count("1"),
        )
    got = {
        r["o_orderkey"]: (
            r["and_mask"],
            r["or_flag"],
            r["xor_pat"],
            r["shl3"],
            r["shr2"],
            r["popcount"],
        )
        for r in all_queries()["bitwise_battery"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 31: the reference-parity flagship, the constraint audit, and the
# recursive month spine
# --------------------------------------------------------------------------


def test_movie_normalize_matches_reference_semantics(spark, sf_dir):
    """The original reference pipeline's normalize (P1-P7), replayed from
    the fixture rows in plain Python: genre-map lookup with str(id)
    fallback, pipe join ('' for null/empty lists), the conditional poster
    URL (None for null AND empty-string paths)."""
    from tmdb_movie_data_pipeline_spark.operators.normalize import (
        _FIXTURE_ROWS,
        _GENRE_MAP,
        _IMAGE_BASE,
        _POSTER_SIZE,
    )

    want = {}
    for (mid, title, ot, rd, gids, va, vc, pop, lang, ov, poster) in _FIXTURE_ROWS:
        genres = (
            ""
            if not gids
            else "|".join(_GENRE_MAP.get(g, str(g)) for g in gids)
        )
        url = (
            f"{_IMAGE_BASE}{_POSTER_SIZE}{poster}" if poster else None
        )
        want[mid] = (title, ot, rd, genres, va, vc, pop, lang, ov, url)
    got = {
        r["tmdb_id"]: (
            r["title"],
            r["original_title"],
            r["release_date"],
            r["genres"],
            r["vote_average"],
            r["vote_count"],
            r["popularity"],
            r["original_language"],
            r["overview"],
            r["poster_url"],
        )
        for r in all_queries()["movie_normalize"](spark, sf_dir).collect()
    }
    assert got == want


def test_quality_constraint_audit_matches_rule_counts(spark, sf_dir):
    rows = _raw(
        sf_dir,
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,"
        " l_discount, CAST(l_shipdate AS VARCHAR)"
        " FROM read_parquet('{D}/lineitem.parquet')",
    )
    n = len(rows)
    qty = sum(1 for r in rows if not (1 <= float(r[2]) <= 50))
    price = sum(1 for r in rows if float(r[3]) <= 0)
    disc = sum(1 for r in rows if not (0 <= float(r[4]) <= 1))
    ship = sum(1 for r in rows if r[5] is None)
    pk: dict[tuple[int, int], int] = defaultdict(int)
    for r in rows:
        pk[(r[0], r[1])] += 1
    dup = sum(c - 1 for c in pk.values() if c > 1)
    want = {
        "quantity_in_1_50": qty,
        "price_positive": price,
        "discount_in_0_1": disc,
        "shipdate_not_null": ship,
        "pk_unique": dup,
    }
    got = {
        r["rule"]: r["n_violations"]
        for r in all_queries()["quality_constraint_audit"](spark, sf_dir).collect()
    }
    assert got == want
    assert all(
        r["n_rows"] == n
        for r in all_queries()["quality_constraint_audit"](spark, sf_dir).collect()
    )


def test_recursive_month_spine_matches_calendar_fold(spark, sf_dir):
    """The recursive CTE spine: every month from 1995-01 through 2002-03
    present (zeros beyond the data edge), order counts by month."""
    from datetime import date

    counts: dict[str, int] = defaultdict(int)
    for (d,) in _raw(
        sf_dir,
        "SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR)"
        " FROM read_parquet('{D}/orders.parquet')",
    ):
        counts[d[:7]] += 1
    want = {}
    cur = date(1995, 1, 1)
    while cur <= date(2002, 3, 1):
        ym = cur.isoformat()[:7]
        want[ym] = counts.get(ym, 0)
        ny, nm = (cur.year + 1, 1) if cur.month == 12 else (cur.year, cur.month + 1)
        cur = date(ny, nm, 1)
    got = {
        r["ym"]: r["n_orders"]
        for r in all_queries()["recursive_month_spine"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 32: exact-moment statistics, bitmap distincts, grouped quartiles
# --------------------------------------------------------------------------


def test_agg_stats_exact_matches_power_sums(spark, sf_dir):
    """Variance/stddev/correlation from exact integer power sums, the
    final float expression replayed in the engines' order."""
    sums: dict[str, list[int]] = defaultdict(lambda: [0] * 6)
    for f, q, d in _raw(
        sf_dir,
        "SELECT l_returnflag, l_quantity, l_discount"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        x = _q_half_away(float(q), 100)
        y = _q_half_away(float(d), 10_000)
        a = sums[f]
        a[0] += 1
        a[1] += x
        a[2] += x * x
        a[3] += y
        a[4] += y * y
        a[5] += x * y
    want = {}
    for f, (n, sx, sxx, sy, syy, sxy) in sums.items():
        nf, sxf, sxxf = float(n), float(sx), float(sxx)
        syf, syyf, sxyf = float(sy), float(syy), float(sxy)
        var_q = (nf * sxxf - sxf * sxf) / (nf * float(n - 1)) / 10000.0
        std_q = math.sqrt((nf * sxxf - sxf * sxf) / (nf * float(n - 1))) / 100.0
        corr = (nf * sxyf - sxf * syf) / math.sqrt(
            (nf * sxxf - sxf * sxf) * (nf * syyf - syf * syf)
        )
        want[f] = (n, var_q, std_q, corr)
    got = {
        r["l_returnflag"]: (r["n"], r["var_qty"], r["stddev_qty"], r["corr_qty_disc"])
        for r in all_queries()["agg_stats_exact"](spark, sf_dir).collect()
    }
    assert got == want


def test_agg_bitmap_distinct_matches_word_walk(spark, sf_dir):
    """Exact bitmap distincts: 63-bit words keyed by id div 63, popcounts
    summed, next to the set-based exact count."""
    from tmdb_movie_data_pipeline_spark.operators.aggregates import _BM_WORD

    words: dict[tuple[str, int], int] = defaultdict(int)
    exact: dict[str, set[int]] = defaultdict(set)
    for u, _, _, t, _ in _ev_rows(sf_dir):
        words[(t, u // _BM_WORD)] |= 1 << (u % _BM_WORD)
        exact[t].add(u)
    bm: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for (t, _), wv in words.items():
        bm[t][0] += bin(wv).count("1")
        bm[t][1] += 1
    want = {t: (bm[t][0], len(exact[t]), bm[t][1]) for t in bm}
    for t, (nb, ne, _) in want.items():
        assert nb == ne  # the bitmap is EXACT, not approximate
    got = {
        r["event_type"]: (r["n_distinct_bitmap"], r["n_distinct_exact"], r["n_words"])
        for r in all_queries()["agg_bitmap_distinct"](spark, sf_dir).collect()
    }
    assert got == want


def test_agg_grouped_quartiles_match_rank_picks(spark, sf_dir):
    """p25/p50/p75 per group as sorted-list picks at k = (p*n+99)//100 —
    the engine's histogram-offset plan must land on the same rows."""
    from tmdb_movie_data_pipeline_spark.operators.aggregates import _QUARTILE_PCTS

    per: dict[str, list[int]] = defaultdict(list)
    for _, _, _, t, v in _ev_rows(sf_dir):
        per[t].append(_q_half_away(v, 100))
    want = {}
    for t, vs in per.items():
        vs.sort()
        n = len(vs)
        for p in _QUARTILE_PCTS:
            want[(t, p)] = (n, vs[(p * n + 99) // 100 - 1])
    got = {
        (r["event_type"], r["pct"]): (r["n"], r["value_cents"])
        for r in all_queries()["agg_grouped_quartiles"](spark, sf_dir).collect()
    }
    assert got == want
