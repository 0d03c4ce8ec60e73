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

from tmdb_movie_data_pipeline_spark.registry import all_queries

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
        for r in all_queries()["ann_ivf_filtered_topk"](spark, sf_dir).collect()
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
    for r in all_queries()["ann_ivf_filtered_topk"](spark, sf_dir).collect():
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
    for r in all_queries()["ann_ivf_filtered_topk"](spark, sf_dir).collect():
        q, v, c = r["query_id"], r["neighbor_id"], r["cosine"]
        if (q, v) in filt_exact:
            assert c == filt_exact[(q, v)], (q, v)
        else:
            # below the exact tier's top-k cut: the cosine itself must still
            # be the bit-exact explicit-chain value
            want = _dot_py(emb[q], emb[v]) / (norms[q] * norms[v])
            assert c == want, (q, v)


# --------------------------------------------------------------------------
# batch 2: DBSCAN rebuilt as a set walk (VERDICT r16 #5 names it: core
# counts, min-label components, border min-attach) — brute-force O(n²)
# neighborhoods, BFS components, never the engine's grid join, CC kernel,
# or its recursive-CTE oracle
# --------------------------------------------------------------------------


def _dbscan_points(sf_dir: str) -> dict[int, tuple[int, int]]:
    """pkey -> (x, y): the md5 plane projection rebuilt with hashlib."""
    import hashlib

    con = duckdb.connect()
    keys = [
        int(k)
        for (k,) in con.execute(
            f"SELECT c_custkey FROM read_parquet('{sf_dir}/customer.parquet')"
        ).fetchall()
    ]
    con.close()

    def coord(axis: str, k: int) -> int:
        h = hashlib.md5(f"{axis}_{k}".encode()).hexdigest()
        return int(h[:15], 16) % (1 << 20)

    return {k: (coord("sx", k), coord("sy", k)) for k in keys}


def _dbscan_python_walk(pts: dict[int, tuple[int, int]]):
    """(labels) where labels[pkey] = ('core'|'border'|'noise', cluster_id or
    None) — textbook DBSCAN made deterministic exactly as the operator's
    docstring specifies: cluster id = MIN core pkey of the component,
    border joins the MIN cluster id among its core neighbors."""
    from tmdb_movie_data_pipeline_spark.operators.spatial import (
        _DBSCAN_MINPTS,
        _R2,
    )

    keys = sorted(pts)
    nbrs: dict[int, set[int]] = {k: set() for k in keys}
    for i, a in enumerate(keys):
        ax, ay = pts[a]
        for b in keys[i + 1 :]:
            bx, by = pts[b]
            if (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= _R2:
                nbrs[a].add(b)
                nbrs[b].add(a)

    core = {k for k in keys if len(nbrs[k]) >= _DBSCAN_MINPTS}

    # min-label components over CORE-CORE edges via plain BFS
    cluster: dict[int, int] = {}
    seen: set[int] = set()
    for k in sorted(core):
        if k in seen:
            continue
        comp = {k}
        frontier = [k]
        seen.add(k)
        while frontier:
            u = frontier.pop()
            for w in nbrs[u]:
                if w in core and w not in seen:
                    seen.add(w)
                    comp.add(w)
                    frontier.append(w)
        label = min(comp)  # isolated core -> its own singleton cluster
        for u in comp:
            cluster[u] = label

    labels: dict[int, tuple[str, int | None]] = {}
    for k in keys:
        if k in core:
            labels[k] = ("core", cluster[k])
        else:
            core_nbr_labels = [cluster[w] for w in nbrs[k] if w in core]
            if core_nbr_labels:
                labels[k] = ("border", min(core_nbr_labels))
            else:
                labels[k] = ("noise", None)
    return labels


def test_dbscan_clusters_match_python_set_walk(spark, sf_dir):
    """spatial_dbscan_clusters vs the brute-force walk: every point's
    (role, cluster_id) must agree — core counts from O(n²) neighborhoods,
    components by BFS with min-pkey labels, borders attached to the min
    core-neighbor cluster, noise explicit with NULL id. At sf0.001 the
    density is sub-critical (the all-noise branch); sf0.01 exhibits real
    clusters — run under SPARK_GRAFT_TEST_SF_DIR to cover both."""
    pts = _dbscan_points(sf_dir)
    want = _dbscan_python_walk(pts)
    got = {
        r["custkey"]: (r["role"], r["cluster_id"])
        for r in all_queries()["spatial_dbscan_clusters"](spark, sf_dir).collect()
    }
    assert got == want


def test_dbscan_core_counts_match_python_neighborhoods(spark, sf_dir):
    """spatial_dbscan_core vs the same brute-force neighborhoods: exact
    per-point neighbor counts and the core verdict. Zero-neighbor points
    are absent by contract (the pair relation never sees them)."""
    from tmdb_movie_data_pipeline_spark.operators.spatial import (
        _DBSCAN_MINPTS,
        _R2,
    )

    pts = _dbscan_points(sf_dir)
    keys = sorted(pts)
    counts: dict[int, int] = {}
    for i, a in enumerate(keys):
        ax, ay = pts[a]
        for b in keys[i + 1 :]:
            bx, by = pts[b]
            if (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= _R2:
                counts[a] = counts.get(a, 0) + 1
                counts[b] = counts.get(b, 0) + 1
    want = {k: (n, n >= _DBSCAN_MINPTS) for k, n in counts.items()}
    got = {
        r["custkey"]: (r["n_neighbors"], r["is_core"])
        for r in all_queries()["spatial_dbscan_core"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 3: the ACID long-tail vs a plain-Python content ledger (VERDICT r16
# #5 names the family: deletion vectors, RESTORE, shallow clone, VACUUM
# retention — the r16 TxGroup ledger covered 2PC visibility only). The
# ledger is a dict of frozen row-sets folded through the op sequence with
# set algebra; the engine's reads (head AND per-version time travel) must
# equal it at every step.
# --------------------------------------------------------------------------


def _rows(df) -> set[tuple]:
    return {tuple(r) for r in df.collect()}


def test_acid_longtail_matches_python_content_ledger(spark, tmp_path):
    """DV delete → RESTORE → OPTIMIZE → shallow clone → VACUUM, replayed
    against set algebra: upsert = (cur − keys(src)) ∪ src; DV delete =
    cur − {lo ≤ k ≤ hi}; RESTORE v = ledger[v]; OPTIMIZE = identity;
    clone = source head then diverges copy-on-write; VACUUM reclaims
    exactly the files no retained version references (old snapshots whose
    files survive via a later RESTORE stay readable — the subtlety this
    pins)."""
    import pytest

    from tmdb_movie_data_pipeline_spark.plans.acid import TxTable

    def df_of(rows):
        return spark.createDataFrame(
            sorted(rows), "k long, name string, v double"
        )

    # v0: create
    ledger = {0: frozenset((k, f"n{k}", float(k) * 10) for k in range(1, 9))}
    t = TxTable.create(spark, str(tmp_path / "tbl"), df_of(ledger[0]))

    def check(versions=None):
        assert _rows(t.read()) == set(ledger[max(ledger)])
        for v in versions if versions is not None else ledger:
            assert _rows(t.read(v)) == set(ledger[v]), f"v{v} diverged"

    check()

    # v1: MERGE upsert (update k=2, insert k=9)
    src = {(2, "two", 2.5), (9, "nine", 9.5)}
    t.merge(df_of(src), "k")
    src_keys = {r[0] for r in src}
    ledger[1] = frozenset(
        {r for r in ledger[0] if r[0] not in src_keys} | src
    )
    check()

    # v2: merge-on-read DELETE via deletion vectors (3 <= k <= 5) — data
    # files untouched, the read subtracts positions
    v = t.delete_range_dv("k", 3, 5)
    assert v == 2
    ledger[2] = frozenset(r for r in ledger[1] if not (3 <= r[0] <= 5))
    check()
    # the MoR property itself: v2 references EXACTLY v1's data files
    assert t.manifest(2)["files"] == t.manifest(1)["files"]
    assert t.manifest(2).get("dvs")

    # v3: RESTORE to v1 — metadata-only re-head; the DV'd rows come back
    assert t.restore(1) == 3
    ledger[3] = ledger[1]
    check()
    assert t.manifest(3)["files"] == t.manifest(1)["files"]

    # v4: OPTIMIZE — logical identity
    assert t.optimize(target_files=1) == 4
    ledger[4] = ledger[3]
    check()

    # shallow clone: head content, zero data copied, then copy-on-write
    # divergence leaves the source untouched
    c = TxTable.shallow_clone(spark, str(tmp_path / "clone"), t)
    assert _rows(c.read()) == set(ledger[4])
    clone_src = {(1, "one!", 1.1), (50, "fifty", 50.0)}
    c.merge(df_of(clone_src), "k")
    clone_keys = {r[0] for r in clone_src}
    assert _rows(c.read()) == (
        {r for r in ledger[4] if r[0] not in clone_keys} | clone_src
    )
    check()  # source: every version still equals the ledger

    # VACUUM keep_latest=2 (grace 0): retained = {v3, v4}. v3 re-references
    # v1's files, so v0's files and v2's DV sidecar are the reclaim set —
    # v1 must STAY readable (its files live on through the RESTORE) while
    # v0 and v2 lose files. That asymmetry is the retention rule.
    # expected reclaim set by plain file-set algebra over the log: files
    # referenced by ANY version minus files referenced by a retained one
    def refs(v):
        m = t.manifest(v)
        return set(m["files"]) | set(m.get("dvs") or [])

    retained = refs(3) | refs(4)
    dead = (refs(0) | refs(1) | refs(2)) - retained
    rep = t.vacuum(keep_latest=2, grace_seconds=0.0)
    assert rep["n_deleted"] == len(dead), rep
    assert rep["n_kept"] == len(retained), rep
    check(versions=[1, 3, 4])  # v1 readable via v3's references
    for dead in (0, 2):
        with pytest.raises(Exception):
            t.read(dead).collect()
    # history stays auditable: manifests of vacuumed versions remain
    assert [m["version"] for m in t.history()][: 5] == [0, 1, 2, 3, 4]


# --------------------------------------------------------------------------
# batch 4: the Python DataSource quadrants (VERDICT r16 #5) — the corpus is
# a deterministic md5 chain, so every quadrant is checkable against a
# hashlib rebuild; the two WRITE quadrants are verified by a PLAIN-FILE
# walk (open/json over part files and manifests, never a Spark readback),
# beside test_sources.py's engine-level gates
# --------------------------------------------------------------------------


def _md5_corpus(n_pages: int, page_size: int) -> set[tuple]:
    import hashlib

    return {
        (rid, rid // page_size, hashlib.md5(str(rid).encode()).hexdigest())
        for rid in range(n_pages * page_size)
    }


def test_python_datasource_batch_read_matches_hashlib(spark, sf_dir):
    """Batch-read quadrant: rows produced inside per-page Python reader
    tasks arrive byte-identical — the whole corpus equals the hashlib
    rebuild, and the page column is the rid's page by integer division."""
    from tmdb_movie_data_pipeline_spark.sources.python_source import (
        PAGE_SIZE,
        PAGES,
    )

    got = {
        tuple(r)
        for r in all_queries()["source_python_datasource"](spark, sf_dir).collect()
    }
    assert got == _md5_corpus(PAGES, PAGE_SIZE)


def test_python_datasource_stream_read_matches_hashlib(spark, sf_dir):
    """Stream-read quadrant: the micro-batched corpus (one page per epoch,
    empty-batch termination) equals the same hashlib rebuild — no row lost
    or duplicated across the offset log."""
    from tmdb_movie_data_pipeline_spark.sources.python_source import (
        STREAM_PAGE_SIZE,
        STREAM_PAGES,
    )

    got = {
        tuple(r)
        for r in all_queries()["source_python_stream_scan"](spark, sf_dir).collect()
    }
    assert got == _md5_corpus(STREAM_PAGES, STREAM_PAGE_SIZE)


def test_python_datasource_batch_write_manifest_walk(spark, tmp_path):
    """Batch-write quadrant by plain-file walk: pipe the md5 corpus through
    the jsonl sink, then verify with open()/json ONLY — the _SUCCESS
    manifest lists exactly the part files on disk (no leaked tmp, no
    unmanifested part), its n_rows equals the physical line count, and the
    union of parsed lines is the hashlib corpus."""
    import json
    import os

    from tmdb_movie_data_pipeline_spark.sources.python_source import (
        _make_datasource,
        _make_write_datasource,
        PAGE_SIZE,
        PAGES,
    )

    spark.dataSource.register(_make_datasource())
    spark.dataSource.register(_make_write_datasource())
    out = str(tmp_path / "sink")
    (
        spark.read.format("paged_synthetic")
        .option("npages", PAGES)
        .option("pagesize", PAGE_SIZE)
        .load()
        .write.format("jsonl_batch_sink")
        .mode("append")
        .option("path", out)
        .save()
    )

    with open(os.path.join(out, "_SUCCESS")) as f:
        manifest = json.load(f)
    on_disk = {
        os.path.join(out, n)
        for n in os.listdir(out)
        if n.startswith("part-") and n.endswith(".jsonl")
    }
    assert set(manifest["files"]) == on_disk  # exact publication set
    assert not [n for n in os.listdir(out) if n.startswith(".tmp-")]  # no debris

    rows: set[tuple] = set()
    n_lines = 0
    for path in manifest["files"]:
        with open(path) as f:
            for line in f:
                d = json.loads(line)
                rows.add((d["id"], d["page"], d["payload"]))
                n_lines += 1
    assert manifest["n_rows"] == n_lines
    assert rows == _md5_corpus(PAGES, PAGE_SIZE)


def test_python_datasource_stream_write_manifest_walk(spark, tmp_path):
    """Stream-write quadrant by plain-file walk: source→sink loop, then
    open()/json over the per-epoch _batch manifests — every part file on
    disk belongs to exactly one epoch manifest, per-manifest n_rows equals
    its physical line count, and the union of all epochs is the hashlib
    corpus with zero overlap (the exactly-once publication contract,
    checked on the FILES rather than through a Spark readback)."""
    import json
    import os
    import tempfile

    from tmdb_movie_data_pipeline_spark.sources.python_source import (
        _make_stream_datasource,
        _make_stream_write_datasource,
        STREAM_PAGE_SIZE,
        STREAM_PAGES,
    )

    spark.dataSource.register(_make_stream_datasource())
    spark.dataSource.register(_make_stream_write_datasource())
    out = str(tmp_path / "streamsink")
    df = (
        spark.readStream.format("paged_synthetic_stream")
        .option("npages", STREAM_PAGES)
        .option("pagesize", STREAM_PAGE_SIZE)
        .load()
    )
    q = (
        df.writeStream.format("jsonl_stream_sink")
        .option("path", out)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="r17_walk_ckpt_")
        )
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    manifests = []
    for name in sorted(os.listdir(out)):
        if name.startswith("_batch-"):
            with open(os.path.join(out, name)) as f:
                manifests.append(json.load(f))
    assert manifests, "no epoch manifests published"

    claimed: list[str] = []
    rows: set[tuple] = set()
    total = 0
    for m in manifests:
        claimed.extend(m["files"])
        n_lines = 0
        for path in m["files"]:
            with open(path) as f:
                for line in f:
                    d = json.loads(line)
                    row = (d["id"], d["page"], d["payload"])
                    assert row not in rows, f"duplicate across epochs: {row}"
                    rows.add(row)
                    n_lines += 1
        assert m["n_rows"] == n_lines, m["batch"]
        total += n_lines
    assert len(claimed) == len(set(claimed))  # a part belongs to ONE epoch
    on_disk = {
        os.path.join(out, n)
        for n in os.listdir(out)
        if n.startswith("part-") and n.endswith(".jsonl")
    }
    assert set(claimed) == on_disk
    assert rows == _md5_corpus(STREAM_PAGES, STREAM_PAGE_SIZE)
    assert total == STREAM_PAGES * STREAM_PAGE_SIZE


# --------------------------------------------------------------------------
# batch 5: the TPC-H tail — the flagship shapes the r16 sweep left
# uncovered (q1/q3/q5/q12/q14/q19 were rebuilt there), each as a dict fold
# over raw pulls with the shared micro-unit quantization, never a SQL
# restatement
# --------------------------------------------------------------------------

from decimal import ROUND_HALF_UP, Decimal  # noqa: E402


def _raw(sf_dir: str, sql: str):
    con = duckdb.connect()
    out = con.execute(sql.replace("{D}", sf_dir)).fetchall()
    con.close()
    return out


def _q(x: float, scale: int) -> int:
    """CAST(ROUND(x * scale) AS BIGINT): Decimal HALF_UP = half-away."""
    return int(Decimal(x * scale).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _dt(s: str):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_q4_order_priority_matches_exists_walk(spark, sf_dir):
    """1997 orders with at least one line shipped > 60 days after the
    order date, counted per priority — EXISTS as a set membership test."""
    import datetime

    late_by_order: dict[int, bool] = {}
    ship = {}
    for ok, sd in _raw(
        sf_dir,
        "SELECT l_orderkey, CAST(l_shipdate AS VARCHAR)"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        ship.setdefault(ok, []).append(_dt(sd))
    counts: dict[str, int] = {}
    for ok, od, pr in _raw(
        sf_dir,
        "SELECT o_orderkey, CAST(o_orderdate AS VARCHAR), o_orderpriority"
        " FROM read_parquet('{D}/orders.parquet')",
    ):
        d = _dt(od)
        if not ("1997-01-01" <= od[:10] < "1998-01-01"):
            continue
        cutoff = d + datetime.timedelta(days=60)
        if any(s > cutoff for s in ship.get(ok, [])):
            counts[pr] = counts.get(pr, 0) + 1
    got = {
        (r["o_orderpriority"],): (r["order_count"],)
        for r in all_queries()["q4_order_priority"](spark, sf_dir).collect()
    }
    assert got == {(p,): (n,) for p, n in counts.items()}


def test_q6_forecast_revenue_matches_filtered_fold(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.functions.numeric import PRICE_SCALE

    total = n = 0
    for p, d, q, sd in _raw(
        sf_dir,
        "SELECT l_extendedprice, l_discount, l_quantity,"
        " CAST(l_shipdate AS VARCHAR) FROM read_parquet('{D}/lineitem.parquet')",
    ):
        p, d, q = float(p), float(d), float(q)
        if not ("1996-01-01" <= sd[:10] < "1997-01-01"):
            continue
        if not (0.05 <= d <= 0.07 and q < 24):
            continue
        total += _q(p * d, PRICE_SCALE)
        n += 1
    [r] = all_queries()["q6_forecast_revenue"](spark, sf_dir).collect()
    assert (r["revenue"], r["n_rows"]) == (float(total) / float(PRICE_SCALE), n)


def _nation_names(sf_dir: str) -> dict[int, str]:
    return {
        int(k): n
        for k, n in _raw(
            sf_dir,
            "SELECT n_nationkey, n_name FROM read_parquet('{D}/nation.parquet')",
        )
    }


def test_q7_volume_shipping_matches_pair_fold(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.functions.numeric import PRICE_SCALE

    nation = _nation_names(sf_dir)
    supp_nat = {
        int(s): nation[int(nk)]
        for s, nk in _raw(
            sf_dir,
            "SELECT s_suppkey, s_nationkey FROM read_parquet('{D}/supplier.parquet')",
        )
    }
    cust_nat = {
        int(c): nation[int(nk)]
        for c, nk in _raw(
            sf_dir,
            "SELECT c_custkey, c_nationkey FROM read_parquet('{D}/customer.parquet')",
        )
    }
    order_cust = {
        int(o): int(c)
        for o, c in _raw(
            sf_dir,
            "SELECT o_orderkey, o_custkey FROM read_parquet('{D}/orders.parquet')",
        )
    }
    acc: dict[tuple, int] = {}
    for ok, sk, p, d, sd in _raw(
        sf_dir,
        "SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount,"
        " CAST(l_shipdate AS VARCHAR) FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if sd[:10] < "1996-01-01":
            continue
        sn = supp_nat[int(sk)]
        cn = cust_nat[order_cust[int(ok)]]
        if not (
            (sn == "NATION_1" and cn == "NATION_2")
            or (sn == "NATION_2" and cn == "NATION_1")
        ):
            continue
        key = (sn, cn, int(sd[:4]))
        acc[key] = acc.get(key, 0) + _q(float(p) * (1 - float(d)), PRICE_SCALE)
    want = {k: float(v) / float(PRICE_SCALE) for k, v in acc.items()}
    got = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]): r["revenue"]
        for r in all_queries()["q7_volume_shipping"](spark, sf_dir).collect()
    }
    assert got == want


def test_q8_market_share_matches_ratio_fold(spark, sf_dir):
    nation = _nation_names(sf_dir)
    supp_nat = {
        int(s): nation[int(nk)]
        for s, nk in _raw(
            sf_dir,
            "SELECT s_suppkey, s_nationkey FROM read_parquet('{D}/supplier.parquet')",
        )
    }
    orders = {
        int(o): od
        for o, od in _raw(
            sf_dir,
            "SELECT o_orderkey, CAST(o_orderdate AS VARCHAR)"
            " FROM read_parquet('{D}/orders.parquet')",
        )
    }
    num: dict[int, int] = {}
    den: dict[int, int] = {}
    for ok, sk, p, d in _raw(
        sf_dir,
        "SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        od = orders[int(ok)]
        if od[:10] < "1996-01-01":
            continue
        y = int(od[:4])
        vol = _q(float(p) * (1 - float(d)), 10000)
        den[y] = den.get(y, 0) + vol
        if supp_nat[int(sk)] == "NATION_3":
            num[y] = num.get(y, 0) + vol
    want = {y: float(num.get(y, 0)) / float(den[y]) for y in den}
    got = {
        r["o_year"]: r["mkt_share"]
        for r in all_queries()["q8_market_share"](spark, sf_dir).collect()
    }
    assert got == want


def test_q9_product_profit_matches_join_fold(spark, sf_dir):
    nation = _nation_names(sf_dir)
    supp_nat = {
        int(s): nation[int(nk)]
        for s, nk in _raw(
            sf_dir,
            "SELECT s_suppkey, s_nationkey FROM read_parquet('{D}/supplier.parquet')",
        )
    }
    gear_retail = {
        int(pk): float(rp)
        for pk, nm, rp in _raw(
            sf_dir,
            "SELECT p_partkey, p_name, p_retailprice"
            " FROM read_parquet('{D}/part.parquet')",
        )
        if "gear" in nm
    }
    order_year = {
        int(o): int(od[:4])
        for o, od in _raw(
            sf_dir,
            "SELECT o_orderkey, CAST(o_orderdate AS VARCHAR)"
            " FROM read_parquet('{D}/orders.parquet')",
        )
    }
    acc: dict[tuple, int] = {}
    for ok, pk, sk, q, p, d in _raw(
        sf_dir,
        "SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice,"
        " l_discount FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if int(pk) not in gear_retail:
            continue
        key = (supp_nat[int(sk)], order_year[int(ok)])
        profit = float(p) * (1 - float(d)) - gear_retail[int(pk)] * 0.5 * float(q)
        acc[key] = acc.get(key, 0) + _q(profit, 100)
    want = {k: float(v) / 100.0 for k, v in acc.items()}
    got = {
        (r["nation"], r["o_year"]): r["profit"]
        for r in all_queries()["q9_product_profit"](spark, sf_dir).collect()
    }
    assert got == want


def test_q10_returned_items_matches_topn_fold(spark, sf_dir):
    nation = _nation_names(sf_dir)
    cust = {
        int(c): (nm, nation[int(nk)])
        for c, nm, nk in _raw(
            sf_dir,
            "SELECT c_custkey, c_name, c_nationkey"
            " FROM read_parquet('{D}/customer.parquet')",
        )
    }
    orders = {
        int(o): int(c)
        for o, c, od in _raw(
            sf_dir,
            "SELECT o_orderkey, o_custkey, CAST(o_orderdate AS VARCHAR)"
            " FROM read_parquet('{D}/orders.parquet')",
        )
        if od[:10] >= "1997-01-01"
    }
    acc: dict[int, int] = {}
    for ok, p, d, rf in _raw(
        sf_dir,
        "SELECT l_orderkey, l_extendedprice, l_discount, l_returnflag"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if rf != "R" or int(ok) not in orders:
            continue
        ck = orders[int(ok)]
        acc[ck] = acc.get(ck, 0) + _q(float(p) * (1 - float(d)), 10000)
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = {
        (ck, cust[ck][0], float(v) / 10000.0, cust[ck][1]) for ck, v in ranked
    }
    got = {
        (r["c_custkey"], r["c_name"], r["revenue"], r["n_name"])
        for r in all_queries()["q10_returned_items"](spark, sf_dir).collect()
    }
    assert got == want


def test_q11_important_stock_matches_threshold_fold(spark, sf_dir):
    low_nat_supp = {
        int(s)
        for s, nk in _raw(
            sf_dir,
            "SELECT s_suppkey, s_nationkey FROM read_parquet('{D}/supplier.parquet')",
        )
        if int(nk) < 5
    }
    acc: dict[int, int] = {}
    for pk, sk, p in _raw(
        sf_dir,
        "SELECT l_partkey, l_suppkey, l_extendedprice"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if int(sk) not in low_nat_supp:
            continue
        acc[int(pk)] = acc.get(int(pk), 0) + _q(float(p), 100)
    total = float(sum(acc.values()))
    want = {
        (pk, v) for pk, v in acc.items() if float(v) > total * 0.002
    }
    got = {
        (r["partkey"], r["value_cents"])
        for r in all_queries()["q11_important_stock"](spark, sf_dir).collect()
    }
    assert got == want


def test_q13_customer_distribution_matches_histogram(spark, sf_dir):
    per_cust: dict[int, int] = {
        int(c): 0
        for (c,) in _raw(
            sf_dir, "SELECT c_custkey FROM read_parquet('{D}/customer.parquet')"
        )
    }
    for (c,) in _raw(
        sf_dir, "SELECT o_custkey FROM read_parquet('{D}/orders.parquet')"
    ):
        if int(c) in per_cust:
            per_cust[int(c)] += 1
    hist: dict[int, int] = {}
    for n in per_cust.values():
        hist[n] = hist.get(n, 0) + 1
    got = {
        r["c_count"]: r["custdist"]
        for r in all_queries()["q13_customer_distribution"](spark, sf_dir).collect()
    }
    assert got == hist


def test_q2_min_cost_supplier_matches_argmax_walk(spark, sf_dir):
    """Correlated MAX subquery: per size-10 part, the supplier(s) whose
    acctbal equals the max among suppliers shipping that part."""
    size10 = {
        int(pk)
        for pk, sz in _raw(
            sf_dir,
            "SELECT p_partkey, p_size FROM read_parquet('{D}/part.parquet')",
        )
        if int(sz) == 10
    }
    bal = {
        int(s): float(b)
        for s, b in _raw(
            sf_dir,
            "SELECT s_suppkey, s_acctbal FROM read_parquet('{D}/supplier.parquet')",
        )
    }
    part_supps: dict[int, set[int]] = {}
    for pk, sk in _raw(
        sf_dir,
        "SELECT l_partkey, l_suppkey FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if int(pk) in size10:
            part_supps.setdefault(int(pk), set()).add(int(sk))
    want = set()
    for pk, supps in part_supps.items():
        mx = max(bal[s] for s in supps)
        for s in supps:
            if bal[s] == mx:
                r2 = float(
                    Decimal(bal[s]).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
                )
                want.add((pk, s, r2))
    got = {
        (r["p_partkey"], r["s_suppkey"], r["s_acctbal"])
        for r in all_queries()["q2_min_cost_supplier"](spark, sf_dir).collect()
    }
    assert got == want


def test_q15_top_supplier_matches_max_fold(spark, sf_dir):
    names = {
        int(s): nm
        for s, nm in _raw(
            sf_dir,
            "SELECT s_suppkey, s_name FROM read_parquet('{D}/supplier.parquet')",
        )
    }
    rev: dict[int, int] = {}
    for sk, p, d, sd in _raw(
        sf_dir,
        "SELECT l_suppkey, l_extendedprice, l_discount,"
        " CAST(l_shipdate AS VARCHAR) FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if not ("1997-01-01" <= sd[:10] < "1997-04-01"):
            continue
        rev[int(sk)] = rev.get(int(sk), 0) + _q(float(p) * (1 - float(d)), 10000)
    mx = max(rev.values())
    want = {(s, names[s], v) for s, v in rev.items() if v == mx}
    got = {
        (r["s_suppkey"], r["s_name"], r["total_rev"])
        for r in all_queries()["q15_top_supplier"](spark, sf_dir).collect()
    }
    assert got == want


def test_q16_parts_supplier_counts_matches_distinct_sets(spark, sf_dir):
    bad_supps = {
        int(s)
        for s, b in _raw(
            sf_dir,
            "SELECT s_suppkey, s_acctbal FROM read_parquet('{D}/supplier.parquet')",
        )
        if float(b) < 0
    }
    parts = {
        int(pk): (br, ty, int(sz))
        for pk, br, ty, sz in _raw(
            sf_dir,
            "SELECT p_partkey, p_brand, p_type, p_size"
            " FROM read_parquet('{D}/part.parquet')",
        )
        if br != "Brand#1" and int(sz) in (1, 4, 7, 10, 13)
    }
    supp_sets: dict[tuple, set[int]] = {}
    for pk, sk in _raw(
        sf_dir,
        "SELECT l_partkey, l_suppkey FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if int(pk) in parts and int(sk) not in bad_supps:
            supp_sets.setdefault(parts[int(pk)], set()).add(int(sk))
    want = {(br, ty, sz, len(s)) for (br, ty, sz), s in supp_sets.items()}
    got = {
        (r["p_brand"], r["p_type"], r["p_size"], r["supplier_cnt"])
        for r in all_queries()["q16_parts_supplier_counts"](spark, sf_dir).collect()
    }
    assert got == want


def test_q18_large_volume_orders_matches_having_fold(spark, sf_dir):
    order_cust = {
        int(o): int(c)
        for o, c in _raw(
            sf_dir,
            "SELECT o_orderkey, o_custkey FROM read_parquet('{D}/orders.parquet')",
        )
    }
    qty: dict[int, int] = {}
    for ok, q in _raw(
        sf_dir,
        "SELECT l_orderkey, l_quantity FROM read_parquet('{D}/lineitem.parquet')",
    ):
        qty[int(ok)] = qty.get(int(ok), 0) + _q(float(q), 100)
    want = {
        (ok, order_cust[ok], float(v) / 100.0)
        for ok, v in qty.items()
        if v > 150 * 100
    }
    got = {
        (r["o_orderkey"], r["o_custkey"], r["total_qty"])
        for r in all_queries()["q18_large_volume_orders"](spark, sf_dir).collect()
    }
    assert got == want


def test_q20_part_supply_chain_matches_threshold_set(spark, sf_dir):
    bolt_parts = {
        int(pk)
        for pk, nm in _raw(
            sf_dir,
            "SELECT p_partkey, p_name FROM read_parquet('{D}/part.parquet')",
        )
        if "bolt" in nm
    }
    names = {
        int(s): nm
        for s, nm in _raw(
            sf_dir,
            "SELECT s_suppkey, s_name FROM read_parquet('{D}/supplier.parquet')",
        )
    }
    qty: dict[int, int] = {}
    for pk, sk, q in _raw(
        sf_dir,
        "SELECT l_partkey, l_suppkey, l_quantity"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if int(pk) in bolt_parts:
            qty[int(sk)] = qty.get(int(sk), 0) + _q(float(q), 100)
    want = {(s, names[s]) for s, v in qty.items() if v > 50 * 100}
    got = {
        (r["s_suppkey"], r["s_name"])
        for r in all_queries()["q20_part_supply_chain"](spark, sf_dir).collect()
    }
    assert got == want


def test_q21_suppliers_kept_waiting_matches_blame_walk(spark, sf_dir):
    """The sole-late-supplier blame walk: count F-order lines late by >60
    days where another supplier participated in the order but NO other
    supplier was also late."""
    import datetime

    names = {
        int(s): nm
        for s, nm in _raw(
            sf_dir,
            "SELECT s_suppkey, s_name FROM read_parquet('{D}/supplier.parquet')",
        )
    }
    orders = {
        int(o): od
        for o, od, st in _raw(
            sf_dir,
            "SELECT o_orderkey, CAST(o_orderdate AS VARCHAR), o_orderstatus"
            " FROM read_parquet('{D}/orders.parquet')",
        )
        if st == "F"
    }
    lines: dict[int, list[tuple[int, str]]] = {}
    for ok, sk, sd in _raw(
        sf_dir,
        "SELECT l_orderkey, l_suppkey, CAST(l_shipdate AS VARCHAR)"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        lines.setdefault(int(ok), []).append((int(sk), sd))
    counts: dict[str, int] = {}
    for ok, od in orders.items():
        cutoff = _dt(od) + datetime.timedelta(days=60)
        ls = lines.get(ok, [])
        supps = {sk for sk, _ in ls}
        late_supps = {sk for sk, sd in ls if _dt(sd) > cutoff}
        for sk, sd in ls:
            if _dt(sd) <= cutoff:
                continue
            if not (supps - {sk}):  # no other supplier in the order
                continue
            if late_supps - {sk}:  # another supplier was ALSO late
                continue
            counts[names[sk]] = counts.get(names[sk], 0) + 1
    got = {
        r["s_name"]: r["numwait"]
        for r in all_queries()["q21_suppliers_kept_waiting"](spark, sf_dir).collect()
    }
    assert got == counts


def test_q22_global_sales_opportunity_matches_anti_fold(spark, sf_dir):
    cust = {
        int(c): (int(nk), _q(float(b), 100))
        for c, nk, b in _raw(
            sf_dir,
            "SELECT c_custkey, c_nationkey, c_acctbal"
            " FROM read_parquet('{D}/customer.parquet')",
        )
    }
    raw_bal = {
        int(c): float(b)
        for c, b in _raw(
            sf_dir,
            "SELECT c_custkey, c_acctbal FROM read_parquet('{D}/customer.parquet')",
        )
    }
    pos = [cents for c, (nk, cents) in cust.items() if raw_bal[c] > 0]
    avg_cents = float(sum(pos)) / float(len(pos))
    big_order_custs = {
        int(c)
        for c, tp in _raw(
            sf_dir,
            "SELECT o_custkey, o_totalprice FROM read_parquet('{D}/orders.parquet')",
        )
        if float(tp) > 480000
    }
    agg: dict[int, list[int]] = {}
    for c, (nk, cents) in cust.items():
        if float(cents) > avg_cents and c not in big_order_custs:
            a = agg.setdefault(nk, [0, 0])
            a[0] += 1
            a[1] += cents
    want = {(nk, a[0], a[1]) for nk, a in agg.items()}
    got = {
        (r["nationkey"], r["n_custs"], r["total_bal_cents"])
        for r in all_queries()["q22_global_sales_opportunity"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 6: the nonparametric/stratified stats shelf — doubled-midrank
# walks, integer ppm arithmetic, and closed-form float chains in the
# engines' exact operation order
# --------------------------------------------------------------------------


def _ar2(values: list[int]) -> dict[int, int]:
    """value -> doubled midrank: 2*RANK() + COUNT(v) - 1 (the integer form
    both engines share — rank = #(smaller) + 1)."""
    from collections import Counter

    cnt = Counter(values)
    smaller = 0
    out = {}
    for v in sorted(cnt):
        rank = smaller + 1
        out[v] = 2 * rank + cnt[v] - 1
        smaller += cnt[v]
    return out


def test_mann_whitney_matches_doubled_midranks(spark, sf_dir):
    pv = [
        (et, _q(float(v), 100))
        for et, v in _raw(
            sf_dir,
            "SELECT event_type, value FROM read_parquet('{D}/events.parquet')"
            " WHERE event_type IN ('purchase', 'view')",
        )
    ]
    ranks = _ar2([v for _, v in pv])
    n1 = sum(1 for et, _ in pv if et == "purchase")
    n2 = sum(1 for et, _ in pv if et == "view")
    two_r1 = sum(ranks[v] for et, v in pv if et == "purchase")
    [r] = all_queries()["stats_mann_whitney"](spark, sf_dir).collect()
    assert tuple(r) == (n1, n2, two_r1, two_r1 - n1 * (n1 + 1), n1 * n2)


def test_spearman_rho_matches_rank_walk(spark, sf_dir):
    daily: dict[str, list[int]] = {}
    for d, v in _raw(
        sf_dir,
        "SELECT CAST(CAST(ts AS DATE) AS VARCHAR), value"
        " FROM read_parquet('{D}/events.parquet') WHERE event_type = 'purchase'",
    ):
        a = daily.setdefault(d, [0, 0])
        a[0] += 1
        a[1] += _q(float(v), 100)
    xs = [a[0] for a in daily.values()]
    ys = [a[1] for a in daily.values()]
    rx, ry = _ar2(xs), _ar2(ys)
    n = len(daily)
    sum_d2 = sum((rx[a[0]] - ry[a[1]]) ** 2 for a in daily.values())
    rho_ppm = 1000000 - (1500000 * sum_d2) // (n * (n * n - 1))
    [r] = all_queries()["stats_spearman_rho"](spark, sf_dir).collect()
    assert tuple(r) == (n, sum_d2, rho_ppm)


def test_welch_t2_matches_integer_moments(spark, sf_dir):
    n1 = n2 = s1 = s2 = q1 = q2 = 0
    for et, v in _raw(
        sf_dir,
        "SELECT event_type, value FROM read_parquet('{D}/events.parquet')"
        " WHERE event_type IN ('purchase', 'view')",
    ):
        vi = _q(float(v), 1)
        if et == "purchase":
            n1 += 1
            s1 += vi
            q1 += vi * vi
        else:
            n2 += 1
            s2 += vi
            q2 += vi * vi
    num = s1 * n2 - s2 * n1
    t2_ppm = (1000000 * (num * num) * ((n1 - 1) * (n2 - 1))) // (
        (n1 * q1 - s1 * s1) * (n2 * n2 * (n2 - 1))
        + (n2 * q2 - s2 * s2) * (n1 * n1 * (n1 - 1))
    )
    [r] = all_queries()["stats_welch_t2"](spark, sf_dir).collect()
    assert tuple(r) == (n1, n2, num, t2_ppm)


def test_runs_test_matches_sign_walk(spark, sf_dir):
    daily: dict[tuple[str, str], int] = {}
    for et, d, v in _raw(
        sf_dir,
        "SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR), value"
        " FROM read_parquet('{D}/events.parquet')",
    ):
        daily[(et, d)] = daily.get((et, d), 0) + _q(float(v), 100)
    want = {}
    for et in {k[0] for k in daily}:
        days = sorted(d for e, d in daily if e == et)
        vs = [daily[(et, d)] for d in days]
        n, total = len(vs), sum(vs)
        above = [1 if v * n > total else 0 for v in vs]
        n_runs = sum(
            1 for i, a in enumerate(above) if i == 0 or above[i - 1] != a
        )
        want[et] = (n_runs, sum(above), n - sum(above))
    got = {
        r["event_type"]: (r["n_runs"], r["n_above"], r["n_below"])
        for r in all_queries()["stats_runs_test"](spark, sf_dir).collect()
    }
    assert got == want


def test_cochran_q_matches_block_walk(spark, sf_dir):
    cells: dict[tuple[int, str], int] = {}
    for u, et in _raw(
        sf_dir,
        "SELECT user_id, event_type FROM read_parquet('{D}/events.parquet')",
    ):
        key = (int(u) % 16, et)
        cells[key] = cells.get(key, 0) + 1
    types = sorted({et for _, et in cells})
    mc = sum(cells.values()) // (16 * len(types))
    x = {key: (1 if c > mc else 0) for key, c in cells.items()}
    # rows_ groups the CELLS relation, so only blocks present in cells count
    blocks = sorted({b for b, _ in cells})
    ri = {b: sum(x.get((b, t), 0) for t in types if (b, t) in x) for b in blocks}
    cj = {t: sum(x.get((b, t), 0) for b in blocks if (b, t) in x) for t in types}
    k = len(types)
    n_tot = sum(cj.values())
    sum_cj_sq = sum(v * v for v in cj.values())
    sum_ri = sum(ri.values())
    sum_ri_sq = sum(v * v for v in ri.values())
    if k * sum_ri == sum_ri_sq:
        q_ppm = 0
    else:
        q_ppm = (1000000 * (k - 1) * (k * sum_cj_sq - n_tot * n_tot)) // (
            k * sum_ri - sum_ri_sq
        )
    [r] = all_queries()["stats_cochran_q"](spark, sf_dir).collect()
    assert tuple(r) == (k, n_tot, q_ppm)


def test_hellinger_matches_sqrt_floor_terms(spark, sf_dir):
    c: dict[str, list[int]] = {}
    for u, et in _raw(
        sf_dir,
        "SELECT user_id, event_type FROM read_parquet('{D}/events.parquet')",
    ):
        a = c.setdefault(et, [0, 0])
        a[int(u) % 2] += 1
    t1 = sum(a[0] for a in c.values())
    t2 = sum(a[1] for a in c.values())
    terms = {
        et: math.floor(
            1000000 * math.sqrt(float(a[0] * a[1]) / float(t1 * t2))
        )
        for et, a in c.items()
    }
    bc = sum(terms.values())
    want = {
        (et, a[0], a[1], terms[et], bc, 1000000 - bc) for et, a in c.items()
    }
    got = {
        tuple(r)
        for r in all_queries()["stats_hellinger_distance"](spark, sf_dir).collect()
    }
    assert got == want


def test_cmh_stratified_matches_float_chain(spark, sf_dir):
    """Cochran–Mantel–Haenszel over 7 weekday strata: the numerator and
    variance sums replayed as left-assoc float chains in the oracle's
    exact operation order, rounded half-up at 6 places."""
    import datetime

    base = datetime.date(2024, 1, 1)
    n1 = [0] * 7
    k1 = [0] * 7
    n2 = [0] * 7
    k2 = [0] * 7
    for ts, u, et in _raw(
        sf_dir,
        "SELECT CAST(CAST(ts AS DATE) AS VARCHAR), user_id, event_type"
        " FROM read_parquet('{D}/events.parquet')",
    ):
        d = (datetime.date.fromisoformat(ts) - base).days % 7
        grp1 = int(u) % 2 == 0
        success = 1 if et == "purchase" else 0
        if grp1:
            n1[d] += 1
            k1[d] += success
        else:
            n2[d] += 1
            k2[d] += success
    num = 0.0
    den = 0.0
    for s in range(7):
        fn1, fk1, fn2, fk2 = float(n1[s]), float(k1[s]), float(n2[s]), float(k2[s])
        nt, kt = fn1 + fn2, fk1 + fk2
        num = num + (fk1 - fn1 * kt / nt)
        den = den + (fn1 * fn2 * kt * (nt - kt) / (nt * nt * (nt - 1.0)))
    stat = (num * num) / den
    want = float(Decimal(stat).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))
    [r] = all_queries()["stats_cmh_stratified"](spark, sf_dir).collect()
    assert r["n_total"] == sum(n1) + sum(n2)
    assert r["cmh_stat"] == want


def test_median_ci_matches_order_statistics(spark, sf_dir):
    vs = sorted(
        _q(float(v), 100)
        for (v,) in _raw(
            sf_dir,
            "SELECT value FROM read_parquet('{D}/events.parquet')"
            " WHERE event_type = 'purchase'",
        )
    )
    n = len(vs)
    lo_rank = math.floor((float(n) - 1.96 * math.sqrt(float(n))) / 2.0)
    hi_rank = n + 1 - lo_rank
    med_rank = (n + 1) // 2
    want = (
        n,
        lo_rank,
        hi_rank,
        vs[med_rank - 1],
        vs[lo_rank - 1],
        vs[hi_rank - 1],
    )
    [r] = all_queries()["stats_median_ci_distribution_free"](spark, sf_dir).collect()
    assert tuple(r) == want


# --------------------------------------------------------------------------
# batch 7: the join-menu leftovers — outer/banded/interval/Bloom/Allen/
# as-of/SCD2-PIT/bitemporal, each as a dict/set walk over raw pulls
# --------------------------------------------------------------------------


def test_right_outer_join_matches_null_preserving_fold(spark, sf_dir):
    nations = {
        n
        for (n,) in _raw(
            sf_dir, "SELECT n_name FROM read_parquet('{D}/nation.parquet')"
        )
    }
    nation_of = _nation_names(sf_dir)
    agg: dict[str, list] = {n: [0, None] for n in nations}
    for nk, b in _raw(
        sf_dir,
        "SELECT s_nationkey, s_acctbal FROM read_parquet('{D}/supplier.parquet')",
    ):
        nm = nation_of[int(nk)]
        agg[nm][0] += 1
        b = float(b)
        if agg[nm][1] is None or b > agg[nm][1]:
            agg[nm][1] = b
    want = {}
    for nm, (cnt, mx) in agg.items():
        r2 = (
            None
            if mx is None
            else float(Decimal(mx).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
        )
        want[nm] = (cnt, r2)
    got = {
        r["n_name"]: (r["n_suppliers"], r["max_bal"])
        for r in all_queries()["join_right_outer"](spark, sf_dir).collect()
    }
    assert got == want


def test_range_banded_join_matches_promo_fold(spark, sf_dir):
    import datetime

    base = datetime.date(1993, 1, 1)
    promos = {}
    for x in range(50):
        start = base + datetime.timedelta(days=(x * 37) % 1500)
        end = start + datetime.timedelta(days=3 + (x * 13) % 28)
        promos[x] = (start, end)
    acc: dict[int, list[int]] = {}
    for od, tp in _raw(
        sf_dir,
        "SELECT CAST(o_orderdate AS VARCHAR), o_totalprice"
        " FROM read_parquet('{D}/orders.parquet')",
    ):
        d = datetime.date.fromisoformat(od[:10])
        cents = _q(float(tp), 100)
        for pid, (s, e) in promos.items():
            if s <= d < e:
                a = acc.setdefault(pid, [0, 0])
                a[0] += 1
                a[1] += cents
    want = {(pid, a[0], a[1]) for pid, a in acc.items()}
    got = {
        (r["promo_id"], r["n_orders"], r["revenue_cents"])
        for r in all_queries()["join_range_banded"](spark, sf_dir).collect()
    }
    assert got == want


def _events_us(sf_dir: str, event_type: str):
    """[(event_id, user_id, epoch_us)] raw pull for one event type."""
    return [
        (int(e), int(u), int(us))
        for e, u, us in _raw(
            sf_dir,
            "SELECT event_id, user_id, epoch_us(ts)"
            " FROM read_parquet('{D}/events.parquet')"
            f" WHERE event_type = '{event_type}'",
        )
    ]


def test_interval_overlap_duration_matches_pair_fold(spark, sf_dir):
    def intervals(event_type):
        return [
            (u, us, us + (1 + e % 50) * 60 * 1000000)
            for e, u, us in _events_us(sf_dir, event_type)
        ]

    views, purchases = intervals("view"), intervals("purchase")
    by_user: dict[int, list] = {}
    for u, s, e in purchases:
        by_user.setdefault(u, []).append((s, e))
    acc: dict[int, list[int]] = {}
    for u, vs, ve in views:
        for ps, pe in by_user.get(u, []):
            ov = min(ve, pe) - max(vs, ps)
            if ov > 0:
                a = acc.setdefault(u, [0, 0])
                a[0] += 1
                a[1] += ov
    want = {(u, a[0], a[1]) for u, a in acc.items()}
    got = {
        (r["user_id"], r["n_overlapping_pairs"], r["total_overlap_us"])
        for r in all_queries()["join_interval_overlap_duration"](spark, sf_dir).collect()
    }
    assert got == want


def test_bloom_prefilter_matches_hashlib_bitset(spark, sf_dir):
    """The 64-bit/3-hash Bloom exhibit: build the words from the dim side
    with hashlib, probe every lineitem supplier, classify pass/true/fp/fn
    — the false-negative count must be zero by construction."""
    import hashlib

    def pos(seed, key):
        return int(hashlib.md5(f"{seed}_{key}".encode()).hexdigest()[:15], 16) % 64

    dim = {
        int(s)
        for s, nk in _raw(
            sf_dir,
            "SELECT s_suppkey, s_nationkey FROM read_parquet('{D}/supplier.parquet')",
        )
        if int(nk) < 5
    }
    words: dict[int, int] = {}
    for s in dim:
        for seed in range(3):
            p = pos(seed, s)
            words[p // 32] = words.get(p // 32, 0) | (1 << (p % 32))
    n_probe = n_pass = n_true = n_fp = n_fn = 0
    for (sk,) in _raw(
        sf_dir, "SELECT l_suppkey FROM read_parquet('{D}/lineitem.parquet')"
    ):
        sk = int(sk)
        n_probe += 1
        ps = [pos(seed, sk) for seed in range(3)]
        passed = all(
            (words.get(p // 32, 0) >> (p % 32)) & 1 == 1 for p in ps
        )
        true = sk in dim
        n_pass += passed
        n_true += true
        n_fp += passed and not true
        n_fn += true and not passed
    [r] = all_queries()["join_bloom_prefilter"](spark, sf_dir).collect()
    assert tuple(r) == (n_probe, n_pass, n_true, n_fp, n_fn)
    assert n_fn == 0


def _sessions_us(sf_dir: str):
    """user_id -> list of (start_us, end_us) 30-min-gap sessions, ordered
    by (ts, event_id) exactly like the engines."""
    rows: dict[int, list[tuple[int, int]]] = {}
    for e, u, us in [
        (int(e), int(u), int(us))
        for e, u, us in _raw(
            sf_dir,
            "SELECT event_id, user_id, epoch_us(ts)"
            " FROM read_parquet('{D}/events.parquet')",
        )
    ]:
        rows.setdefault(u, []).append((us, e))
    out: dict[int, list[tuple[int, int]]] = {}
    gap = 30 * 60 * 1000000
    for u, evs in rows.items():
        evs.sort()
        sessions = []
        cur = [evs[0][0], evs[0][0]]
        prev = evs[0][0]
        for us, _ in evs[1:]:
            if us - prev > gap:
                sessions.append(tuple(cur))
                cur = [us, us]
            else:
                cur[1] = us
            prev = us
        sessions.append(tuple(cur))
        out[u] = sessions
    return out


def test_allen_interval_algebra_matches_classification_walk(spark, sf_dir):
    """The 13 Allen relations over even-vs-odd-user session intervals,
    candidate pairs bounded by the hour-bucket band join — the relation
    CASE ladder replayed verbatim as Python conditionals."""
    H = 3600000000
    sess = _sessions_us(sf_dir)
    a_iv = [(u, s, e) for u, ivs in sess.items() if u % 2 == 0 for s, e in ivs]
    b_iv = [(u, s, e) for u, ivs in sess.items() if u % 2 == 1 for s, e in ivs]

    def rel(a_s, a_e, b_s, b_e):
        if a_e < b_s:
            return "precedes"
        if a_e == b_s:
            return "meets"
        if b_e < a_s:
            return "preceded_by"
        if b_e == a_s:
            return "met_by"
        if a_s == b_s and a_e == b_e:
            return "equals"
        if a_s == b_s and a_e < b_e:
            return "starts"
        if a_s == b_s:
            return "started_by"
        if a_e == b_e and a_s > b_s:
            return "finishes"
        if a_e == b_e:
            return "finished_by"
        if a_s > b_s and a_e < b_e:
            return "during"
        if a_s < b_s and a_e > b_e:
            return "contains"
        if a_s < b_s:
            return "overlaps"
        return "overlapped_by"

    pairs: dict[str, list] = {}
    for au, a_s, a_e in a_iv:
        for bu, b_s, b_e in b_iv:
            if a_s // H <= b_e // H and b_s // H <= a_e // H:
                pairs.setdefault(rel(a_s, a_e, b_s, b_e), []).append(au)
    want = {
        (relname, len(users), len(set(users)))
        for relname, users in pairs.items()
    }
    got = {
        (r["relation"], r["n_pairs"], r["n_a_users"])
        for r in all_queries()["join_allen_interval_algebra"](spark, sf_dir).collect()
    }
    assert got == want


def test_asof_prev_view_matches_max_walk(spark, sf_dir):
    views: dict[int, list[int]] = {}
    for _, u, us in _events_us(sf_dir, "view"):
        views.setdefault(u, []).append(us)
    want = set()
    for e, u, us in _events_us(sf_dir, "purchase"):
        prev = [v for v in views.get(u, []) if v <= us]
        want.add((e, u, us, max(prev) if prev else None))
    got = {
        (r["event_id"], r["user_id"], r["purchase_us"], r["prev_view_us"])
        for r in all_queries()["join_asof_prev_view"](spark, sf_dir).collect()
    }
    assert got == want


def test_scd2_point_in_time_matches_interval_walk(spark, sf_dir):
    """SCD2 intervals from purchase history (LEAD over (ts, value)), every
    view matched to its covering interval."""
    hist_raw: dict[int, list[tuple[int, float, float]]] = {}
    for u, us, v in _raw(
        sf_dir,
        "SELECT user_id, epoch_us(ts), value"
        " FROM read_parquet('{D}/events.parquet')"
        " WHERE event_type = 'purchase'",
    ):
        hist_raw.setdefault(int(u), []).append((int(us), float(v)))
    hist: dict[int, list[tuple[int, int | None, float]]] = {}
    for u, rows in hist_raw.items():
        rows.sort()  # (ts, value) — the LEAD ordering
        ivs = []
        for i, (us, v) in enumerate(rows):
            nxt = rows[i + 1][0] if i + 1 < len(rows) else None
            sv = float(Decimal(v).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))
            ivs.append((us, nxt, sv))
        hist[u] = ivs
    want = set()
    for e, u, us in _events_us(sf_dir, "view"):
        for vf, vt, sv in hist.get(u, []):
            if us >= vf and (vt is None or us < vt):
                want.add((e, u, us, sv, vf))
    got = {
        (r["event_id"], r["user_id"], r["ts_us"], r["state_value"], r["valid_from_us"])
        for r in all_queries()["join_scd2_point_in_time"](spark, sf_dir).collect()
    }
    assert got == want


def test_bitemporal_asof_matches_two_clock_walk(spark, sf_dir):
    """Two-clock as-of: the same valid-time cutoff read at two transaction
    times; 'revised' flags customers whose known state changed as late
    rows arrived."""
    import datetime

    cutoff_valid = datetime.date(1996, 6, 30)
    tx1 = datetime.date(1996, 6, 30)
    tx2 = datetime.date(1996, 12, 31)
    facts: dict[int, list] = {}
    for ck, ok, od, tp in _raw(
        sf_dir,
        "SELECT o_custkey, o_orderkey, CAST(o_orderdate AS VARCHAR), o_totalprice"
        " FROM read_parquet('{D}/orders.parquet')",
    ):
        ck, ok = int(ck), int(ok)
        valid = datetime.date.fromisoformat(od[:10])
        tx = valid + datetime.timedelta(days=ok % 3)
        units = _q(float(tp), 1)
        facts.setdefault(ck, []).append((valid, tx, ok, units))

    def known(rows, tx_cut):
        elig = [r for r in rows if r[0] <= cutoff_valid and r[1] <= tx_cut]
        if not elig:
            return None
        best = max(elig, key=lambda r: (r[0], r[1], r[2]))
        return best[3]

    want = set()
    for ck, rows in facts.items():
        k2 = known(rows, tx2)
        if k2 is None:
            continue  # t2 is the driving side
        k1 = known(rows, tx1)
        want.add((ck, k1, k2, k1 != k2))
    got = {
        (r["custkey"], r["known_t1"], r["known_t2"], r["revised"])
        for r in all_queries()["join_bitemporal_asof"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 8: events/windowing leftovers — hour buckets, sliding offsets,
# interval coalescing, the retention triangle, keep-first — as dict folds
# --------------------------------------------------------------------------


def test_tumbling_hourly_matches_bucket_fold(spark, sf_dir):
    acc: dict[tuple[int, str], list] = {}
    for et, us, u, v in _raw(
        sf_dir,
        "SELECT event_type, epoch_us(ts), user_id, value"
        " FROM read_parquet('{D}/events.parquet')",
    ):
        hour = (int(us) // 3600000000) * 3600000000
        a = acc.setdefault((hour, et), [0, 0, set()])
        a[0] += 1
        a[1] += _q(float(v), 1000000)
        a[2].add(int(u))
    want = {
        (h, et, a[0], float(a[1]) / 1000000.0, len(a[2]))
        for (h, et), a in acc.items()
    }
    got = {
        tuple(r)
        for r in all_queries()["events_tumbling_hourly"](spark, sf_dir).collect()
    }
    assert got == want


def test_sliding_windows_matches_offset_fold(spark, sf_dir):
    acc: dict[int, list[int]] = {}
    for us, v in _raw(
        sf_dir,
        "SELECT epoch_us(ts), value FROM read_parquet('{D}/events.parquet')",
    ):
        us, micro = int(us), _q(float(v), 1000000)
        for off in (0, 30 * 60 * 1000000):
            w = ((us - off) // 3600000000) * 3600000000 + off
            a = acc.setdefault(w, [0, 0])
            a[0] += 1
            a[1] += micro
    want = {
        (w, a[0], (float(a[1]) / float(a[0])) / 1000000.0)
        for w, a in acc.items()
    }
    got = {
        tuple(r)
        for r in all_queries()["events_sliding_windows"](spark, sf_dir).collect()
    }
    assert got == want


def test_interval_merge_matches_coalesce_walk(spark, sf_dir):
    ivs: dict[int, list[tuple[int, int, int]]] = {}
    for e, u, us in [
        (int(e), int(u), int(us))
        for e, u, us in _raw(
            sf_dir,
            "SELECT event_id, user_id, epoch_us(ts)"
            " FROM read_parquet('{D}/events.parquet')",
        )
    ]:
        ivs.setdefault(u, []).append((us, e, us + (1 + e % 50) * 60 * 1000000))
    want = set()
    for u, rows in ivs.items():
        rows.sort()  # (start_us, event_id) — the window ordering
        seq = 0
        cur_max_end = None
        groups: dict[int, list] = {}
        for s, e, en in rows:
            if cur_max_end is None or s > cur_max_end:
                seq += 1
            cur_max_end = en if cur_max_end is None else max(cur_max_end, en)
            g = groups.setdefault(seq, [s, en, 0])
            g[0] = min(g[0], s)
            g[1] = max(g[1], en)
            g[2] += 1
        for seq, (ms, me, n) in groups.items():
            want.add((u, seq, ms, me, n))
    got = {
        tuple(r)
        for r in all_queries()["events_interval_merge"](spark, sf_dir).collect()
    }
    assert got == want


def test_retention_triangle_matches_cohort_fold(spark, sf_dir):
    import datetime

    epoch = datetime.date(1970, 1, 1)
    uw = set()
    for u, d in _raw(
        sf_dir,
        "SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR)"
        " FROM read_parquet('{D}/events.parquet')",
    ):
        w = (datetime.date.fromisoformat(d) - epoch).days // 7
        uw.add((int(u), w))
    cohort = {}
    for u, w in uw:
        cohort[u] = min(cohort.get(u, w), w)
    sizes: dict[int, int] = {}
    for u, cw in cohort.items():
        sizes[cw] = sizes.get(cw, 0) + 1
    tri: dict[tuple[int, int], int] = {}
    for u, w in uw:
        key = (cohort[u], w - cohort[u])
        tri[key] = tri.get(key, 0) + 1
    want = {
        (cw, off, n, sizes[cw], (1000000 * n) // sizes[cw])
        for (cw, off), n in tri.items()
    }
    got = {
        tuple(r)
        for r in all_queries()["events_retention_triangle"](spark, sf_dir).collect()
    }
    assert got == want


def test_keepfirst_events_matches_min_walk(spark, sf_dir):
    first: dict[int, tuple] = {}
    for e, u, us, et in _raw(
        sf_dir,
        "SELECT event_id, user_id, epoch_us(ts), event_type"
        " FROM read_parquet('{D}/events.parquet')",
    ):
        e, u, us = int(e), int(u), int(us)
        if u not in first or (us, e) < (first[u][1], first[u][0]):
            first[u] = (e, us, et)
    want = {(u, e, us, et) for u, (e, us, et) in first.items()}
    got = {
        tuple(r)
        for r in all_queries()["dedup_keepfirst_events"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 9: the MinHash/SimHash dedup core — signatures, banding, candidate
# pairs, and the dup-graph components, rebuilt with hashlib + re + BFS
# --------------------------------------------------------------------------


def _doc_tokens(sf_dir: str) -> dict[int, list[str]]:
    import re

    out = {}
    for d, text in _raw(
        sf_dir, "SELECT doc_id, text FROM read_parquet('{D}/documents.parquet')"
    ):
        norm = re.sub(r"\s+", " ", text).strip().lower()
        out[int(d)] = norm.split(" ")
    return out


def _minhash_pairs_py(sf_dir: str) -> set[tuple[int, int]]:
    """tokenize -> word-3-gram shingles -> 16 Kirsch-Mitzenmacher minhashes
    -> 4 banded md5 buckets -> colliding (a < b) pairs."""
    import hashlib

    sigs: dict[int, list[int]] = {}
    for d, toks in _doc_tokens(sf_dir).items():
        L = len(toks)
        shingles = [
            " ".join(toks[i - 1 : i + 2]) for i in range(1, max(L - 2, 1) + 1)
        ]
        hs = []
        for s in shingles:
            m = hashlib.md5(s.encode()).hexdigest()
            hs.append((int(m[:15], 16), int(m[16:30], 16)))
        sigs[d] = [min(h1 + i * h2 for h1, h2 in hs) for i in range(16)]
    buckets: dict[tuple[int, str], list[int]] = {}
    for d, sig in sigs.items():
        for b in range(4):
            key = "|".join(str(sig[b * 4 + r]) for r in range(4))
            bucket = hashlib.md5(key.encode()).hexdigest()
            buckets.setdefault((b, bucket), []).append(d)
    pairs = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                pairs.add((a, b))
    return pairs


def test_minhash_lsh_matches_hashlib_banding(spark, sf_dir):
    want = _minhash_pairs_py(sf_dir)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in all_queries()["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_cluster_components_matches_bfs(spark, sf_dir):
    """Connected components over the MinHash pair graph: min-doc_id labels
    via plain BFS, one row per vertex that appears in any pair."""
    pairs = _minhash_pairs_py(sf_dir)
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    seen: set[int] = set()
    for v in sorted(adj):
        if v in seen:
            continue
        comp = {v}
        stack = [v]
        seen.add(v)
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    comp.add(w)
                    stack.append(w)
        label = min(comp)
        for u in comp:
            want[u] = label
    got = {
        r["doc_id"]: r["component_id"]
        for r in all_queries()["dedup_cluster_components"](spark, sf_dir).collect()
    }
    assert got == want


def _simhash_py(sf_dir: str) -> dict[int, int]:
    """32-bit SimHash: bit j reads hex digit j//4 of md5(token), bit j%4;
    tokens vote ±1, the bit sets on a non-negative sum."""
    import hashlib

    out = {}
    for d, toks in _doc_tokens(sf_dir).items():
        digests = [hashlib.md5(t.encode()).hexdigest() for t in toks]
        sh = 0
        for j in range(32):
            pos, bit = j // 4, j % 4
            s = sum(
                1 if (int(m[pos], 16) >> bit) & 1 else -1 for m in digests
            )
            if s >= 0:
                sh += 1 << j
        out[d] = sh
    return out


def test_simhash_matches_hashlib_votes(spark, sf_dir):
    want = _simhash_py(sf_dir)
    got = {
        r["doc_id"]: r["simhash"]
        for r in all_queries()["dedup_simhash"](spark, sf_dir).collect()
    }
    assert got == want


def test_simhash_pairs_matches_byte_banding(spark, sf_dir):
    """Byte-banded SimHash candidate pairs at hamming <= 6: the operator's
    defined semantics is banded-candidates-then-verify (a pair must share
    at least one of the 4 sketch bytes to be seen — the standard recall
    trade; only hamming <= 3 would guarantee an untouched byte). The
    rebuild replays banding + verify exactly, and additionally pins the
    one-sided guarantees brute force CAN make: every emitted pair is
    within the threshold, and every hamming<=3 pair is emitted."""
    sh = _simhash_py(sf_dir)
    cand = set()
    byband: dict[tuple[int, int], list[int]] = {}
    for d, s in sh.items():
        for b in range(4):
            byband.setdefault((b, (s >> (8 * b)) & 255), []).append(d)
    for members in byband.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                cand.add((a, b))
    want = {
        (a, b, bin(sh[a] ^ sh[b]).count("1"))
        for a, b in cand
        if bin(sh[a] ^ sh[b]).count("1") <= 6
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in all_queries()["dedup_simhash_pairs"](spark, sf_dir).collect()
    }
    assert got == want
    # one-sided brute-force guarantees: soundness at <=6, total recall at <=3
    docs = sorted(sh)
    emitted = {(a, b) for a, b, _ in want}
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            h = bin(sh[a] ^ sh[b]).count("1")
            if (a, b) in emitted:
                assert h <= 6
            elif h <= 3:  # pigeonhole: <=3 flips leave a byte untouched
                raise AssertionError(f"banding missed guaranteed pair {(a, b)}")


# --------------------------------------------------------------------------
# batch 10: the registered transactional exhibits — each builds a TxTable
# and reads back; the rebuild computes the expected READ content with set
# algebra over the raw customer/nation pulls (no TxTable, no SQL)
# --------------------------------------------------------------------------


def _r2(x: float) -> float:
    return float(Decimal(x).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))


def _customers(sf_dir: str):
    return [
        (int(k), nm, float(b), seg)
        for k, nm, b, seg in _raw(
            sf_dir,
            "SELECT c_custkey, c_name, c_acctbal, c_mktsegment"
            " FROM read_parquet('{D}/customer.parquet')",
        )
    ]


def test_delta_deletion_vectors_matches_set_subtraction(spark, sf_dir):
    acc: dict[str, list[int]] = {}
    for k, _, b, seg in _customers(sf_dir):
        if 50 <= k <= 200 or 700 <= k <= 820:
            continue
        a = acc.setdefault(seg, [0, 0])
        a[0] += 1
        a[1] += _q(_r2(b), 100)
    want = {(seg, a[0], a[1]) for seg, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["delta_deletion_vectors"](spark, sf_dir).collect()
    }
    assert got == want


def test_delta_restore_version_matches_base_counts(spark, sf_dir):
    rows = _customers(sf_dir)
    total = sum(_q(b, 100) for _, _, b, _ in rows)
    [r] = all_queries()["delta_restore_version"](spark, sf_dir).collect()
    assert tuple(r) == (len(rows), total, 3)


def _merge_source(sf_dir: str):
    src = [
        (k, nm + "+", _r2(_r2(b) + 50), seg)
        for k, nm, b, seg in _customers(sf_dir)
        if k % 5 == 0
    ]
    src += [
        (2000000 + int(nk), "tx-" + nm, 0.0, "TX")
        for nk, nm in _raw(
            sf_dir,
            "SELECT n_nationkey, n_name FROM read_parquet('{D}/nation.parquet')",
        )
    ]
    return src


def test_delta_merge_upsert_read_matches_upsert_algebra(spark, sf_dir):
    src = _merge_source(sf_dir)
    src_keys = {r[0] for r in src}
    kept = [
        (k, nm, _r2(b), seg)
        for k, nm, b, seg in _customers(sf_dir)
        if k not in src_keys
    ]
    want = set(kept) | set(src)
    got = {
        tuple(r)
        for r in all_queries()["delta_merge_upsert_read"](spark, sf_dir).collect()
    }
    assert got == want


def test_delta_vacuum_read_matches_survivor_algebra(spark, sf_dir):
    src = _merge_source(sf_dir)
    src_keys = {r[0] for r in src}
    v1 = src + [
        (k, nm, _r2(b), seg)
        for k, nm, b, seg in _customers(sf_dir)
        if k not in src_keys
    ]
    acc: dict[str, list[int]] = {}
    for k, _, b, seg in v1:
        if 1 <= k <= 300:
            continue
        a = acc.setdefault(seg, [0, 0])
        a[0] += 1
        a[1] += _q(b, 100)
    want = {(seg, a[0], a[1]) for seg, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["delta_vacuum_read"](spark, sf_dir).collect()
    }
    assert got == want


def test_delta_shallow_clone_matches_side_counts(spark, sf_dir):
    rows = [(k, _q(b, 100)) for k, _, b, _ in _customers(sf_dir)]
    clone = [(k, c) for k, c in rows if not (20 <= k <= 40)]
    want = {
        ("source", len(rows), sum(c for _, c in rows)),
        ("clone", len(clone), sum(c for _, c in clone)),
    }
    got = {
        tuple(r)
        for r in all_queries()["delta_shallow_clone"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 11: sink roundtrips and source exhibits — the readback aggregates
# rebuilt as dict folds (the SAME fold pins csv/json/orc/xml/codec-matrix:
# a format that corrupts any value diverges from it)
# --------------------------------------------------------------------------


def _lineitem_slice_fold(sf_dir: str) -> set[tuple]:
    acc: dict[str, list[int]] = {}
    for ln, rf, p, q in _raw(
        sf_dir,
        "SELECT l_linenumber, l_returnflag, l_extendedprice, l_quantity"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if int(ln) > 2:
            continue
        a = acc.setdefault(rf, [0, 0, 0])
        a[0] += 1
        a[1] += _q(float(p), 100)
        a[2] += int(q)
    return {(rf, a[0], a[1], a[2]) for rf, a in acc.items()}


def test_sink_roundtrips_match_shared_fold(spark, sf_dir):
    """csv / json / orc / xml / every parquet codec must all reproduce the
    identical slice aggregate — one Python fold pins all five paths."""
    want = _lineitem_slice_fold(sf_dir)
    for name in (
        "sink_csv_roundtrip",
        "sink_json_roundtrip",
        "sink_orc_roundtrip",
        "sink_xml_roundtrip",
        "sink_parquet_codec_matrix",
    ):
        got = {tuple(r) for r in all_queries()[name](spark, sf_dir).collect()}
        assert got == want, name


def test_partitioned_write_readback_matches_full_fold(spark, sf_dir):
    acc: dict[str, list[int]] = {}
    for rf, p, q in _raw(
        sf_dir,
        "SELECT l_returnflag, l_extendedprice, l_quantity"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        a = acc.setdefault(rf, [0, 0, 0])
        a[0] += 1
        a[1] += _q(float(p), 100)
        a[2] += int(q)
    want = {(rf, a[0], a[1], a[2]) for rf, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["sink_partitioned_write_readback"](spark, sf_dir).collect()
    }
    assert got == want


def test_dynamic_partition_overwrite_matches_block_fold(spark, sf_dir):
    import datetime

    epoch = datetime.date(1970, 1, 1)
    rows = []
    for d, v in _raw(
        sf_dir,
        "SELECT CAST(CAST(ts AS DATE) AS VARCHAR), value"
        " FROM read_parquet('{D}/events.parquet')",
    ):
        block = (datetime.date.fromisoformat(d) - epoch).days // 10
        rows.append((block, _q(float(v), 100)))
    fb = min(b for b, _ in rows)
    acc: dict[int, list[int]] = {}
    for b, cents in rows:
        a = acc.setdefault(b, [0, 0])
        a[0] += 1
        a[1] += cents * 2 if b == fb else cents
    want = {(b, a[0], a[1]) for b, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["sink_dynamic_partition_overwrite"](spark, sf_dir).collect()
    }
    assert got == want


def test_glob_scan_matches_shard_fold(spark, sf_dir):
    acc: dict[int, list[int]] = {}
    for ok, tp in _raw(
        sf_dir,
        "SELECT o_orderkey, o_totalprice FROM read_parquet('{D}/orders.parquet')",
    ):
        shard = int(ok) % 3
        if shard not in (0, 1):
            continue
        a = acc.setdefault(shard, [0, 0])
        a[0] += 1
        a[1] += _q(float(tp), 100)
    want = {(s, a[0], a[1]) for s, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["source_glob_scan"](spark, sf_dir).collect()
    }
    assert got == want


def test_csv_corrupt_records_matches_kind_counts(spark, sf_dir):
    kinds = {"corrupt": 0, "good": 0}
    for (nk,) in _raw(
        sf_dir, "SELECT n_nationkey FROM read_parquet('{D}/nation.parquet')"
    ):
        kinds["corrupt" if int(nk) % 10 == 0 else "good"] += 1
    want = {(k, n) for k, n in kinds.items() if n}
    got = {
        tuple(r)
        for r in all_queries()["source_csv_corrupt_records"](spark, sf_dir).collect()
    }
    assert got == want


def test_config_dimension_matches_literal_lookup(spark, sf_dir):
    dim = {
        12: "Adventure", 14: "Fantasy", 16: "Animation", 18: "Drama",
        27: "Horror", 28: "Action", 35: "Comedy", 36: "History",
        37: "Western", 53: "Thriller", 80: "Crime", 99: "Documentary",
        878: "Science Fiction", 9648: "Mystery", 10402: "Music",
        10749: "Romance", 10751: "Family", 10752: "War", 10770: "TV Movie",
    }
    acc: dict[tuple[str, bool], int] = {}
    for (pk,) in _raw(
        sf_dir, "SELECT p_partkey FROM read_parquet('{D}/part.parquet')"
    ):
        gid = int(pk) % 40
        resolved = gid in dim
        genre = dim.get(gid, str(gid))
        acc[(genre, resolved)] = acc.get((genre, resolved), 0) + 1
    want = {(g, n, res) for (g, res), n in acc.items()}
    got = {
        (r["genre"], r["n_parts"], r["resolved"])
        for r in all_queries()["source_config_dimension"](spark, sf_dir).collect()
    }
    assert got == want


def test_filter_boolean_guards_matches_predicate_fold(spark, sf_dir):
    acc: dict[str, list[int]] = {}
    for pr, tp, st in _raw(
        sf_dir,
        "SELECT o_orderpriority, o_totalprice, o_orderstatus"
        " FROM read_parquet('{D}/orders.parquet')",
    ):
        if not (
            (pr in ("1-URGENT", "2-HIGH") or st.startswith("F"))
            and not (float(tp) < 1000.0)
            and st is not None
        ):
            continue
        a = acc.setdefault(pr, [0, 0])
        a[0] += 1
        a[1] += 1 if st.startswith("F") else 0
    want = {(pr, a[0], a[1]) for pr, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["filter_boolean_guards"](spark, sf_dir).collect()
    }
    assert got == want


def test_cap_docs_per_source_matches_topk_walk(spark, sf_dir):
    per_source: dict[str, list] = {}
    for src, d, text in _raw(
        sf_dir,
        "SELECT source, doc_id, text FROM read_parquet('{D}/documents.parquet')",
    ):
        per_source.setdefault(src, []).append((-len(text), int(d)))
    want = set()
    for src, rows in per_source.items():
        for rk, (neglen, d) in enumerate(sorted(rows)[:3], start=1):
            want.add((src, d, -neglen, rk))
    got = {
        tuple(r)
        for r in all_queries()["cap_docs_per_source"](spark, sf_dir).collect()
    }
    assert got == want


def test_binaryfile_scan_matches_hashlib(spark, sf_dir):
    import hashlib

    want = {
        (int(d), len(t.encode()), hashlib.md5(t.encode()).hexdigest())
        for d, t in _raw(
            sf_dir,
            "SELECT doc_id, text FROM read_parquet('{D}/documents.parquet')",
        )
        if int(d) % 25 == 0
    }
    got = {
        tuple(r)
        for r in all_queries()["source_binaryfile_scan"](spark, sf_dir).collect()
    }
    assert got == want


def test_schema_evolution_scan_matches_null_fold(spark, sf_dir):
    acc: dict[str, list[int]] = {}
    for d, nc, lang in _raw(
        sf_dir,
        "SELECT doc_id, n_chars, lang FROM read_parquet('{D}/documents.parquet')",
    ):
        key = None if int(d) % 2 == 0 else lang  # pre-evolution rows: no lang
        a = acc.setdefault(key, [0, 0])
        a[0] += 1
        a[1] += int(nc)
    want = {(k, a[0], a[1]) for k, a in acc.items()}
    got = {
        (r["lang"], r["n_docs"], r["sum_chars"])
        for r in all_queries()["source_schema_evolution_scan"](spark, sf_dir).collect()
    }
    assert got == want


def test_rest_fixture_scan_matches_window_keys(spark, sf_dir):
    import calendar
    import datetime

    want = set()
    for ok, od in _raw(
        sf_dir,
        "SELECT o_orderkey, CAST(o_orderdate AS VARCHAR)"
        " FROM read_parquet('{D}/orders.parquet')",
    ):
        day = od[:10]
        if not ("1995-01-01" <= day <= "1995-03-31") or int(ok) % 10 != 0:
            continue
        d = datetime.date.fromisoformat(day)
        last = calendar.monthrange(d.year, d.month)[1]
        wk = f"{d:%Y-%m}-01_{d:%Y-%m}-{last:02d}"
        want.add((int(ok), f"order-{int(ok)}", day, wk))
    got = {
        tuple(r)
        for r in all_queries()["source_rest_fixture_scan"](spark, sf_dir).collect()
    }
    assert got == want


def test_checkpoint_resume_degrade_matches_daily_fold(spark, sf_dir):
    acc: dict[str, list[int]] = {}
    for d, v in _raw(
        sf_dir,
        "SELECT CAST(CAST(ts AS DATE) AS VARCHAR), value"
        " FROM read_parquet('{D}/events.parquet')",
    ):
        a = acc.setdefault(d[:10], [0, 0])
        a[0] += 1
        a[1] += _q(float(v), 1000000)
    want = {(d, a[0], a[1]) for d, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["checkpoint_resume_degrade"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 12: spatial kNN / point-in-polygon, the deletion-neighborhood fuzzy
# join, and the agg shelf leftovers — brute walks and closed-form folds
# --------------------------------------------------------------------------


def test_spatial_knn_matches_brute_rank(spark, sf_dir):
    pts = _dbscan_points(sf_dir)
    keys = sorted(pts)
    R2 = 1 << 28
    nbrs: dict[int, list[tuple[int, int]]] = {}
    for i, a in enumerate(keys):
        ax, ay = pts[a]
        for b in keys[i + 1 :]:
            bx, by = pts[b]
            d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
            if d2 <= R2:
                nbrs.setdefault(a, []).append((d2, b))
                nbrs.setdefault(b, []).append((d2, a))
    want = set()
    for k, lst in nbrs.items():
        for rk, (d2, nbr) in enumerate(sorted(lst)[:3], start=1):
            want.add((k, rk, nbr, d2))
    got = {
        (r["custkey"], r["rank"], r["neighbor_custkey"], r["dist_sq"])
        for r in all_queries()["spatial_knn_within_radius"](spark, sf_dir).collect()
    }
    assert got == want


def test_point_in_polygon_matches_sign_tests(spark, sf_dir):
    verts = [
        (873813, 524288), (699051, 826986), (349526, 826986),
        (174763, 524288), (349525, 221590), (699050, 221590),
    ]

    def signs(x, y):
        out = []
        for i in range(6):
            xi, yi = verts[i]
            xj, yj = verts[(i + 1) % 6]
            out.append((xj - xi) * (y - yi) - (yj - yi) * (x - xi))
        return out

    acc: dict[str, list] = {}
    for k, (x, y) in _dbscan_points(sf_dir).items():
        s = signs(x, y)
        if all(v > 0 for v in s):
            verdict = "inside"
        elif all(v >= 0 for v in s):
            verdict = "boundary"
        else:
            verdict = "outside"
        a = acc.setdefault(verdict, [0, 0, 0, None])
        a[0] += 1
        a[1] += x
        a[2] += y
        a[3] = k if a[3] is None else min(a[3], k)
    want = {(v, a[0], a[1], a[2], a[3]) for v, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["spatial_point_in_polygon"](spark, sf_dir).collect()
    }
    assert got == want


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_deletion_neighborhood_matches_variant_walk(spark, sf_dir):
    """Deletion-neighborhood blocking: each name emits itself plus every
    single-char-deleted variant; candidates share a variant; survivors have
    true edit distance <= 1 (plain DP levenshtein)."""
    names = {
        int(k): nm
        for k, nm in _raw(
            sf_dir,
            "SELECT c_custkey, c_name FROM read_parquet('{D}/customer.parquet')",
        )
        if int(k) < 600
    }
    byvar: dict[str, list[int]] = {}
    for k, nm in names.items():
        vs = {nm[:i] + nm[i + 1 :] for i in range(len(nm))} | {nm}
        for v in vs:
            byvar.setdefault(v, []).append(k)
    cand = set()
    for members in byvar.values():
        ms = sorted(set(members))
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                cand.add((a, b))
    want = {
        (a, b, _lev(names[a], names[b]))
        for a, b in cand
        if _lev(names[a], names[b]) <= 1
    }
    got = {
        tuple(r)
        for r in all_queries()["join_fuzzy_deletion_neighborhood"](spark, sf_dir).collect()
    }
    assert got == want


def _quantile_cont(sorted_vals: list[int], q: float) -> float:
    """quantile_cont / percentile on integers: linear interpolation at
    h = (n-1)*q, IEEE arithmetic."""
    n = len(sorted_vals)
    h = (n - 1) * q
    lo = math.floor(h)
    hi = min(lo + 1, n - 1)
    frac = h - lo
    return sorted_vals[lo] + frac * (sorted_vals[hi] - sorted_vals[lo])


def test_agg_percentiles_matches_interpolation(spark, sf_dir):
    groups: dict[str, list[int]] = {}
    for rf, p in _raw(
        sf_dir,
        "SELECT l_returnflag, l_extendedprice FROM read_parquet('{D}/lineitem.parquet')",
    ):
        groups.setdefault(rf, []).append(_q(float(p), 100))
    want = {}
    for rf, vs in groups.items():
        vs.sort()
        want[rf] = tuple(_quantile_cont(vs, q) / 100.0 for q in (0.25, 0.5, 0.75))
    got = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p75"])
        for r in all_queries()["agg_percentiles"](spark, sf_dir).collect()
    }
    assert got == want


def test_agg_approx_distinct_matches_exact_sets(spark, sf_dir):
    custs = set()
    n = 0
    for (c,) in _raw(
        sf_dir, "SELECT o_custkey FROM read_parquet('{D}/orders.parquet')"
    ):
        custs.add(int(c))
        n += 1
    [r] = all_queries()["agg_approx_distinct"](spark, sf_dir).collect()
    assert (r["exact_custs"], r["n_orders"]) == (len(custs), n)


def test_equi_depth_histogram_matches_boundary_walk(spark, sf_dir):
    from collections import Counter

    vals = Counter(
        _q(float(tp), 1)
        for (tp,) in _raw(
            sf_dir, "SELECT o_totalprice FROM read_parquet('{D}/orders.parquet')"
        )
    )
    n = sum(vals.values())
    cum = 0
    per_bucket: dict[int, list] = {}
    for v in sorted(vals):
        cnt = vals[v]
        cum += cnt
        for j in range(1, 9):
            if 8 * (cum - cnt) < j * n and 8 * cum > (j - 1) * n:
                b = per_bucket.setdefault(j, [None, None, 0, 0])
                b[0] = v if b[0] is None else min(b[0], v)
                b[1] = v if b[1] is None else max(b[1], v)
                b[2] += cnt
                b[3] += 1
    want = {(j, b[0], b[1], b[2], b[3]) for j, b in per_bucket.items()}
    got = {
        tuple(r)
        for r in all_queries()["agg_equi_depth_histogram"](spark, sf_dir).collect()
    }
    assert got == want


def test_grouping_id_report_matches_set_fold(spark, sf_dir):
    rows = _raw(
        sf_dir,
        "SELECT o_orderpriority, o_orderstatus FROM read_parquet('{D}/orders.parquet')",
    )
    acc: dict[tuple, int] = {}
    for pr, st in rows:
        for key in [(pr, st, 0), (pr, None, 1), (None, st, 2), (None, None, 3)]:
            acc[key] = acc.get(key, 0) + 1
    want = {(pr, st, gid, n) for (pr, st, gid), n in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["agg_grouping_id_report"](spark, sf_dir).collect()
    }
    assert got == want


def test_amount_collision_audit_matches_cents_fold(spark, sf_dir):
    import datetime

    epoch = datetime.date(1970, 1, 1)
    acc: dict[int, list] = {}
    for u, v, d in _raw(
        sf_dir,
        "SELECT user_id, value, CAST(CAST(ts AS DATE) AS VARCHAR)"
        " FROM read_parquet('{D}/events.parquet')",
    ):
        cents = _q(float(v), 100)
        day = (datetime.date.fromisoformat(d) - epoch).days
        a = acc.setdefault(cents, [0, set(), None, None])
        a[0] += 1
        a[1].add(int(u))
        a[2] = day if a[2] is None else min(a[2], day)
        a[3] = day if a[3] is None else max(a[3], day)
    want = {
        (c, a[0], len(a[1]), a[3] - a[2], a[0] * (a[0] - 1) // 2)
        for c, a in acc.items()
        if a[0] > 1
    }
    got = {
        tuple(r)
        for r in all_queries()["agg_amount_collision_audit"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 13: the Spark-4 SQL surface + set ops + correlated scalar — each a
# plain fold (the engine exercises EXECUTE IMMEDIATE / named params /
# BEGIN-WHILE / collations / UNPIVOT; the semantics are ordinary algebra)
# --------------------------------------------------------------------------


def test_execute_immediate_matches_having_fold(spark, sf_dir):
    nation = _nation_names(sf_dir)
    counts: dict[str, int] = {}
    for (nk,) in _raw(
        sf_dir, "SELECT s_nationkey FROM read_parquet('{D}/supplier.parquet')"
    ):
        nm = nation[int(nk)]
        counts[nm] = counts.get(nm, 0) + 1
    want = {(nm, n) for nm, n in counts.items() if n >= 3}
    got = {
        tuple(r)
        for r in all_queries()["sql_execute_immediate"](spark, sf_dir).collect()
    }
    assert got == want


def test_parameterized_query_matches_filter_fold(spark, sf_dir):
    acc: dict[str, list[int]] = {}
    for pr, od, tp in _raw(
        sf_dir,
        "SELECT o_orderpriority, CAST(o_orderdate AS VARCHAR), o_totalprice"
        " FROM read_parquet('{D}/orders.parquet')",
    ):
        if od[:10] < "1995-06-01" or float(tp) <= 1000:
            continue
        a = acc.setdefault(pr, [0, 0])
        a[0] += 1
        a[1] += _q(float(tp), 1)
    want = {(pr, a[0], a[1]) for pr, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["sql_parameterized_query"](spark, sf_dir).collect()
    }
    assert got == want


def test_scripting_block_matches_month_loop(spark, sf_dir):
    total = 0
    for (od,) in _raw(
        sf_dir,
        "SELECT CAST(o_orderdate AS VARCHAR) FROM read_parquet('{D}/orders.parquet')",
    ):
        if "1995-01-01" <= od[:10] <= "1995-06-30":
            total += 1
    [r] = all_queries()["sql_scripting_block"](spark, sf_dir).collect()
    assert tuple(r) == (6, total)


def test_string_collation_matches_case_fold(spark, sf_dir):
    acc: dict[str, list] = {}
    for e, et in _raw(
        sf_dir,
        "SELECT event_id, event_type FROM read_parquet('{D}/events.parquet')",
    ):
        label = et.upper() if int(e) % 2 == 0 else et
        a = acc.setdefault(label.lower(), [0, set()])
        a[0] += 1
        a[1].add(label)
    want = {(k, a[0], len(a[1])) for k, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["string_collation_groupby"](spark, sf_dir).collect()
    }
    assert got == want


def test_unpivot_measures_matches_long_form(spark, sf_dir):
    want = set()
    for ok, ln, q, d, t in _raw(
        sf_dir,
        "SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if int(ok) % 1000 != 0:
            continue
        for m, v in (("quantity", float(q)), ("discount", float(d)), ("tax", float(t))):
            want.add((int(ok), int(ln), m, _r2(v)))
    got = {
        tuple(r)
        for r in all_queries()["unpivot_measures"](spark, sf_dir).collect()
    }
    assert got == want


def test_setop_union_distinct_matches_set_union(spark, sf_dir):
    want = set()
    for c, st, tp in _raw(
        sf_dir,
        "SELECT o_custkey, o_orderstatus, o_totalprice"
        " FROM read_parquet('{D}/orders.parquet')",
    ):
        if st == "F" or float(tp) > 100000:
            want.add((int(c),))
    got = {
        tuple(r)
        for r in all_queries()["setop_union_distinct"](spark, sf_dir).collect()
    }
    assert got == want


def test_correlated_scalar_matches_per_key_average(spark, sf_dir):
    per_part: dict[int, list] = {}
    rows = _raw(
        sf_dir,
        "SELECT l_partkey, l_quantity, l_extendedprice"
        " FROM read_parquet('{D}/lineitem.parquet')",
    )
    for pk, q, p in rows:
        a = per_part.setdefault(int(pk), [0, 0])
        a[0] += _q(float(q), 100)
        a[1] += 1
    acc: dict[int, list[int]] = {}
    for pk, q, p in rows:
        s, n = per_part[int(pk)]
        avg = (float(s) / float(n)) / 100.0
        if float(q) < 0.4 * avg:
            a = acc.setdefault(int(pk), [0, 0])
            a[0] += _q(float(p), 100)
            a[1] += 1
    want = {(pk, float(a[0]) / 100.0, a[1]) for pk, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["subq_correlated_scalar"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 14: profiling / consistent sampling / upsert algebra — dict folds
# --------------------------------------------------------------------------


def test_profile_drift_tvd_matches_bin_fold(spark, sf_dir):
    bins: dict[int, list[int]] = {}
    na = nb = 0
    for d, nc in _raw(
        sf_dir,
        "SELECT doc_id, n_chars FROM read_parquet('{D}/documents.parquet')",
    ):
        b = int(nc) // 100
        is_a = int(d) % 2 == 0
        a = bins.setdefault(b, [0, 0])
        a[0 if is_a else 1] += 1
        na += is_a
        nb += not is_a
    want = set()
    for b, (ac, bc) in bins.items():
        appm = (1000000 * ac) // na
        bppm = (1000000 * bc) // nb
        want.add((b, ac, bc, appm, bppm, abs(appm - bppm)))
    got = {
        tuple(r)
        for r in all_queries()["profile_drift_tvd"](spark, sf_dir).collect()
    }
    assert got == want


def test_profile_fd_discovery_matches_violation_walk(spark, sf_dir):
    cases = [
        ("customer", "c_custkey", "c_mktsegment"),
        ("documents", "doc_id", "lang"),
        ("orders", "o_custkey", "o_orderpriority"),
        ("lineitem", "l_orderkey", "l_returnflag"),
        ("lineitem", "l_partkey", "l_suppkey"),
        ("events", "user_id", "event_type"),
    ]
    want = set()
    for tbl, lhs, rhs in cases:
        vals: dict = {}
        for k, v in _raw(
            sf_dir, f"SELECT {lhs}, {rhs} FROM read_parquet('{{D}}/{tbl}.parquet')"
        ):
            vals.setdefault(k, set()).add(v)
        n_keys = len(vals)
        violating = sum(1 for s in vals.values() if len(s) > 1)
        want.add(
            (
                tbl,
                lhs,
                rhs,
                n_keys,
                violating,
                violating == 0,
                (1000000 * violating) // n_keys,
            )
        )
    got = {
        tuple(r)
        for r in all_queries()["profile_fd_discovery"](spark, sf_dir).collect()
    }
    assert got == want


def test_profile_k_anonymity_matches_group_sizes(spark, sf_dir):
    groups: dict[tuple, int] = {}
    for lang, src, nc in _raw(
        sf_dir,
        "SELECT lang, source, n_chars FROM read_parquet('{D}/documents.parquet')",
    ):
        key = (lang, src, int(nc) // 200)
        groups[key] = groups.get(key, 0) + 1
    want = {(l, s, b, n, n < 5) for (l, s, b), n in groups.items()}
    got = {
        tuple(r)
        for r in all_queries()["profile_k_anonymity"](spark, sf_dir).collect()
    }
    assert got == want


def test_sample_join_consistent_matches_hash_gate(spark, sf_dir):
    import hashlib

    def keep(u: int) -> bool:
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 4 < 1

    acc: dict[str, list] = {}
    for u, et, v in _raw(
        sf_dir,
        "SELECT user_id, event_type, value FROM read_parquet('{D}/events.parquet')",
    ):
        u = int(u)
        if not keep(u):
            continue
        a = acc.setdefault(et, [0, set(), 0])
        a[0] += 1
        a[1].add(u)
        a[2] += _q(float(v), 100)
    want = {(et, a[0], len(a[1]), a[2], a[2] * 4) for et, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["sample_join_consistent"](spark, sf_dir).collect()
    }
    assert got == want


def test_sample_weighted_priority_matches_fib_hash(spark, sf_dir):
    per_source: dict[str, list] = {}
    for src, d, nc in _raw(
        sf_dir,
        "SELECT source, doc_id, n_chars FROM read_parquet('{D}/documents.parquet')",
    ):
        d, w = int(d), max(int(nc), 1)
        pri = float(1 + ((d % 2147483648) * 2654435761) % 4294967296) / float(w)
        per_source.setdefault(src, []).append((pri, d, w))
    want = set()
    for src, rows in per_source.items():
        for rk, (pri, d, w) in enumerate(sorted(rows)[:4], start=1):
            want.add((src, d, w, pri, rk))
    got = {
        tuple(r)
        for r in all_queries()["sample_weighted_priority"](spark, sf_dir).collect()
    }
    assert got == want


def test_merge_upsert_customers_matches_upsert_algebra(spark, sf_dir):
    src = [
        (k, nm + "*", _r2(b + 100), seg)
        for k, nm, b, seg in _customers(sf_dir)
        if k % 7 == 0
    ]
    src += [
        (1000000 + int(nk), "new-" + nm, 0.0, "NEW")
        for nk, nm in _raw(
            sf_dir,
            "SELECT n_nationkey, n_name FROM read_parquet('{D}/nation.parquet')",
        )
    ]
    src_keys = {r[0] for r in src}
    kept = [
        (k, nm, _r2(b), seg)
        for k, nm, b, seg in _customers(sf_dir)
        if k not in src_keys
    ]
    want = set(kept) | set(src)
    got = {
        tuple(r)
        for r in all_queries()["merge_upsert_customers"](spark, sf_dir).collect()
    }
    assert got == want


def test_incremental_agg_maintenance_matches_full_fold(spark, sf_dir):
    acc: dict[str, list[int]] = {}
    for pr, tp in _raw(
        sf_dir,
        "SELECT o_orderpriority, o_totalprice FROM read_parquet('{D}/orders.parquet')",
    ):
        a = acc.setdefault(pr, [0, 0])
        a[0] += 1
        a[1] += _q(float(tp), 100)
    want = {(pr, a[0], a[1]) for pr, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["incremental_agg_maintenance"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 15: the pandas-UDF / UDTF battery — the engine exercises the Arrow
# transfer machinery (applyInPandas, SCALAR_ITER, mapInArrow, cogrouped,
# polymorphic UDTFs); the arithmetic contracts replay as plain folds
# --------------------------------------------------------------------------


def test_apply_in_pandas_matches_segment_math(spark, sf_dir):
    segs: dict[str, list] = {}
    for k, _, b, seg in _customers(sf_dir):
        segs.setdefault(seg, []).append((k, _q(b, 100), float(b)))
    want = set()
    for seg, rows in segs.items():
        total = sum(c for _, c, _ in rows)
        n = len(rows)
        ranked = sorted(rows, key=lambda r: (-r[2], r[0]))
        # RANK() over (acctbal DESC, custkey): the key is unique per row,
        # so rank == position
        rank_of = {k: i for i, (k, _, _) in enumerate(ranked, start=1)}
        for k, c, b in rows:
            diff = (c - float(total) / float(n)) / 100.0
            want.add((seg, k, diff, rank_of[k]))
    got = {
        (r["c_mktsegment"], r["c_custkey"], r["bal_minus_seg_mean"], r["seg_rank"])
        for r in all_queries()["udf_apply_in_pandas"](spark, sf_dir).collect()
    }
    assert got == want


def test_arrow_scalar_matches_mod_bucket(spark, sf_dir):
    want = {
        (int(ok), _q(float(tp), 100) % 97)
        for ok, tp in _raw(
            sf_dir,
            "SELECT o_orderkey, o_totalprice FROM read_parquet('{D}/orders.parquet')",
        )
        if int(ok) % 100 == 0
    }
    got = {
        tuple(r)
        for r in all_queries()["udf_arrow_scalar"](spark, sf_dir).collect()
    }
    assert got == want


def test_cogrouped_join_matches_left_fold(spark, sf_dir):
    spend: dict[int, list[int]] = {}
    for c, tp in _raw(
        sf_dir,
        "SELECT o_custkey, o_totalprice FROM read_parquet('{D}/orders.parquet')",
    ):
        a = spend.setdefault(int(c), [0, 0])
        a[0] += 1
        a[1] += _q(float(tp), 100)
    want = set()
    for k, _, b, _ in _customers(sf_dir):
        if k % 100 != 0:
            continue
        n, s = spend.get(k, [0, 0])
        want.add((k, n, s, _q(b, 100)))
    got = {
        tuple(r)
        for r in all_queries()["udf_cogrouped_join"](spark, sf_dir).collect()
    }
    assert got == want


def test_map_in_arrow_matches_mix(spark, sf_dir):
    want = {
        (int(ok), int(ln), _q(float(p), 100) + int(q))
        for ok, ln, p, q in _raw(
            sf_dir,
            "SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity"
            " FROM read_parquet('{D}/lineitem.parquet')",
        )
        if int(ok) % 200 == 0
    }
    got = {
        tuple(r)
        for r in all_queries()["udf_map_in_arrow"](spark, sf_dir).collect()
    }
    assert got == want


def test_pandas_scalar_iter_matches_micro_bucket(spark, sf_dir):
    want = {
        (int(ok), int(ln), _q(float(p), 1000000) % 97)
        for ok, ln, p in _raw(
            sf_dir,
            "SELECT l_orderkey, l_linenumber, l_extendedprice"
            " FROM read_parquet('{D}/lineitem.parquet')",
        )
        if int(ok) % 200 == 0
    }
    got = {
        tuple(r)
        for r in all_queries()["udf_pandas_scalar_iter"](spark, sf_dir).collect()
    }
    assert got == want


def test_udtf_explode_buckets_matches_remainder_split(spark, sf_dir):
    want = set()
    for ok, tp in _raw(
        sf_dir,
        "SELECT o_orderkey, o_totalprice FROM read_parquet('{D}/orders.parquet')",
    ):
        if int(ok) % 500 != 0:
            continue
        cents = _q(float(tp), 100)
        for i in range(3):
            want.add((int(ok), i, cents // 3 + (1 if i < cents % 3 else 0)))
    got = {
        tuple(r)
        for r in all_queries()["udtf_explode_buckets"](spark, sf_dir).collect()
    }
    assert got == want


def test_udtf_polymorphic_split_matches_substrings(spark, sf_dir):
    want = {
        (int(d), t[0:16], t[16:32], t[32:48])
        for d, t in _raw(
            sf_dir,
            "SELECT doc_id, text FROM read_parquet('{D}/documents.parquet')",
        )
        if int(d) % 7 == 0
    }
    got = {
        tuple(r)
        for r in all_queries()["udtf_polymorphic_split"](spark, sf_dir).collect()
    }
    assert got == want


def test_udtf_table_arg_gaps_matches_lag_walk(spark, sf_dir):
    per_user: dict[int, list] = {}
    for e, u, us in [
        (int(e), int(u), int(us))
        for e, u, us in _raw(
            sf_dir,
            "SELECT event_id, user_id, epoch_us(ts)"
            " FROM read_parquet('{D}/events.parquet')",
        )
    ]:
        per_user.setdefault(u, []).append((us, e))
    want = set()
    for u, evs in per_user.items():
        evs.sort()
        gaps = [evs[i][0] - evs[i - 1][0] for i in range(1, len(evs))]
        want.add((u, len(evs), max(gaps) if gaps else 0))
    got = {
        tuple(r)
        for r in all_queries()["udtf_table_arg_gaps"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 16: graph iterative kernels + uplift/gains curves — integer
# PageRank loop, wedge-closure triangles, NTILE decile folds
# --------------------------------------------------------------------------


def test_triangle_count_matches_wedge_walk(spark, sf_dir):
    """Directed (a<b) wedge closure over the MinHash pair graph: triangles
    = ordered pairs (e1, e2, e3) with e1=(a,b), e2=(b,c), e3=(a,c)."""
    pairs = _minhash_pairs_py(sf_dir)
    out: dict[int, set[int]] = {}
    for a, b in pairs:
        out.setdefault(a, set()).add(b)
    tri = 0
    for a, b in pairs:
        tri += len(out.get(b, set()) & out.get(a, set()))
    [r] = all_queries()["graph_triangle_count"](spark, sf_dir).collect()
    assert tuple(r) == (len(pairs), tri)


def test_pagerank_matches_integer_loop(spark, sf_dir):
    """8 rounds of integer PageRank (damping 85/100, floor division at
    every share and at the final mix) over the symmetrized dup graph."""
    pairs = _minhash_pairs_py(sf_dir)
    edges = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: 1000000 for v in deg}
    for _ in range(8):
        nxt: dict[int, int] = {}
        for s, d in edges:
            nxt[d] = nxt.get(d, 0) + r[s] // deg[s]
        r = {v: 150000 + (85 * acc) // 100 for v, acc in nxt.items()}
    got = {
        row["doc_id"]: row["rank_u"]
        for row in all_queries()["graph_pagerank"](spark, sf_dir).collect()
    }
    assert got == r


def _ntile(rows: list, n: int) -> dict:
    """NTILE(n) over pre-sorted rows: first (len % n) buckets get one extra."""
    L = len(rows)
    base, extra = divmod(L, n)
    out = {}
    i = 0
    for b in range(1, n + 1):
        size = base + (1 if b <= extra else 0)
        for row in rows[i : i + size]:
            out[row] = b
        i += size
    return out


def test_gains_lift_deciles_matches_ntile_fold(spark, sf_dir):
    rows = sorted(
        (
            (-int(nc), int(d), 1 if lang == "en" else 0)
            for d, nc, lang in _raw(
                sf_dir,
                "SELECT doc_id, n_chars, lang FROM read_parquet('{D}/documents.parquet')",
            )
        )
    )
    tiles = _ntile(rows, 10)
    per: dict[int, list[int]] = {}
    for row, dec in tiles.items():
        a = per.setdefault(dec, [0, 0])
        a[0] += 1
        a[1] += row[2]
    nn = sum(a[0] for a in per.values())
    pp = sum(a[1] for a in per.values())
    want = set()
    cum_n = cum_p = 0
    for dec in sorted(per):
        n, np_ = per[dec]
        cum_n += n
        cum_p += np_
        want.add(
            (
                dec,
                n,
                np_,
                cum_p,
                (1000000 * cum_p) // pp,
                (1000000 * cum_p * nn) // (cum_n * pp),
            )
        )
    got = {
        tuple(r)
        for r in all_queries()["ml_gains_lift_deciles"](spark, sf_dir).collect()
    }
    assert got == want


def test_qini_curve_matches_uplift_fold(spark, sf_dir):
    users: dict[int, list[int]] = {}
    for u, et in _raw(
        sf_dir,
        "SELECT user_id, event_type FROM read_parquet('{D}/events.parquet')",
    ):
        a = users.setdefault(int(u), [0, 0])
        a[0] += 1
        a[1] = max(a[1], 1 if et == "purchase" else 0)
    rows = sorted((-score, u) for u, (score, _) in users.items())
    tiles = _ntile(rows, 10)
    per: dict[int, list[int]] = {}
    for (negscore, u), dec in tiles.items():
        treated = 1 if u % 2 == 0 else 0
        conv = users[u][1]
        a = per.setdefault(dec, [0, 0, 0, 0])
        a[0] += treated
        a[1] += 1 - treated
        a[2] += treated * conv
        a[3] += (1 - treated) * conv
    want = set()
    nt = nc = ct = cc = 0
    for dec in sorted(per):
        a = per[dec]
        nt += a[0]
        nc += a[1]
        ct += a[2]
        cc += a[3]
        if ct * nc >= cc * nt:
            qini = (1000 * (ct * nc - cc * nt)) // nc
        else:
            qini = -((1000 * (cc * nt - ct * nc)) // nc)
        want.add((dec, nt, nc, ct, cc, qini))
    got = {
        tuple(r)
        for r in all_queries()["ml_qini_curve"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 17: SCD2 intervals, VARIANT shredding, the array/map battery,
# co-located + DPP joins, Z-order layout stats — folds and string walks
# --------------------------------------------------------------------------


def _scd2_hist(sf_dir: str):
    """user -> [(value_r4, valid_from_us, valid_to_us|None)] via LEAD over
    (ts, value)."""
    raw: dict[int, list] = {}
    for u, us, v in _raw(
        sf_dir,
        "SELECT user_id, epoch_us(ts), value FROM read_parquet('{D}/events.parquet')"
        " WHERE event_type = 'purchase'",
    ):
        raw.setdefault(int(u), []).append((int(us), float(v)))
    out = {}
    for u, rows in raw.items():
        rows.sort()
        out[u] = [
            (
                float(Decimal(v).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)),
                us,
                rows[i + 1][0] if i + 1 < len(rows) else None,
            )
            for i, (us, v) in enumerate(rows)
        ]
    return out


def test_scd2_late_splice_matches_interval_walk(spark, sf_dir):
    want = {
        (u, v, vf, vt, vt is None)
        for u, ivs in _scd2_hist(sf_dir).items()
        for v, vf, vt in ivs
    }
    got = {
        tuple(r)
        for r in all_queries()["scd2_late_arriving_splice"](spark, sf_dir).collect()
    }
    assert got == want


def test_scd2_snapshot_asof_matches_midpoint_cut(spark, sf_dir):
    hist = _scd2_hist(sf_dir)
    all_us = [
        int(us)
        for (us,) in _raw(
            sf_dir,
            "SELECT epoch_us(ts) FROM read_parquet('{D}/events.parquet')"
            " WHERE event_type = 'purchase'",
        )
    ]
    t_us = (min(all_us) + max(all_us)) // 2
    want = {
        (u, v, vf)
        for u, ivs in hist.items()
        for v, vf, vt in ivs
        if vf <= t_us and (vt is None or t_us < vt)
    }
    got = {
        tuple(r)
        for r in all_queries()["scd2_snapshot_asof"](spark, sf_dir).collect()
    }
    assert got == want


def test_json_variant_shred_matches_json_loads(spark, sf_dir):
    import json

    acc: dict[tuple, int] = {}
    for et, props in _raw(
        sf_dir,
        "SELECT event_type, props FROM read_parquet('{D}/events.parquet')",
    ):
        k = int(json.loads(props)["k"]) % 10
        acc[(et, k)] = acc.get((et, k), 0) + 1
    want = {(et, k, n) for (et, k), n in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["json_variant_shred"](spark, sf_dir).collect()
    }
    assert got == want


def test_array_map_battery_matches_vocab_walk(spark, sf_dir):
    import re

    want = set()
    for d, text in _raw(
        sf_dir, "SELECT doc_id, text FROM read_parquet('{D}/documents.parquet')"
    ):
        if int(d) % 25 != 0:
            continue
        vocab = sorted(set(re.sub(r"\s+", " ", text).strip().lower().split(" ")))
        long_terms = "|".join(sorted(w for w in vocab if len(w) > 5))
        markers = {"data", "table", "row", "fast"}
        want.add(
            (
                int(d),
                len(vocab),
                vocab[0],
                vocab[-1],
                ",".join(vocab[:3]),
                "data" in vocab,
                long_terms,
                len(set(vocab) & markers),
            )
        )
    got = {
        tuple(r)
        for r in all_queries()["array_map_battery"](spark, sf_dir).collect()
    }
    assert got == want


def test_bucketed_colocated_join_matches_fold(spark, sf_dir):
    pri = {
        int(o): p
        for o, p in _raw(
            sf_dir,
            "SELECT o_orderkey, o_orderpriority FROM read_parquet('{D}/orders.parquet')",
        )
    }
    acc: dict[str, list[int]] = {}
    for ok, q in _raw(
        sf_dir,
        "SELECT l_orderkey, l_quantity FROM read_parquet('{D}/lineitem.parquet')",
    ):
        p = pri[int(ok)]
        a = acc.setdefault(p, [0, 0])
        a[0] += 1
        a[1] += int(q)
    want = {(p, a[0], a[1]) for p, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["join_bucketed_colocated"](spark, sf_dir).collect()
    }
    assert got == want


def test_dynamic_partition_pruning_matches_year_fold(spark, sf_dir):
    rows = _raw(
        sf_dir,
        "SELECT CAST(o_orderdate AS VARCHAR), o_orderpriority, o_totalprice"
        " FROM read_parquet('{D}/orders.parquet')",
    )
    dim = {
        int(od[:4])
        for od, pr, _ in rows
        if pr == "1-URGENT" and int(od[:4]) <= 1996
    }
    acc: dict[int, list[int]] = {}
    for od, _, tp in rows:
        y = int(od[:4])
        if y not in dim:
            continue
        a = acc.setdefault(y, [0, 0])
        a[0] += 1
        a[1] += _q(float(tp), 100)
    want = {(y, a[0], a[1]) for y, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["join_dynamic_partition_pruning"](spark, sf_dir).collect()
    }
    assert got == want


def test_zorder_stats_matches_bit_interleave(spark, sf_dir):
    acc: dict[int, list] = {}
    for pk, sk in _raw(
        sf_dir,
        "SELECT l_partkey, l_suppkey FROM read_parquet('{D}/lineitem.parquet')",
    ):
        a8, b8 = int(pk) % 256, int(sk) % 256
        z = 0
        for bit in range(8):
            z |= ((a8 >> bit) & 1) << (2 * bit)
            z |= ((b8 >> bit) & 1) << (2 * bit + 1)
        b = acc.setdefault(z // 4096, [0, None, None])
        b[0] += 1
        b[1] = z if b[1] is None else min(b[1], z)
        b[2] = z if b[2] is None else max(b[2], z)
    want = {(zb, a[0], a[1], a[2]) for zb, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["layout_zorder_stats"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 18: skew exhibits, the grid pair relation, RFM, and the LLM corpus
# rollups that compose exact-dup, quality, and the MinHash dup graph
# --------------------------------------------------------------------------


def test_skew_salted_agg_matches_flag_fold(spark, sf_dir):
    acc: dict[str, list] = {}
    for rf, q, ok in _raw(
        sf_dir,
        "SELECT l_returnflag, l_quantity, l_orderkey"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        a = acc.setdefault(rf, [0, 0, None, None])
        a[0] += _q(float(q), 100)
        a[1] += 1
        a[2] = int(ok) if a[2] is None else min(a[2], int(ok))
        a[3] = int(ok) if a[3] is None else max(a[3], int(ok))
    want = {(rf, a[0], a[1], a[2], a[3]) for rf, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["skew_salted_agg"](spark, sf_dir).collect()
    }
    assert got == want


def test_skew_salted_join_matches_fanout_fold(spark, sf_dir):
    """The deliberately-skewed fact (93%% of rows on key 0, 16x fan-out)
    joined to the generated dim — the salted and unsalted plans must both
    equal this fold (the engine pair is oracle-checked to one result)."""
    dim = {x: x * 3 + 1 for x in range(1000)}
    acc: dict[int, list[int]] = {}
    for ok, ln, q in _raw(
        sf_dir,
        "SELECT l_orderkey, l_linenumber, l_quantity"
        " FROM read_parquet('{D}/lineitem.parquet')",
    ):
        k = 0 if int(ln) % 7 != 0 else int(ok) % 1000
        v = _q(float(q), 100)
        a = acc.setdefault(k, [0, 0])
        a[0] += 16 * v * dim[k]
        a[1] += 16
    want = {(k, a[0], a[1]) for k, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["skew_salted_join"](spark, sf_dir).collect()
    }
    assert got == want


def test_spatial_grid_join_matches_brute_pairs(spark, sf_dir):
    """The grid equi-join's pair relation vs the O(n^2) brute walk — the
    losslessness claim the DBSCAN family builds on, pinned directly."""
    pts = _dbscan_points(sf_dir)
    keys = sorted(pts)
    R2 = 1 << 28
    want = set()
    for i, a in enumerate(keys):
        ax, ay = pts[a]
        for b in keys[i + 1 :]:
            bx, by = pts[b]
            d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
            if d2 <= R2:
                want.add((a, b, d2))
    got = {
        tuple(r)
        for r in all_queries()["join_spatial_grid"](spark, sf_dir).collect()
    }
    assert got == want


def test_rfm_segmentation_matches_ntile_scores(spark, sf_dir):
    import datetime

    cust: dict[int, list] = {}
    max_d = None
    for c, od, tp in _raw(
        sf_dir,
        "SELECT o_custkey, CAST(o_orderdate AS VARCHAR), o_totalprice"
        " FROM read_parquet('{D}/orders.parquet')",
    ):
        d = datetime.date.fromisoformat(od[:10])
        max_d = d if max_d is None else max(max_d, d)
        a = cust.setdefault(int(c), [None, 0, 0])
        a[0] = d if a[0] is None else max(a[0], d)
        a[1] += 1
        a[2] += _q(float(tp), 100)
    rows = {
        c: ((max_d - a[0]).days, a[1], a[2]) for c, a in cust.items()
    }
    r_score = _ntile(sorted((r, c) for c, (r, f, m) in rows.items()), 5)
    f_score = _ntile(sorted((f, c) for c, (r, f, m) in rows.items()), 5)
    m_score = _ntile(sorted((m, c) for c, (r, f, m) in rows.items()), 5)
    want = set()
    for c, (r, f, m) in rows.items():
        rs, fs, ms = r_score[(r, c)], f_score[(f, c)], m_score[(m, c)]
        want.add((c, r, f, m, rs, fs, ms, f"{rs}{fs}{ms}"))
    got = {
        tuple(r)
        for r in all_queries()["agg_rfm_segmentation"](spark, sf_dir).collect()
    }
    assert got == want


_STOPWORDS = {"the", "a", "and", "of", "is", "to", "in"}


def _doc_quality(toks: list[str]) -> int:
    n = len(toks)
    if n == 0:
        return 0
    stop_ratio = float(sum(1 for t in toks if t in _STOPWORDS)) / float(n)
    return int(20 <= n <= 1000 and stop_ratio >= 0.01)


def test_llm_dataset_card_matches_composed_rollup(spark, sf_dir):
    import hashlib

    toks_by_doc = _doc_tokens(sf_dir)
    langs = {
        lang
        for (lang,) in _raw(
            sf_dir, "SELECT lang FROM read_parquet('{D}/documents.parquet')"
        )
    }
    import re

    norm_hashes = []
    total_toks = 0
    q_pass = 0
    for d, text in _raw(
        sf_dir, "SELECT doc_id, text FROM read_parquet('{D}/documents.parquet')"
    ):
        norm = re.sub(r"\s+", " ", text).strip().lower()
        norm_hashes.append(hashlib.md5(norm.encode()).hexdigest())
        toks = toks_by_doc[int(d)]
        total_toks += len(toks)
        q_pass += _doc_quality(toks)
    n = len(norm_hashes)
    dup_docs = set()
    for a, b in _minhash_pairs_py(sf_dir):
        dup_docs.add(a)
        dup_docs.add(b)
    [r] = all_queries()["llm_dataset_card"](spark, sf_dir).collect()
    assert tuple(r) == (
        n,
        len(langs),
        total_toks,
        (1000000 * q_pass) // n,
        (1000000 * (n - len(set(norm_hashes)))) // n,
        (1000000 * len(dup_docs)) // n,
    )


def test_llm_quality_canonical_dedup_matches_component_walk(spark, sf_dir):
    toks_by_doc = _doc_tokens(sf_dir)
    pairs = _minhash_pairs_py(sf_dir)
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    comp: dict[int, int] = {}
    seen: set[int] = set()
    for v in sorted(adj):
        if v in seen:
            continue
        members = {v}
        stack = [v]
        seen.add(v)
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    members.add(w)
                    stack.append(w)
        label = min(members)
        for u in members:
            comp[u] = label
    groups: dict[int, list] = {}
    for d, label in comp.items():
        toks = toks_by_doc[d]
        groups.setdefault(label, []).append(
            (-_doc_quality(toks), -len(toks), d)
        )
    want = set()
    for label, members in groups.items():
        members.sort()
        negq, neglen, canon = members[0]
        want.add(
            (
                label,
                canon,
                -neglen,
                len(members),
                sum(-q for q, _, _ in members),
            )
        )
    got = {
        tuple(r)
        for r in all_queries()["llm_quality_canonical_dedup"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 19: experimentation/extreme-value stats + RBO — integer ppm chains,
# exact float-order replication, and the doubled-midrank Friedman post-hoc
# --------------------------------------------------------------------------


def _round6(x: float) -> float:
    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def test_mean_excess_profile_matches_threshold_fold(spark, sf_dir):
    vals = [
        (float(v), _q(float(v), 100))
        for (v,) in _raw(
            sf_dir, "SELECT value FROM read_parquet('{D}/events.parquet')"
        )
    ]
    want = set()
    for u in (100, 150, 200, 250):
        exceed = [(v, c) for v, c in vals if v > u]
        n = len(exceed)
        excess = sum(c - 100 * u for _, c in exceed)
        want.add((u, n, excess, excess // max(n, 1)))
    got = {
        tuple(r)
        for r in all_queries()["stats_mean_excess_profile"](spark, sf_dir).collect()
    }
    assert got == want


def test_rescaled_range_matches_segment_walk(spark, sf_dir):
    import datetime

    base = datetime.date(2024, 1, 1)
    daily: dict[int, int] = {}
    for d, v in _raw(
        sf_dir,
        "SELECT CAST(CAST(ts AS DATE) AS VARCHAR), value"
        " FROM read_parquet('{D}/events.parquet') WHERE event_type = 'purchase'",
    ):
        day = (datetime.date.fromisoformat(d) - base).days
        daily[day] = daily.get(day, 0) + _q(float(v), 100)
    want = set()
    for w in (8, 16, 32):
        segs: dict[int, list] = {}
        for day in sorted(daily):
            segs.setdefault(day // w, []).append(daily[day])
        n_full = 0
        rs_sum = 0
        for xs in segs.values():
            n = len(xs)
            if n != w:
                continue
            n_full += 1
            sx = sum(xs)
            sxx = sum(x * x for x in xs)
            if n * sxx - sx * sx <= 0:
                continue
            cum = 0
            devs = []
            for k, x in enumerate(xs, start=1):
                cum += x
                devs.append(n * cum - k * sx)
            rng = max(devs) - min(devs)
            std2 = (float(sxx) - float(sx) * float(sx) / float(n)) / float(n)
            rs_sum += math.floor(
                1000000.0 * (float(rng) / float(n)) / math.sqrt(std2)
            )
        if n_full:
            want.add((w, n_full, rs_sum))
    got = {
        tuple(r)
        for r in all_queries()["stats_rescaled_range"](spark, sf_dir).collect()
    }
    assert got == want


def test_ratio_metric_delta_ci_matches_float_chain(spark, sf_dir):
    per_user: dict[int, list[int]] = {}
    for u, et, v in _raw(
        sf_dir,
        "SELECT user_id, event_type, value FROM read_parquet('{D}/events.parquet')",
    ):
        a = per_user.setdefault(int(u), [0, 0])
        a[0] += 1
        if et == "purchase":
            a[1] += _q(float(v), 100)
    want = set()
    for cohort, members in (
        ("even", [a for u, a in per_user.items() if u % 2 == 0]),
        ("odd", [a for u, a in per_user.items() if u % 2 == 1]),
    ):
        n = len(members)
        sx = sum(x for x, _ in members)
        sy = sum(y for _, y in members)
        sxx = sum(x * x for x, _ in members)
        syy = sum(y * y for _, y in members)
        sxy = sum(x * y for x, y in members)
        fn, fsx, fsy = float(n), float(sx), float(sy)
        r = fsy / fsx
        vy = (float(syy) - fsy * fsy / fn) / (fn - 1.0)
        cov = (float(sxy) - fsx * fsy / fn) / (fn - 1.0)
        vx = (float(sxx) - fsx * fsx / fn) / (fn - 1.0)
        se = math.sqrt((vy - 2.0 * r * cov + r * r * vx) / fn) / (fsx / fn)
        want.add(
            (
                cohort,
                n,
                sx,
                sy,
                _round6(r),
                _round6(se),
                _round6(r - 1.96 * se),
                _round6(r + 1.96 * se),
            )
        )
    got = {
        tuple(r)
        for r in all_queries()["stats_ratio_metric_delta_ci"](spark, sf_dir).collect()
    }
    assert got == want


def test_nemenyi_posthoc_matches_block_ranks(spark, sf_dir):
    cells: dict[tuple[int, str], int] = {}
    for u, et, v in _raw(
        sf_dir,
        "SELECT user_id, event_type, value FROM read_parquet('{D}/events.parquet')",
    ):
        key = (int(u) % 12, et)
        cells[key] = cells.get(key, 0) + _q(float(v), 100)
    blocks = sorted({b for b, _ in cells})
    r2j: dict[str, int] = {}
    nblk: dict[str, int] = {}
    for b in blocks:
        row = {t: cv for (bb, t), cv in cells.items() if bb == b}
        ranks = _ar2(list(row.values()))
        for t, cv in row.items():
            r2j[t] = r2j.get(t, 0) + ranks[cv]
            nblk[t] = nblk.get(t, 0) + 1
    want = set()
    types = sorted(r2j)
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            diff = abs(r2j[a] - r2j[b])
            sig = 1 if diff * diff * 100000 > 14883968 * nblk[a] else 0
            want.add((a, b, diff, nblk[a], sig))
    got = {
        tuple(r)
        for r in all_queries()["stats_nemenyi_posthoc"](spark, sf_dir).collect()
    }
    assert got == want


def test_event_study_matches_period_gaps(spark, sf_dir):
    import datetime

    anchor = datetime.date(2024, 1, 16)
    per: dict[int, list[int]] = {}
    for u, d, v in _raw(
        sf_dir,
        "SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR), value"
        " FROM read_parquet('{D}/events.parquet') WHERE event_type = 'purchase'",
    ):
        day = datetime.date.fromisoformat(d)
        if not (anchor - datetime.timedelta(days=14) <= day
                < anchor + datetime.timedelta(days=14)):
            continue
        period = ((day - anchor).days + 14) // 7 - 2
        treated = int(u) % 2 == 0
        a = per.setdefault(period, [0, 0, 0, 0])
        if treated:
            a[0] += 1
            a[1] += _q(float(v), 100)
        else:
            a[2] += 1
            a[3] += _q(float(v), 100)
    want = set()
    for p, (nt, st, nc, sc) in per.items():
        num = st * nc - sc * nt
        if num >= 0:
            gap = (1000 * num) // (nt * nc)
        else:
            gap = -((1000 * -num) // (nt * nc))
        want.add((p, nt, nc, gap))
    got = {
        tuple(r)
        for r in all_queries()["stats_event_study_leads_lags"](spark, sf_dir).collect()
    }
    assert got == want


def test_cuped_matches_integer_regression(spark, sf_dir):
    users = {
        int(u)
        for (u,) in _raw(
            sf_dir, "SELECT DISTINCT user_id FROM read_parquet('{D}/events.parquet')"
        )
    }
    per: dict[int, list[int]] = {u: [0, 0] for u in users}
    for u, ts, v in _raw(
        sf_dir,
        "SELECT user_id, CAST(ts AS VARCHAR), value"
        " FROM read_parquet('{D}/events.parquet') WHERE event_type = 'purchase'",
    ):
        vi = _q(float(v), 1)
        if ts < "2024-01-16":
            per[int(u)][0] += vi
        else:
            per[int(u)][1] += vi
    n = len(per)
    sx = sum(a[0] for a in per.values())
    sy = sum(a[1] for a in per.values())
    sxx = sum(a[0] * a[0] for a in per.values())
    sxy = sum(a[0] * a[1] for a in per.values())
    syy = sum(a[1] * a[1] for a in per.values())
    nt = sum(1 for u in per if u % 2 == 0)
    sxt = sum(a[0] for u, a in per.items() if u % 2 == 0)
    syt = sum(a[1] for u, a in per.items() if u % 2 == 0)
    vxx = n * sxx - sx * sx
    vyy = n * syy - sy * sy
    rho2 = 0 if vxx == 0 or vyy == 0 else (
        1000000 * (n * sxy - sx * sy) ** 2
    ) // (vxx * vyy)
    def _tdiv(a: int, b: int) -> int:
        # DuckDB/Spark integer division truncates toward zero; Python //
        # floors — they differ on negative numerators (bit the sf0.01 run)
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    dnum = syt * (n - nt) - (sy - syt) * nt
    draw = _tdiv(1000000 * dnum, nt * (n - nt))
    if vxx == 0:
        dcuped = draw
    else:
        dcuped = _tdiv(
            1000000
            * (dnum * vxx - (n * sxy - sx * sy) * (sxt * (n - nt) - (sx - sxt) * nt)),
            nt * (n - nt) * vxx,
        )
    [r] = all_queries()["events_cuped_variance_reduction"](spark, sf_dir).collect()
    assert tuple(r) == (nt, n - nt, rho2, draw, dcuped)


def test_power_analysis_matches_variance_chain(spark, sf_dir):
    n = s = q = 0
    for u, v in _raw(
        sf_dir,
        "SELECT user_id, value FROM read_parquet('{D}/events.parquet')"
        " WHERE event_type = 'purchase'",
    ):
        if int(u) % 2 != 1:
            continue
        c = _q(float(v), 100)
        n += 1
        s += c
        q += c * c
    var = (float(q) - float(s) * float(s) / float(n)) / float(n - 1)
    want = set()
    for mde in (100, 200, 500, 1000):
        mean = float(s) / float(n)
        delta = float(mde) * mean / 10000.0
        req = math.ceil((2.0 * 7.84896256 * var) / (delta * delta))
        want.add((mde, n, int(req)))
    got = {
        tuple(r)
        for r in all_queries()["events_power_analysis"](spark, sf_dir).collect()
    }
    assert got == want


def test_sprt_sequential_matches_llr_walk(spark, sf_dir):
    daily: dict[tuple[int, str], list[int]] = {}
    for u, d, et in _raw(
        sf_dir,
        "SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR), event_type"
        " FROM read_parquet('{D}/events.parquet')",
    ):
        a = daily.setdefault((int(u) % 2, d), [0, 0])
        a[0] += 1 if et == "purchase" else 0
        a[1] += 1
    want = set()
    for arm in (0, 1):
        days = sorted(d for a, d in daily if a == arm)
        cs = cn = 0
        llrs = []
        for d in days:
            s_day, n_day = daily[(arm, d)]
            cs += s_day
            cn += n_day
            llrs.append(200671 * cs + -50010 * (cn - cs))
        cross = next(
            (i + 1 for i, l in enumerate(llrs) if l >= 2944439 or l <= -2944439),
            None,
        )
        if cross is None:
            decision, at_cross = "continue", 0
        else:
            at_cross = llrs[cross - 1]
            decision = "reject_h0" if at_cross >= 2944439 else "accept_h0"
        want.add(
            (
                arm,
                len(days),
                cn,
                cs,
                llrs[-1],
                cross or 0,
                at_cross,
                decision,
            )
        )
    got = {
        tuple(r)
        for r in all_queries()["events_sprt_sequential"](spark, sf_dir).collect()
    }
    assert got == want


def test_rank_biased_overlap_matches_dual_lists(spark, sf_dir):
    emb = _embeddings(sf_dir)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}
    dense = {
        q: [v for (_, v) in sorted(_topk_py(emb, norms, q, [v for v in emb if v != q], 10))]
        for q in range(10)
        if q in emb
    }
    # dense rank map: (q, v) -> rank
    dense_rank = {}
    for q in dense:
        ranked = sorted(
            _topk_py(emb, norms, q, [v for v in emb if v != q], 10).items(),
            key=lambda kv: kv[1][1],
        )
        for (qq, v), (_, rk) in ranked:
            dense_rank[(qq, v)] = rk
    toks = {d: set(t) for d, t in _doc_tokens(sf_dir).items()}
    W = {1: 1788440, 2: 498200, 3: 175640, 4: 68120, 5: 27800,
         6: 11672, 7: 4952, 8: 2072, 9: 812, 10: 252}
    want = set()
    for q in dense:
        ov = [
            (-(len(toks[q] & toks[d])), d)
            for d in toks
            if d != q and len(toks[q] & toks[d]) > 0
        ]
        sparse_rank = {
            d: rk for rk, (negov, d) in enumerate(sorted(ov)[:10], start=1)
        }
        n_common = 0
        wsum = 0
        for (qq, v), rk_d in dense_rank.items():
            if qq != q or v not in sparse_rank:
                continue
            n_common += 1
            wsum += W.get(max(rk_d, sparse_rank[v]), 0)
        want.add((q, n_common, (1000000 * wsum) // 2580480 if n_common else 0))
    got = {
        tuple(r)
        for r in all_queries()["ml_rank_biased_overlap"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 20: BM25, deterministic resampling (Poisson bootstrap, permutation
# test), and DSIR importance weights — hashlib resampling + float chains
# --------------------------------------------------------------------------


def test_bm25_topk_matches_bitlength_idf(spark, sf_dir):
    toks = _doc_tokens(sf_dir)
    terms = ["spark", "join", "dup"]
    feat = {
        d: (len(t), [sum(1 for x in t if x == q) for q in terms])
        for d, t in toks.items()
    }
    n_docs = len(feat)
    sum_dl = sum(dl for dl, _ in feat.values())
    df = [
        sum(1 for _, fs in feat.values() if fs[i] > 0) for i in range(3)
    ]
    avgdl = float(sum_dl) / float(n_docs)
    scored = []
    for d, (dl, fs) in feat.items():
        score = 0.0
        for i in range(3):
            idf = float(((n_docs + 1) // (df[i] + 1)).bit_length())
            score = score + idf * (
                (float(fs[i]) * 2.2)
                / (float(fs[i]) + 0.3 + 0.9 * float(dl) / avgdl)
            )
        scored.append((-score, d, dl))
    want = {(d, dl, -negs) for negs, d, dl in sorted(scored)[:20]}
    got = {
        tuple(r)
        for r in all_queries()["text_bm25_topk"](spark, sf_dir).collect()
    }
    assert got == want


def test_poisson_bootstrap_matches_hashlib_weights(spark, sf_dir):
    import hashlib

    CUTS = [367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990]
    rows = [
        (u, ts, _q(float(v), 100))
        for u, ts, v in _raw(
            sf_dir,
            "SELECT user_id, CAST(ts AS VARCHAR), value"
            " FROM read_parquet('{D}/events.parquet') WHERE event_type = 'purchase'",
        )
    ]
    m_cents = []
    for i in range(32):
        sw = swv = 0
        for u, ts, cents in rows:
            rk = hashlib.md5(f"{u}|{ts}|{cents}".encode()).hexdigest()
            hv = int(hashlib.md5(f"{rk}#{i}".encode()).hexdigest()[:12], 16) % 1000000
            w = next((j for j, c in enumerate(CUTS) if hv < c), 8)
            sw += w
            swv += w * cents
        m_cents.append(swv // sw if sw else 0)
    sm = sum(m_cents)
    sq = sum(m * m for m in m_cents)
    var_scaled = 32 * sq - sm * sm
    [r] = all_queries()["stats_poisson_bootstrap"](spark, sf_dir).collect()
    assert tuple(r) == (32, sm, var_scaled, var_scaled // (32 * 31))


def test_permutation_diff_test_matches_fib_hash_flips(spark, sf_dir):
    rows = [
        (int(e), int(u), _q(float(v), 100))
        for e, u, v in _raw(
            sf_dir,
            "SELECT event_id, user_id, value"
            " FROM read_parquet('{D}/events.parquet') WHERE event_type = 'purchase'",
        )
    ]
    n1 = sum(1 for _, u, _ in rows if u % 2 == 0)
    s1 = sum(v for _, u, v in rows if u % 2 == 0)
    n2 = len(rows) - n1
    s2 = sum(v for _, u, v in rows if u % 2 == 1)
    obs = abs(s1 * n2 - s2 * n1)
    n_extreme = 0
    for b in range(1, 200):
        n1b = s1b = n2b = s2b = 0
        for e, _, v in rows:
            side = (((e + b * 7919) * 2654435761) // 1048576) % 2
            if side == 0:
                n1b += 1
                s1b += v
            else:
                n2b += 1
                s2b += v
        if abs(s1b * n2b - s2b * n1b) * (n1 * n2) >= obs * (n1b * n2b):
            n_extreme += 1
    [r] = all_queries()["stats_permutation_diff_test"](spark, sf_dir).collect()
    assert tuple(r) == (199, n_extreme, (1000000 * (1 + n_extreme)) // 200)


def test_dsir_weights_matches_bucket_lift_walk(spark, sf_dir):
    import hashlib

    toks = _doc_tokens(sf_dir)
    langs = {
        int(d): lang
        for d, lang in _raw(
            sf_dir, "SELECT doc_id, lang FROM read_parquet('{D}/documents.parquet')"
        )
    }
    prof: dict[int, list[int]] = {}
    doc_buckets: dict[int, list[int]] = {}
    for d, ts in toks.items():
        bs = [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 256 for t in ts
        ]
        doc_buckets[d] = bs
        for b in bs:
            a = prof.setdefault(b, [0, 0])
            a[0] += langs[d] == "en"
            a[1] += 1
    nt = sum(a[0] for a in prof.values())
    ns = sum(a[1] for a in prof.values())
    lift = {
        b: (1000000 * (a[0] + 1) * (ns + 256)) // ((a[1] + 1) * (nt + 256))
        for b, a in prof.items()
    }
    scored = []
    for d, bs in doc_buckets.items():
        n_toks = len(bs)
        score = sum(lift[b] for b in bs)
        scored.append((-(score // n_toks), d, langs[d], n_toks, score))
    want = {
        (d, lang, n_toks, score, -negper)
        for negper, d, lang, n_toks, score in sorted(scored)[:25]
    }
    got = {
        tuple(r)
        for r in all_queries()["llm_dsir_importance_weights"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 21: the embedding-cosine dedup (quantized sign-LSH), the VARIANT/
# SQL-UDF batteries, the remaining transactional exhibits, and the
# reference-parity backfill e2e — hashlib banding + set algebra
# --------------------------------------------------------------------------


def test_dedup_embedding_cosine_matches_quantized_banding(spark, sf_dir):
    """Banded sign-LSH (6 tables x 4 md5-parity hyperplanes) candidates,
    verified by the quantized integer-Gram cosine at >= 0.35 — signs,
    quantization, and the order-free integer sums all rebuilt from raw."""
    import hashlib

    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        DUP_COSINE_THRESHOLD,
        DUP_QUANT_SCALE,
        LSH_PLANES_PER_TABLE,
        LSH_TABLES,
    )

    emb = _embeddings(sf_dir)
    signs = {}
    for p in range(LSH_TABLES * LSH_PLANES_PER_TABLE):
        row = []
        for i in range(64):
            h = hashlib.md5(f"{p}_{i}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
        signs[p] = row

    # plane dot replayed EXACTLY as the SQL's left-assoc signed sum
    def plane_dot(v: list[float], p: int) -> float:
        d = 0.0
        for i in range(64):
            d = d + v[i] if signs[p][i] > 0 else d - v[i]
        return d

    def bucket(v, t):
        return tuple(
            plane_dot(v, t * LSH_PLANES_PER_TABLE + s) >= 0
            for s in range(LSH_PLANES_PER_TABLE)
        )

    cand = set()
    for t in range(LSH_TABLES):
        by: dict[tuple, list[int]] = {}
        for vid, v in emb.items():
            by.setdefault(bucket(v, t), []).append(vid)
        for members in by.values():
            ms = sorted(members)
            for i, a in enumerate(ms):
                for b in ms[i + 1 :]:
                    cand.add((a, b))
    qv = {vid: [_q(x, DUP_QUANT_SCALE) for x in v] for vid, v in emb.items()}
    n2 = {vid: sum(x * x for x in q) for vid, q in qv.items()}
    want = set()
    for a, b in cand:
        if n2[a] <= 0 or n2[b] <= 0:
            continue
        dot = sum(x * y for x, y in zip(qv[a], qv[b]))
        cos = float(dot) / (math.sqrt(float(n2[a])) * math.sqrt(float(n2[b])))
        if cos >= DUP_COSINE_THRESHOLD:
            want.add((a, b, cos))
    got = {
        tuple(r)
        for r in all_queries()["dedup_embedding_cosine"](spark, sf_dir).collect()
    }
    assert got == want


def test_scalar_variant_battery_matches_json_walk(spark, sf_dir):
    want = set()
    for ok, st, pr, tp in _raw(
        sf_dir,
        "SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice"
        " FROM read_parquet('{D}/orders.parquet')",
    ):
        if int(ok) % 40 != 0:
            continue
        want.add(
            (
                int(ok),
                int(ok),
                st,
                pr,
                st,
                _q(float(tp), 100),
                True,
                "OBJECT<meta: OBJECT<cents: BIGINT>, ok: BIGINT,"
                " status: STRING, tags: ARRAY<STRING>>",
            )
        )
    got = {
        tuple(r)
        for r in all_queries()["scalar_variant_battery"](spark, sf_dir).collect()
    }
    assert got == want


def test_sql_scalar_udf_battery_matches_fold(spark, sf_dir):
    acc: dict[str, list[int]] = {}
    for rf, p, d, q, sd in _raw(
        sf_dir,
        "SELECT l_returnflag, l_extendedprice, l_discount, l_quantity,"
        " CAST(l_shipdate AS VARCHAR) FROM read_parquet('{D}/lineitem.parquet')",
    ):
        if sd[:10] < "1995-01-01":
            continue
        a = acc.setdefault(rf, [0, 0, 0])
        a[0] += 1
        a[1] += _q(float(p) * (1 - float(d)), 100)
        a[2] += 1 if float(q) >= 30 else 0
    want = {(rf, a[0], a[1], a[2]) for rf, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["sql_scalar_udf_battery"](spark, sf_dir).collect()
    }
    assert got == want


def test_delta_schema_evolution_matches_null_backfill(spark, sf_dir):
    acc: dict[str, list[int]] = {}
    for k, _, b, _ in _customers(sf_dir):
        a = acc.setdefault("∅", [0, 0])
        a[0] += 1
        a[1] += _q(b, 100)
    for nk, _ in _raw(
        sf_dir,
        "SELECT n_nationkey, n_name FROM read_parquet('{D}/nation.parquet')",
    ):
        a = acc.setdefault(f"T-{int(nk) % 3}", [0, 0])
        a[0] += 1
    want = {(t, a[0], a[1]) for t, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["delta_schema_evolution_commit"](spark, sf_dir).collect()
    }
    assert got == want


def test_delta_delete_optimize_matches_survivors(spark, sf_dir):
    acc: dict[str, list[int]] = {}
    for k, _, b, seg in _customers(sf_dir):
        if 1 <= k <= 300:
            continue
        a = acc.setdefault(seg, [0, 0])
        a[0] += 1
        a[1] += _q(_r2(b), 100)
    want = {(seg, a[0], a[1]) for seg, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["delta_delete_optimize"](spark, sf_dir).collect()
    }
    assert got == want


def test_delta_multi_table_tx_matches_move_algebra(spark, sf_dir):
    hot = [0, 0]
    cold = [0, 0]
    for ok, pr, tp in _raw(
        sf_dir,
        "SELECT o_orderkey, o_orderpriority, o_totalprice"
        " FROM read_parquet('{D}/orders.parquet')",
    ):
        cents = _q(float(tp), 100)
        if pr == "1-URGENT" or int(ok) % 10 == 0:
            hot[0] += 1
            hot[1] += cents
        else:
            cold[0] += 1
            cold[1] += cents
    want = {("hot", hot[0], hot[1]), ("cold", cold[0], cold[1])}
    got = {
        tuple(r)
        for r in all_queries()["delta_multi_table_tx"](spark, sf_dir).collect()
    }
    assert got == want


def test_delta_history_relation_matches_op_ledger(spark, sf_dir):
    want = {
        (0, "CREATE", 2),
        (1, "DELETE c_custkey IN [20, 40]", 2),
        (2, "OPTIMIZE n=1", 1),
        (3, "RESTORE v0", 2),
    }
    got = {
        tuple(r)
        for r in all_queries()["delta_history_relation"](spark, sf_dir).collect()
    }
    assert got == want


def test_delta_file_pruned_merge_matches_upsert_algebra(spark, sf_dir):
    src = [
        (k, nm + "~", _r2(_r2(b) + 25), seg)
        for k, nm, b, seg in _customers(sf_dir)
        if k % 5 == 0 and k <= 100
    ]
    src += [
        (3000000 + int(nk), "px-" + nm, 0.0, "PX")
        for nk, nm in _raw(
            sf_dir,
            "SELECT n_nationkey, n_name FROM read_parquet('{D}/nation.parquet')",
        )
    ]
    src_keys = {r[0] for r in src}
    kept = [
        (k, nm, _r2(b), seg)
        for k, nm, b, seg in _customers(sf_dir)
        if k not in src_keys
    ]
    want = set(kept) | set(src)
    got = {
        tuple(r)
        for r in all_queries()["delta_file_pruned_merge"](spark, sf_dir).collect()
    }
    assert got == want


def test_clustered_layout_pruning_matches_range_counts(spark, sf_dir):
    keys = [
        int(k)
        for (k,) in _raw(
            sf_dir, "SELECT l_orderkey FROM read_parquet('{D}/lineitem.parquet')"
        )
    ]
    mx = max(keys)
    lo, hi = mx // 10, (2 * mx) // 10
    in_range = sum(1 for k in keys if lo <= k <= hi)
    [r] = all_queries()["delta_clustered_layout_pruning"](spark, sf_dir).collect()
    assert tuple(r) == (len(keys), in_range, 8, True, True, True)


def test_pipeline_month_backfill_matches_reference_shape(spark, sf_dir):
    """The reference-parity backfill: normalized movie rows rebuilt from
    the deterministic order-derived fixture (title/genre/popularity/URL
    rules exactly as the reference's normalize would emit them)."""
    want = set()
    for ok, od in _raw(
        sf_dir,
        "SELECT o_orderkey, CAST(o_orderdate AS VARCHAR)"
        " FROM read_parquet('{D}/orders.parquet')",
    ):
        k, d = int(ok), od[:10]
        if not ("1995-01-01" <= d <= "1995-03-31") or k % 10 != 0:
            continue
        alt = k % 30 == 0
        title = f"order-{k}-alt" if alt else f"order-{k}"
        want.add(
            (
                k,
                title,
                f"{title} OT",
                d,
                "Action|Comedy" if k % 20 == 0 else "9999",
                5.0,
                11 if alt else 10,
                1.0 + (k % 7) + (0.25 if alt else 0),
                "en",
                f"ov-{k}",
                f"https://cdn/w500/p{k}.jpg" if k % 40 == 0 else None,
            )
        )
    got = {
        tuple(r)
        for r in all_queries()["pipeline_month_backfill_e2e"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 22: the content-defined-chunking family — the buzhash rolling
# window rebuilt bit-for-bit with hashlib, then dedup / snapshot-diff /
# GC / per-batch store accounting on top; plus the incremental
# watermark-dedup admission walk and the registered DataSource aggregates
# --------------------------------------------------------------------------


def _cdc_chunks(text: str) -> list[tuple[str, int]]:
    """(chunk_md5, chunk_len) via the 8-byte rolling xor-of-rotations hash:
    cut AFTER position i when i >= 8 and (h_i & 63) == 0; final cut at
    len(text)."""
    import hashlib

    L = len(text)
    if L == 0:
        return []
    ts = [
        int(hashlib.md5(f"buz_{ord(c)}".encode()).hexdigest()[:8], 16)
        for c in text
    ]

    def rol(x: int, k: int) -> int:
        return ((x << k) | (x >> (32 - k))) & 0xFFFFFFFF

    ends = {L}
    for i in range(1, L + 1):
        h = ts[i - 1]
        for k in range(1, 8):
            prev = ts[i - 1 - k] if i - 1 - k >= 0 else 0
            h ^= rol(prev, k)
        if i >= 8 and (h & 63) == 0:
            ends.add(i)
    out = []
    s = 0
    for e in sorted(ends):
        out.append(
            (hashlib.md5(text[s:e].encode()).hexdigest(), e - s)
        )
        s = e
    return out


def _doc_texts(sf_dir: str) -> dict[int, str]:
    return {
        int(d): t
        for d, t in _raw(
            sf_dir, "SELECT doc_id, text FROM read_parquet('{D}/documents.parquet')"
        )
    }


def test_cdc_chunk_dedup_matches_buzhash_walk(spark, sf_dir):
    chunks = [
        c for _, t in _doc_texts(sf_dir).items() for c in _cdc_chunks(t)
    ]
    md5s = [m for m, _ in chunks]
    total = len(chunks)
    distinct = len(set(md5s))
    [r] = all_queries()["multimodal_cdc_chunk_dedup"](spark, sf_dir).collect()
    assert tuple(r) == (
        total,
        distinct,
        float(distinct) / float(total),
        sum(ln for _, ln in chunks),
    )


def test_cdc_snapshot_diff_matches_edit_walk(spark, sf_dir):
    texts = _doc_texts(sf_dir)
    v0 = {m for t in texts.values() for m, _ in _cdc_chunks(t)}
    v1_chunks = []
    docs_changed = 0
    bytes_changed = 0
    for d, t in texts.items():
        if d % 7 == 0:
            t2 = "EDIT v2: " + t
            docs_changed += 1
            bytes_changed += len(t2)
        else:
            t2 = t
        v1_chunks.extend(_cdc_chunks(t2))
    v1d = {(m, ln) for m, ln in v1_chunks}
    new = {(m, ln) for m, ln in v1d if m not in v0}
    bytes_new = sum(ln for _, ln in new)
    [r] = all_queries()["multimodal_cdc_snapshot_diff"](spark, sf_dir).collect()
    assert tuple(r) == (
        docs_changed,
        len(v1_chunks),
        sum(ln for _, ln in v1_chunks),
        len(new),
        bytes_new,
        bytes_changed,
        float(bytes_new) / float(bytes_changed),
    )


def test_chunk_store_gc_matches_refcount_walk(spark, sf_dir):
    texts = _doc_texts(sf_dir)
    stored: dict[str, int] = {}
    referenced: set[str] = set()
    for d, t in texts.items():
        for m, ln in _cdc_chunks(t):
            stored[m] = min(stored.get(m, ln), ln)
            if d % 7 != 0:
                referenced.add(m)
    gc = {m: ln for m, ln in stored.items() if m not in referenced}
    [r] = all_queries()["multimodal_chunk_store_gc"](spark, sf_dir).collect()
    assert tuple(r) == (
        len(stored),
        len(referenced),
        len(gc),
        sum(gc.values()),
    )


def test_stream_cdc_chunk_store_matches_batch_walk(spark, sf_dir):
    texts = _doc_texts(sf_dir)
    first_seen: dict[str, tuple[int, int]] = {}
    for d, t in texts.items():
        for m, ln in _cdc_chunks(t):
            b = d % 3
            cur = first_seen.get(m)
            first_seen[m] = (
                (min(cur[0], b), min(cur[1], ln)) if cur else (b, ln)
            )
    per_batch: dict[int, list[int]] = {}
    for m, (b, ln) in first_seen.items():
        a = per_batch.setdefault(b, [0, 0])
        a[0] += 1
        a[1] += ln
    want = {(b, a[0], a[1]) for b, a in per_batch.items()}
    got = {
        tuple(r)
        for r in all_queries()["stream_cdc_chunk_store"](spark, sf_dir).collect()
    }
    assert got == want


def test_stream_incremental_dedup_matches_admission_walk(spark, sf_dir):
    """Watermarked corpus admission: per arriving batch, a doc is admitted
    unless its exact hash OR a MinHash band bucket collides with an
    already-admitted doc — the sequential walk the streaming dedup must
    equal."""
    import hashlib
    import re

    texts = _doc_texts(sf_dir)
    norm = {d: re.sub(r"\s+", " ", t).strip().lower() for d, t in texts.items()}
    h = {d: hashlib.md5(n.encode()).hexdigest() for d, n in norm.items()}
    # keep-first per (batch, hash)
    kf: dict[int, tuple[int, str]] = {}
    seen_bh: set[tuple[int, str]] = set()
    for d in sorted(texts):
        key = (d % 3, h[d])
        if key in seen_bh:
            continue
        seen_bh.add(key)
        kf[d] = (d % 3, h[d])
    # band buckets over kf docs
    buckets: dict[int, set[tuple[int, str]]] = {}
    for d in kf:
        toks = norm[d].split(" ")
        L = len(toks)
        shingles = [
            " ".join(toks[i - 1 : i + 2]) for i in range(1, max(L - 2, 1) + 1)
        ]
        hs = [
            (
                int(hashlib.md5(s.encode()).hexdigest()[:15], 16),
                int(hashlib.md5(s.encode()).hexdigest()[16:30], 16),
            )
            for s in shingles
        ]
        sig = [min(h1 + i * h2 for h1, h2 in hs) for i in range(16)]
        buckets[d] = {
            (b, hashlib.md5("|".join(str(sig[b * 4 + r]) for r in range(4)).encode()).hexdigest())
            for b in range(4)
        }
    admitted: dict[int, str] = {}
    admitted_hashes: set[str] = set()
    admitted_buckets: set[tuple[int, str]] = set()
    for batch in (0, 1, 2):
        batch_docs = [d for d, (b, _) in kf.items() if b == batch]
        newly = []
        for d in sorted(batch_docs):
            if kf[d][1] in admitted_hashes:
                continue
            if buckets[d] & admitted_buckets:
                continue
            newly.append(d)
        # batch members are admitted against the PRIOR state, then merged
        for d in newly:
            admitted[d] = kf[d][1]
        admitted_hashes |= {kf[d][1] for d in newly}
        for d in newly:
            admitted_buckets |= buckets[d]
    want = {(d, hh) for d, hh in admitted.items()}
    got = {
        tuple(r)
        for r in all_queries()["stream_incremental_corpus_dedup"](spark, sf_dir).collect()
    }
    assert got == want


def test_sink_python_write_aggregate_matches_fold(spark, sf_dir):
    acc: dict[str, list[int]] = {}
    for pr, tp in _raw(
        sf_dir,
        "SELECT o_orderpriority, o_totalprice FROM read_parquet('{D}/orders.parquet')",
    ):
        a = acc.setdefault(pr, [0, 0])
        a[0] += 1
        a[1] += _q(float(tp), 100)
    want = {(pr, a[0], a[1]) for pr, a in acc.items()}
    got = {
        tuple(r)
        for r in all_queries()["sink_python_datasource_write"](spark, sf_dir).collect()
    }
    assert got == want


def test_sink_python_streamwrite_aggregate_matches_corpus(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.sources.python_source import (
        STREAM_PAGE_SIZE,
        STREAM_PAGES,
    )

    corpus = _md5_corpus(STREAM_PAGES, STREAM_PAGE_SIZE)
    per_page: dict[int, list] = {}
    for rid, page, payload in corpus:
        a = per_page.setdefault(page, [0, 0, set()])
        a[0] += 1
        a[1] += rid
        a[2].add(payload)
    want = {(p, a[0], a[1], len(a[2])) for p, a in per_page.items()}
    got = {
        tuple(r)
        for r in all_queries()["sink_python_datasource_streamwrite"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 23: HITS on the bipartite purchase graph — 3 unrolled rounds of
# exact integer sums with (SCALE*raw) // Σraw L1 normalization, the last
# uncovered active (dict walk, unbounded Python ints = HUGEINT semantics)
# --------------------------------------------------------------------------


def test_hits_bipartite_matches_integer_fixed_point(spark, sf_dir):
    orders_cust = {
        int(o): int(c)
        for o, c in _raw(
            sf_dir,
            "SELECT o_orderkey, o_custkey FROM read_parquet('{D}/orders.parquet')",
        )
    }
    edges = {
        (orders_cust[int(ok)], int(pk))
        for ok, pk in _raw(
            sf_dir,
            "SELECT l_orderkey, l_partkey FROM read_parquet('{D}/lineitem.parquet')",
        )
    }
    h = {c: 1000000 for c, _ in edges}
    a: dict[int, int] = {}
    for _ in range(3):
        raw_a: dict[int, int] = {}
        for c, p in edges:
            raw_a[p] = raw_a.get(p, 0) + h[c]
        tot = sum(raw_a.values())
        a = {p: (1000000 * r) // tot for p, r in raw_a.items()}
        raw_h: dict[int, int] = {}
        for c, p in edges:
            raw_h[c] = raw_h.get(c, 0) + a[p]
        tot = sum(raw_h.values())
        h = {c: (1000000 * r) // tot for c, r in raw_h.items()}
    want = set()
    for role, scores in (("authority", a), ("hub", h)):
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
        want |= {(role, n, s) for n, s in ranked}
    got = {
        tuple(r)
        for r in all_queries()["graph_hits_bipartite"](spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# batch 24: the filtered probe sweep — the Python filter-then-route walk
# extended to probe ranks 1..8, per-(nprobe, query) recall pinned exactly,
# monotonicity proved, and the "filtered needs more probes" effect checked
# against the unfiltered walk on the same routing
# --------------------------------------------------------------------------


def test_filtered_probe_sweep_matches_python_walk(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        _FILTER_LANG,
        _SWEEP_PROBES,
        CENTROID_BASE,
        N_CENTROIDS,
        N_QUERIES,
        TOP_K,
    )

    emb = _embeddings(sf_dir)
    eligible = _eligible_ids(sf_dir, _FILTER_LANG)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}
    cents = {
        cid: emb[CENTROID_BASE + cid]
        for cid in range(N_CENTROIDS)
        if CENTROID_BASE + cid in emb
    }
    cnorm = {cid: math.sqrt(_dot_py(c, c)) for cid, c in cents.items()}

    def cos_to_cent(v, cid):
        return _dot_py(emb[v], cents[cid]) / (norms[v] * cnorm[cid])

    assign = {
        v: min(cents, key=lambda cid: (-cos_to_cent(v, cid), cid)) for v in emb
    }
    probe_order = {
        q: sorted(cents, key=lambda cid: (-cos_to_cent(q, cid), cid))
        for q in range(N_QUERIES)
        if q in emb
    }
    want = set()
    per_query_recall: dict[int, list[int]] = {}
    for q, order in probe_order.items():
        gt = set(
            v
            for (_, v) in _topk_py(
                emb, norms, q, [v for v in emb if v != q and v in eligible], TOP_K
            )
        )
        for nprobe in _SWEEP_PROBES:
            lists = set(order[:nprobe])
            cand = [
                v
                for v in emb
                if v != q and v in eligible and assign[v] in lists
            ]
            approx = set(v for (_, v) in _topk_py(emb, norms, q, cand, TOP_K))
            hits = len(approx & gt)
            want.add((nprobe, q, hits, (1000000 * hits) // TOP_K))
            per_query_recall.setdefault(q, []).append(hits)
    # monotonicity: candidate sets are nested in nprobe
    for q, series in per_query_recall.items():
        assert series == sorted(series), f"query {q} recall not monotone"
    got = {
        tuple(r)
        for r in all_queries()["ann_filtered_probe_sweep"](spark, sf_dir).collect()
    }
    assert got == want


def test_filtered_sweep_fixture_curves_pinned(spark, sf_dir):
    """Fixture-wide recall curves for the filtered and unfiltered routes,
    pinned EXACTLY per scale (1/50-step sensitive). Honest finding from
    building this: "filtered always needs more probes" is a TENDENCY, not
    an invariant — the filter changes the ground-truth set as well as the
    candidate set, and at sf0.01 the filtered route actually beats the
    unfiltered one at nprobe 1-2 on this fixture. What IS invariant
    (nested candidate sets) is the per-query monotonicity the sibling
    test pins; the exact curves below keep any routing or filtering drift
    visible either way."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        _FILTER_LANG,
        _SWEEP_PROBES,
        CENTROID_BASE,
        N_CENTROIDS,
        N_QUERIES,
        TOP_K,
    )

    emb = _embeddings(sf_dir)
    eligible = _eligible_ids(sf_dir, _FILTER_LANG)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}
    cents = {
        cid: emb[CENTROID_BASE + cid]
        for cid in range(N_CENTROIDS)
        if CENTROID_BASE + cid in emb
    }
    cnorm = {cid: math.sqrt(_dot_py(c, c)) for cid, c in cents.items()}

    def cos_to_cent(v, cid):
        return _dot_py(emb[v], cents[cid]) / (norms[v] * cnorm[cid])

    assign = {
        v: min(cents, key=lambda cid: (-cos_to_cent(v, cid), cid)) for v in emb
    }

    def fixture_recall(nprobe: int, restrict: set | None) -> float:
        hits = total = 0
        for q in range(N_QUERIES):
            if q not in emb:
                continue
            order = sorted(cents, key=lambda cid: (-cos_to_cent(q, cid), cid))
            lists = set(order[:nprobe])
            pool = [
                v
                for v in emb
                if v != q and (restrict is None or v in restrict)
            ]
            gt = set(v for (_, v) in _topk_py(emb, norms, q, pool, TOP_K))
            cand = [v for v in pool if assign[v] in lists]
            approx = set(v for (_, v) in _topk_py(emb, norms, q, cand, TOP_K))
            hits += len(approx & gt)
            total += len(gt)
        return hits / total

    scale = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    want = {
        "sf0.001": {1: (0.12, 0.22), 2: (0.2, 0.36), 4: (0.5, 0.6), 8: (0.72, 0.78)},
        "sf0.01": {1: (0.16, 0.12), 2: (0.24, 0.22), 4: (0.44, 0.44), 8: (0.7, 0.74)},
    }[scale]
    for nprobe in _SWEEP_PROBES:
        filt = fixture_recall(nprobe, eligible)
        unfilt = fixture_recall(nprobe, None)
        assert (filt, unfilt) == want[nprobe], (nprobe, filt, unfilt)
