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
