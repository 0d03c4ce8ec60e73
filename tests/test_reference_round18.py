"""Independent brute-force reference tests, round-18 sweep (VERDICT r17
#5/#6): the incremental IVF index maintenance query (`stream_ivf_index_append`,
registered r18, activated r19) — the streamed, foreachBatch-maintained
inverted lists rebuilt as
a literal Python argmax walk, the arrival-independence identity vs a
from-scratch batch rebuild, exactly-once completeness of the appended
micro-batches, and the query-level consequence: post-append recall@k equals
a full rebuild's recall@k, pinned to the exact per-scale value.

Same convention as the r15–r17 sweeps: every result is rebuilt from raw
fixture data in plain Python — sequential left-assoc float loops for vector
math (bit-identical to the engines' explicit expression chains) — NEVER the
engine's DataFrame plans or its oracle SQL, so a bug both engines hash-agree
on cannot survive. DuckDB supplies only raw column pulls. Runs at sf0.001
AND sf0.01 (SPARK_GRAFT_TEST_SF_DIR) per the two-scale protocol.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tmdb_movie_data_pipeline_spark.registry import all_queries


def _embeddings(sf_dir: str) -> dict[int, list[float]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    con.close()
    return {int(v): [float(x) for x in e] for v, e in rows}


def _dot_py(a: list[float], b: list[float]) -> float:
    """SEQUENTIAL left-assoc accumulation — the same addition order as the
    engines' explicit `a[0]*b[0] + a[1]*b[1] + ...` chains."""
    s = 0.0
    for x, y in zip(a, b):
        s = s + x * y
    return s


def _python_assign(emb: dict[int, list[float]]) -> dict[int, int]:
    """Every vector's nearest-centroid list id (cosine DESC, cid ASC) as a
    literal loop — the maintained index's whole content, arrival-free."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        CENTROID_BASE,
        N_CENTROIDS,
    )

    cents = {cid: emb[CENTROID_BASE + cid] for cid in range(N_CENTROIDS)}
    cnorm = {cid: math.sqrt(_dot_py(c, c)) for cid, c in cents.items()}
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}

    def cos_to_cent(v: int, cid: int) -> float:
        return _dot_py(emb[v], cents[cid]) / (norms[v] * cnorm[cid])

    return {v: min(cents, key=lambda cid: (-cos_to_cent(v, cid), cid)) for v in emb}


def test_incremental_index_matches_python_argmax_walk(spark, sf_dir):
    """The maintained index's full content — bootstrap rows AND the three
    streamed micro-batches — must equal the literal per-vector argmax walk
    row for row. This is the by-name independent rebuild for
    stream_ivf_index_append (VERDICT r17 #6: every registered name ships
    with its plain-Python rebuild in the registering round)."""
    emb = _embeddings(sf_dir)
    want = _python_assign(emb)
    got = {
        int(r["vec_id"]): int(r["cid"])
        for r in all_queries()["stream_ivf_index_append"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_incremental_index_is_arrival_independent(spark, sf_dir):
    """Soundness of incremental IVF maintenance: assignment against a FIXED
    codebook is a per-vector argmax, so the streamed index must be
    bit-identical to a from-scratch batch rebuild over the final corpus —
    here the batch side is rebuilt by splitting the Python walk into the
    resident / arriving halves the query streams, asserting the streamed
    half contributed exactly the arriving ids and nothing else."""
    from tmdb_movie_data_pipeline_spark.streaming.incremental_index import (
        APPEND_MOD,
        APPEND_REM,
    )

    emb = _embeddings(sf_dir)
    want = _python_assign(emb)
    arriving = {v for v in emb if v % APPEND_MOD == APPEND_REM}
    resident = set(emb) - arriving
    assert arriving and resident  # the split is non-trivial at both scales

    rows = all_queries()["stream_ivf_index_append"](spark, sf_dir).collect()
    got = {int(r["vec_id"]): int(r["cid"]) for r in rows}
    # the streamed rows agree with the batch walk on BOTH halves — arrival
    # changed when rows entered lists, never where
    assert {v: got[v] for v in arriving} == {v: want[v] for v in arriving}
    assert {v: got[v] for v in resident} == {v: want[v] for v in resident}


def test_incremental_index_exactly_once_and_complete(spark, sf_dir):
    """Exactly-once appends: after the stream drains, every corpus vector
    appears in the index exactly once (no micro-batch replay duplicates, no
    dropped batch), and the cid values are valid list ids."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import N_CENTROIDS

    emb = _embeddings(sf_dir)
    rows = all_queries()["stream_ivf_index_append"](spark, sf_dir).collect()
    ids = [int(r["vec_id"]) for r in rows]
    assert len(ids) == len(emb)  # one row per corpus vector
    assert len(set(ids)) == len(ids)  # no duplicates (exactly-once)
    assert set(ids) == set(emb)  # nothing dropped, nothing invented
    assert all(0 <= int(r["cid"]) < N_CENTROIDS for r in rows)


def test_post_append_recall_equals_full_rebuild(spark, sf_dir):
    """The query-level consequence a production operator cares about: topk
    routed through the MAINTAINED lists has exactly the recall@k of a full
    batch rebuild (the index content is identical, so the probed candidate
    sets are identical). Recall is computed by a literal walk over the
    ENGINE-returned index, compared to the walk over the Python-rebuilt
    index, and pinned to the exact per-scale fixture value (1/50-step
    sensitive, the r17 convention): 18/50 at sf0.001, 11/50 at sf0.01."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        N_PROBE,
        N_QUERIES,
        TOP_K,
    )

    emb = _embeddings(sf_dir)
    norms = {v: math.sqrt(_dot_py(e, e)) for v, e in emb.items()}

    def recall_hits(assign: dict[int, int]) -> int:
        from tmdb_movie_data_pipeline_spark.operators.similarity import (
            CENTROID_BASE,
            N_CENTROIDS,
        )

        cents = {cid: emb[CENTROID_BASE + cid] for cid in range(N_CENTROIDS)}
        cnorm = {cid: math.sqrt(_dot_py(c, c)) for cid, c in cents.items()}
        hits = 0
        for q in range(N_QUERIES):
            probes = sorted(
                cents,
                key=lambda cid: (
                    -(_dot_py(emb[q], cents[cid]) / (norms[q] * cnorm[cid])),
                    cid,
                ),
            )[:N_PROBE]
            cand = [v for v in emb if v != q and assign.get(v) in probes]
            approx = sorted(
                (-(_dot_py(emb[q], emb[v]) / (norms[q] * norms[v])), v)
                for v in cand
            )[:TOP_K]
            exact = sorted(
                (-(_dot_py(emb[q], emb[v]) / (norms[q] * norms[v])), v)
                for v in emb
                if v != q
            )[:TOP_K]
            hits += len({v for _, v in approx} & {v for _, v in exact})
        return hits

    engine_assign = {
        int(r["vec_id"]): int(r["cid"])
        for r in all_queries()["stream_ivf_index_append"](
            spark, sf_dir
        ).collect()
    }
    got = recall_hits(engine_assign)
    want = recall_hits(_python_assign(emb))
    assert got == want  # maintained index ≡ full rebuild at the query level
    # exact per-scale pins exist only for the two protocol fixtures; on any
    # other SPARK_GRAFT_TEST_SF_DIR the identity above is still asserted but
    # the pin is skipped cleanly instead of raising an opaque KeyError
    # (ADVICE r18 #2)
    expected = {
        "/root/testdata/sf0.001": 18,
        "/root/testdata/sf0.01": 11,
    }.get(sf_dir)
    if expected is None:
        pytest.skip(f"no pinned recall value for fixture {sf_dir}")
    assert got == expected
