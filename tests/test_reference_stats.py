"""Independent brute-force reference tests: calibration/eval cluster +
rank-statistics shelf (VERDICT r13 #8, continuing the r13 sweep).

Each test rebuilds the statistic from raw fixture data in plain Python —
textbook float formulas (real ranks, real logs) or unbounded-int / Fraction
arithmetic — NEVER the engine's folded integer constants or its SQL, so a
folded-constant or mis-derived-identity bug that both engines hash-agree on
(the Kruskal /4 precedent) cannot survive.  DuckDB supplies only raw column
pulls and the SHARED tokenization/quantization, the established convention
of the r13 sweep.
"""

from __future__ import annotations

import bisect
import math
from collections import Counter, defaultdict
from fractions import Fraction

import duckdb


def _con(sf_dir: str, *tables: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _avg_ranks(values: list) -> list[float]:
    """Textbook average (midrank) 1-based ranks, float — the independent
    counterpart of every doubled-integer rank device in the engine."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and values[order[j + 1]] == values[order[i]]:
            j += 1
        avg = (i + j + 2) / 2  # ranks i+1 .. j+1 averaged
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


# --------------------------------------------------------------------------
# calibration / eval cluster (documents: score = n_chars, pos = lang == 'en')
# --------------------------------------------------------------------------


def _doc_score_pos(sf_dir: str) -> list[tuple[int, int]]:
    from tmdb_movie_data_pipeline_spark.operators.clustering import (
        _CAL_POS_LANG,
    )

    con = _con(sf_dir, "documents")
    rows = con.execute("SELECT n_chars, lang FROM documents").fetchall()
    con.close()
    return [(int(x), 1 if lang == _CAL_POS_LANG else 0) for x, lang in rows]


def _cal_bins(sf_dir: str) -> dict[int, tuple[int, int]]:
    """{bin: (n, n_pos)} via the shared equal-width integer binning."""
    from tmdb_movie_data_pipeline_spark.operators.clustering import _CAL_BINS

    data = _doc_score_pos(sf_dir)
    mn = min(x for x, _ in data)
    mx = max(x for x, _ in data)
    bins: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for x, pos in data:
        b = (x - mn) * _CAL_BINS // (mx - mn + 1)
        bins[b][0] += 1
        bins[b][1] += pos
    return {b: (n, p) for b, (n, p) in bins.items()}


def test_auc_roc_matches_midrank_reference(spark, sf_dir):
    """AUC via real float midranks and U = R1 − n1(n1+1)/2 vs the
    doubled-rank integer identity."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["ml_auc_roc"](spark, sf_dir).collect()[0]
    data = _doc_score_pos(sf_dir)
    ranks = _avg_ranks([x for x, _ in data])
    n1 = sum(p for _, p in data)
    n0 = len(data) - n1
    r1 = sum(r for r, (_, p) in zip(ranks, data) if p)
    u = r1 - n1 * (n1 + 1) / 2
    auc = u / (n1 * n0)
    assert row["n_pos"] == n1 and row["n_neg"] == n0
    assert row["two_u"] == round(2 * u)  # 2U is an exact integer
    assert abs(row["auc_ppm"] - auc * 1e6) <= 1.0


def test_calibration_bins_match_python_reference(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["bin"]: (r["n"], r["n_pos"], r["rate_ppm"])
        for r in all_queries()["ml_calibration_bins"](spark, sf_dir).collect()
    }
    want = {
        b: (n, p, 10**6 * p // n) for b, (n, p) in _cal_bins(sf_dir).items()
    }
    assert got == want


def test_pr_curve_matches_python_reference(spark, sf_dir):
    """PR points rebuilt by a literal descending-threshold walk over the
    Python-dict histogram, with float precision/recall cross-checks."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["threshold_bin"]: (
            r["tp"], r["fp"], r["fn"], r["precision_ppm"], r["recall_ppm"]
        )
        for r in all_queries()["ml_pr_curve"](spark, sf_dir).collect()
    }
    bins = _cal_bins(sf_dir)
    all_pos = sum(p for _, p in bins.values())
    want = {}
    pred = tp = 0
    for b in sorted(bins, reverse=True):
        n, p = bins[b]
        pred, tp = pred + n, tp + p
        want[b] = (
            tp, pred - tp, all_pos - tp,
            10**6 * tp // pred, 10**6 * tp // all_pos,
        )
        # float cross-check of the ppm floors
        assert abs(want[b][3] - 1e6 * tp / pred) <= 1.0
        assert abs(want[b][4] - 1e6 * tp / all_pos) <= 1.0
    assert got == want


def test_average_precision_matches_float_reference(spark, sf_dir):
    """AP = Σ precision(k)·Δrecall(k): exact two-stage integer rebuild plus
    the REAL float formula within the documented quantization bias."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["ml_average_precision"](spark, sf_dir).collect()[0]
    bins = _cal_bins(sf_dir)
    all_pos = sum(p for _, p in bins.values())
    pred = tp = 0
    num = 0
    ap_float = 0.0
    for b in sorted(bins, reverse=True):
        n, p = bins[b]
        pred, tp = pred + n, tp + p
        num += (10**6 * tp // pred) * p
        ap_float += (tp / pred) * (p / all_pos)
    assert row["all_pos"] == all_pos and row["n_bins"] == len(bins)
    assert row["ap_ppm"] == num // all_pos
    # each precision floor loses < 1 ppm, the final floor < 1 ppm more
    assert abs(row["ap_ppm"] - ap_float * 1e6) <= 2.5


def test_isotonic_pav_matches_stack_reference(spark, sf_dir):
    """The minimax-identity fit vs the classic pool-adjacent-violators
    STACK algorithm run on exact Fractions: floor is monotone, so
    max_i min_j floor(rate_ij) == floor(PAV fit) exactly."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["bin"]: (r["n"], r["n_pos"], r["raw_rate_ppm"], r["fitted_rate_ppm"])
        for r in all_queries()["ml_isotonic_calibration"](
            spark, sf_dir
        ).collect()
    }
    bins = _cal_bins(sf_dir)
    # PAV: pool adjacent bins while the rate decreases
    stack: list[list[int]] = []  # [n, n_pos, first_bin_index_span...]
    spans: list[list] = []  # parallel: list of bins in the block
    for b in sorted(bins):
        n, p = bins[b]
        stack.append([n, p])
        spans.append([b])
        while len(stack) >= 2 and Fraction(stack[-1][1], stack[-1][0]) < (
            Fraction(stack[-2][1], stack[-2][0])
        ):
            n2, p2 = stack.pop()
            bs = spans.pop()
            stack[-1][0] += n2
            stack[-1][1] += p2
            spans[-1].extend(bs)
    want = {}
    for (n_blk, p_blk), bs in zip(stack, spans):
        for b in bs:
            n, p = bins[b]
            want[b] = (n, p, 10**6 * p // n, 10**6 * p_blk // n_blk)
    assert got == want


def test_brier_decomposition_matches_python_reference(spark, sf_dir):
    """Per-bin Brier and reliability numerators rebuilt in unbounded
    Python ints from raw (event_id, event_type), plus a float identity
    check REL_k ≈ n_k(p̄_k − ō_k)²."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["bin"]: (
            r["n"], r["n_pos"], r["sum_p_ppm"], r["brier_num"],
            r["reliability_num"],
        )
        for r in all_queries()["ml_brier_decomposition"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("SELECT event_id, event_type FROM events").fetchall()
    con.close()
    acc: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for eid, et in rows:
        p = (int(eid) * 2654435761) % 1000001
        y = 1 if et == "purchase" else 0
        b = min(p // 100000, 9)
        a = acc[b]
        a[0] += 1
        a[1] += y
        a[2] += p
        a[3] += (p - y * 10**6) ** 2
    want = {
        b: (n, np, sp, bn, (sp - np * 10**6) ** 2 // n)
        for b, (n, np, sp, bn) in acc.items()
    }
    assert got == want
    for b, (n, np, sp, _, rel) in want.items():
        p_bar, o_bar = sp / n / 1e6, np / n
        assert abs(rel / 1e12 - n * (p_bar - o_bar) ** 2) < 1e-3


def test_cohen_kappa_matches_float_reference(spark, sf_dir):
    """Marker-argmax language predictions re-derived in Python from the
    shared tokenization, then kappa = (p_o − p_e)/(1 − p_e) in floats."""
    from tmdb_movie_data_pipeline_spark.operators.text import (
        LANG_MARKERS,
        _TOKENS_SQL,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["ml_cohen_kappa"](spark, sf_dir).collect()[0]
    con = _con(sf_dir, "documents")
    rows = con.execute(f"SELECT lang, {_TOKENS_SQL} FROM documents").fetchall()
    con.close()
    markers = {k: set(v) for k, v in LANG_MARKERS.items()}
    cm: Counter = Counter()
    for lab, toks in rows:
        s = {
            k: sum(1 for t in toks if t in ms) for k, ms in markers.items()
        }
        if s["en"] == 0 and s["es"] == 0 and s["de"] == 0:
            pred = "unknown"
        elif s["en"] >= s["es"] and s["en"] >= s["de"]:
            pred = "en"
        elif s["es"] >= s["de"]:
            pred = "es"
        else:
            pred = "de"
        cm[(lab, pred)] += 1
    n = sum(cm.values())
    diag = sum(c for (a, b), c in cm.items() if a == b)
    row_m: Counter = Counter()
    col_m: Counter = Counter()
    for (a, b), c in cm.items():
        row_m[a] += c
        col_m[b] += c
    pe_num = sum(row_m[k] * col_m[k] for k in row_m if k in col_m)
    p_o, p_e = diag / n, pe_num / n / n
    kappa = (p_o - p_e) / (1 - p_e)
    assert row["n"] == n and row["n_agree"] == diag
    assert row["pe_num"] == pe_num
    assert abs(row["kappa_ppm"] - kappa * 1e6) <= 1.0


# --------------------------------------------------------------------------
# retrieval eval (rebuilt metric arithmetic over the retrieval tiers; the
# tiers themselves carry their own end-to-end Python rebuilds from r13)
# --------------------------------------------------------------------------


def _tiers(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        ann_cosine,
        ann_ivf,
        ann_lsh,
    )

    exact = {
        (r["query_id"], r["neighbor_id"]): r["rank"]
        for r in ann_cosine(spark, sf_dir).collect()
    }
    approx = {
        "ivf": [
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in ann_ivf(spark, sf_dir).collect()
        ],
        "lsh": [
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in ann_lsh(spark, sf_dir).collect()
        ],
    }
    return exact, approx


def test_retrieval_eval_matches_python_reference(spark, sf_dir):
    """recall@K / MRR rebuilt with pure Python ints per (tier, query)."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import TOP_K
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["tier"], r["query_id"]): (
            r["n_hit"], r["recall_ppm"], r["first_hit_rank"], r["mrr_ppm"]
        )
        for r in all_queries()["ml_retrieval_eval"](spark, sf_dir).collect()
    }
    exact, approx = _tiers(spark, sf_dir)
    qids = {q for q, _ in exact}
    want = {}
    for tier, rows in approx.items():
        per_q: dict = defaultdict(list)
        for q, nb, rank in rows:
            if (q, nb) in exact:
                per_q[q].append(rank)
        for q in qids:
            hits = per_q.get(q, [])
            first = min(hits) if hits else 0
            want[(tier, q)] = (
                len(hits),
                10**6 * len(hits) // TOP_K,
                first,
                10**6 // first if first else 0,
            )
    assert got == want


def test_ndcg_matches_float_log_reference(spark, sf_dir):
    """NDCG rebuilt with REAL log2 discounts — the folded _NDCG_W
    integer-literal table is exactly the constant set at risk."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import TOP_K
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["tier"], r["query_id"]): (
            r["dcg_micro"], r["idcg_micro"], r["ndcg_ppm"]
        )
        for r in all_queries()["ml_ndcg_eval"](spark, sf_dir).collect()
    }
    exact, approx = _tiers(spark, sf_dir)
    qids = {q for q, _ in exact}
    w = lambda r: 1.0 / math.log2(r + 1)
    ideal = sum((TOP_K - i) * w(i + 1) for i in range(TOP_K))
    for tier, rows in approx.items():
        dcg: dict = defaultdict(float)
        for q, nb, rank in rows:
            er = exact.get((q, nb))
            if er is not None and rank <= TOP_K:
                dcg[q] += (TOP_K + 1 - er) * w(rank)
        for q in qids:
            dm, im, np_ = got[(tier, q)]
            # weight literals are round(1e6/log2(r+1)): ≤0.5 micro per
            # grade unit, grades ≤ TOP_K, ≤ TOP_K terms
            assert abs(dm - dcg[q] * 1e6) <= 0.5 * TOP_K * TOP_K + 1
            assert abs(im - ideal * 1e6) <= 0.5 * TOP_K * TOP_K + 1
            assert abs(np_ - 1e6 * dcg[q] / ideal) <= 4.0


def test_knn_vote_and_confusion_match_python_reference(spark, sf_dir):
    """The vote/argmax/diagonal stages rebuilt in Python dicts from the
    neighbor relation + raw labels; confusion cells and ppm shares exact."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        _KNN_HOLDOUT_MOD,
        _KNN_HOLDOUT_REM,
        _KNN_K,
        cosine_topk,
    )
    from tmdb_movie_data_pipeline_spark.io import load_table
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    con = _con(sf_dir, "embeddings")
    labels = dict(
        con.execute("SELECT vec_id, label FROM embeddings").fetchall()
    )
    con.close()
    emb = load_table(spark, sf_dir, "embeddings")
    is_hold = emb.vec_id % _KNN_HOLDOUT_MOD == _KNN_HOLDOUT_REM
    nbrs = cosine_topk(
        emb.filter(is_hold), emb.filter(~is_hold), _KNN_K
    ).collect()
    votes: dict = defaultdict(Counter)
    for r in nbrs:
        votes[r["query_id"]][labels[r["neighbor_id"]]] += 1
    want_pred = {}
    for q, c in votes.items():
        lab = min(c, key=lambda k: (-c[k], k))
        want_pred[q] = (
            int(labels[q]), int(lab), c[lab],
            1 if lab == labels[q] else 0,
        )
    got_pred = {
        r["query_id"]: (
            r["true_label"], r["pred_label"], r["n_votes"], r["correct"]
        )
        for r in all_queries()["ml_knn_classify"](spark, sf_dir).collect()
    }
    assert got_pred == want_pred
    cells: Counter = Counter(
        (t, p) for t, p, _, _ in want_pred.values()
    )
    n_total = sum(cells.values())
    want_cm = {
        (t, p): (c, 10**6 * c // n_total, 1 if t == p else 0)
        for (t, p), c in cells.items()
    }
    got_cm = {
        (r["true_label"], r["pred_label"]): (
            r["n"], r["share_ppm"], r["on_diagonal"]
        )
        for r in all_queries()["ml_confusion_matrix"](
            spark, sf_dir
        ).collect()
    }
    assert got_cm == want_cm


# --------------------------------------------------------------------------
# rank statistics (events)
# --------------------------------------------------------------------------


def _purchase_daily_xy(sf_dir: str) -> list[tuple[int, int, int]]:
    """(epoch_day, count, cents) per purchase day — the shared staging."""
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT),
               COUNT(*), SUM(CAST(ROUND(value * 100) AS BIGINT))
        FROM events WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1
    """).fetchall()
    con.close()
    return [(int(d), int(c), int(v)) for d, c, v in rows]


def _typed_cents(sf_dir: str) -> dict[str, list[int]]:
    con = _con(sf_dir, "events")
    rows = con.execute(
        "SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) FROM events"
    ).fetchall()
    con.close()
    out: dict[str, list[int]] = defaultdict(list)
    for et, v in rows:
        out[et].append(int(v))
    return out


def test_kendall_tau_matches_pair_loop_reference(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["stats_kendall_tau"](spark, sf_dir).collect()[0]
    daily = _purchase_daily_xy(sf_dir)
    con = dis = tied = 0
    for i in range(len(daily)):
        for j in range(i + 1, len(daily)):
            prod = (daily[i][1] - daily[j][1]) * (daily[i][2] - daily[j][2])
            if prod > 0:
                con += 1
            elif prod < 0:
                dis += 1
            else:
                tied += 1
    n = len(daily)
    tau = (con - dis) / (n * (n - 1) / 2)
    assert row["n_days"] == n
    assert (row["concordant"], row["discordant"], row["tied"]) == (
        con, dis, tied,
    )
    assert abs(row["tau_a_ppm"] - tau * 1e6) <= 1.0


def test_mann_whitney_matches_midrank_reference(spark, sf_dir):
    """U and the common-language effect size vs real float midranks of the
    pooled sample, for every type pair."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["type_a"], r["type_b"]): (
            r["n_a"], r["n_b"], r["u_a_doubled"], r["auc_ppm"]
        )
        for r in all_queries()["stats_mann_whitney_u"](
            spark, sf_dir
        ).collect()
    }
    vals = _typed_cents(sf_dir)
    for (ta, tb), (n_a, n_b, u2, auc_ppm) in got.items():
        a, b = vals[ta], vals[tb]
        assert (n_a, n_b) == (len(a), len(b))
        ranks = _avg_ranks(a + b)
        r_a = sum(ranks[: len(a)])
        u = r_a - len(a) * (len(a) + 1) / 2
        assert u2 == round(2 * u)
        assert abs(auc_ppm - 1e6 * u / (len(a) * len(b))) <= 1.0


def test_wilcoxon_matches_midrank_reference(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["stats_wilcoxon_signed_rank"](
        spark, sf_dir
    ).collect()[0]
    daily = _purchase_daily_xy(sf_dir)
    xs = [v for _, _, v in daily]
    dx = [b - a for a, b in zip(xs, xs[1:]) if b - a != 0]
    ranks = _avg_ranks([abs(d) for d in dx])
    w_plus = sum(r for r, d in zip(ranks, dx) if d > 0)
    w_minus = sum(r for r, d in zip(ranks, dx) if d < 0)
    n = len(dx)
    assert row["n_pairs"] == n
    assert row["w2_plus"] == round(2 * w_plus)
    assert row["w2_minus"] == round(2 * w_minus)
    assert row["e_w2"] == n * (n + 1) // 2  # doubled E[W+] = n(n+1)/4 · 2
    assert row["dev"] == round(2 * w_plus) - n * (n + 1) // 2


def test_kruskal_wallis_matches_float_reference(spark, sf_dir):
    """H from real pooled midranks: H = 12/(N(N+1))·ΣR_j²/n_j − 3(N+1),
    within the documented ≤ k-ppm per-group floor bias."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    rows = all_queries()["stats_kruskal_wallis"](spark, sf_dir).collect()
    vals = _typed_cents(sf_dir)
    types = sorted(vals)
    pooled = [v for t in types for v in vals[t]]
    ranks = _avg_ranks(pooled)
    big_n = len(pooled)
    h = -3 * (big_n + 1)
    i = 0
    rsums = {}
    for t in types:
        n_j = len(vals[t])
        r_j = sum(ranks[i : i + n_j])
        rsums[t] = r_j
        h += 12 / (big_n * (big_n + 1)) * r_j * r_j / n_j
        i += n_j
    k = len(types)
    for r in rows:
        assert r["n_j"] == len(vals[r["event_type"]])
        assert r["r2_j"] == round(2 * rsums[r["event_type"]])
        assert 0 <= h * 1e6 - r["h_ppm"] <= k + 1
    assert len(rows) == k


def test_friedman_matches_float_reference(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.operators.aggregates import (
        _FRIED_BLOCKS,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    rows = all_queries()["stats_friedman_test"](spark, sf_dir).collect()
    con = _con(sf_dir, "events")
    cells = con.execute(f"""
        SELECT user_id % {_FRIED_BLOCKS}, event_type,
               SUM(CAST(ROUND(value * 100) AS BIGINT))
        FROM events GROUP BY 1, 2
    """).fetchall()
    con.close()
    by_blk: dict = defaultdict(dict)
    for blk, et, cv in cells:
        by_blk[int(blk)][et] = int(cv)
    rsum: Counter = Counter()
    for blk, d in by_blk.items():
        ets = sorted(d)
        ranks = _avg_ranks([d[e] for e in ets])
        for e, r in zip(ets, ranks):
            rsum[e] += r
    n = len(by_blk)
    k = len(rsum)
    chi2 = 12 / (n * k * (k + 1)) * sum(r * r for r in rsum.values()) - (
        3 * n * (k + 1)
    )
    for r in rows:
        assert r["n_blocks"] == n
        assert r["r2j"] == round(2 * rsum[r["event_type"]])
        assert abs(r["chi2_ppm"] - chi2 * 1e6) <= 2.0
    assert len(rows) == k


def test_jonckheere_matches_bisect_reference(spark, sf_dir):
    """JT = Σ_{i<j} (#(a<b) + ½·#(a=b)) counted per ordered weekday-group
    pair with sorted lists + bisect — never the per-value cumulative."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["stats_jonckheere_terpstra"](
        spark, sf_dir
    ).collect()[0]
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7,
               CAST(ROUND(value * 100) AS BIGINT)
        FROM events WHERE event_type = 'purchase'
    """).fetchall()
    con.close()
    groups: dict[int, list[int]] = defaultdict(list)
    for g, v in rows:
        groups[int(g)].append(int(v))
    for g in groups:
        groups[g].sort()
    ks = sorted(groups)
    jt2 = 0
    for ii, gi in enumerate(ks):
        for gj in ks[ii + 1 :]:
            for b in groups[gj]:
                lt = bisect.bisect_left(groups[gi], b)
                le = bisect.bisect_right(groups[gi], b)
                jt2 += 2 * lt + (le - lt)
    n_g = [len(groups[g]) for g in ks]
    n = sum(n_g)
    assert row["n_total"] == n
    assert row["jt_x2"] == jt2
    assert row["e_jt_x4"] == n * n - sum(x * x for x in n_g)


def test_mann_kendall_matches_pair_loop_reference(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["event_type"]: (r["n_pairs"], r["s_stat"])
        for r in all_queries()["stats_mann_kendall"](spark, sf_dir).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT),
               SUM(CAST(ROUND(value * 100) AS BIGINT))
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchall()
    con.close()
    series: dict[str, list[int]] = defaultdict(list)
    for et, _, x in rows:
        series[et].append(int(x))
    want = {}
    for et, xs in series.items():
        s = n_pairs = 0
        for i in range(len(xs)):
            for j in range(i + 1, len(xs)):
                n_pairs += 1
                s += (xs[j] > xs[i]) - (xs[j] < xs[i])
        want[et] = (n_pairs, s)
    assert got == want


def test_theil_sen_matches_sorted_slope_reference(spark, sf_dir):
    """Lower-median pairwise slope per type, rebuilt by literally sorting
    the float slopes (one IEEE division each) with the exact tie-break."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["event_type"]: (
            r["n_pairs"], r["med_dv"], r["med_dd"],
            r["med_slope_cents_per_day"],
        )
        for r in all_queries()["stats_theil_sen"](spark, sf_dir).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT),
               SUM(CAST(ROUND(value * 100) AS BIGINT))
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchall()
    con.close()
    series: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for et, d, v in rows:
        series[et].append((int(d), int(v)))
    want = {}
    for et, pts in series.items():
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dv = pts[j][1] - pts[i][1]
                dd = pts[j][0] - pts[i][0]
                slopes.append((dv / dd, dv, dd))
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1]
        want[et] = (len(slopes), med[1], med[2], med[0])
    assert got == want


def test_ks_two_sample_matches_counter_reference(spark, sf_dir):
    """D = max |F_a − F_b| over pooled points, rebuilt with Counters and
    unbounded-int cross-multiplication."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["type_a"], r["type_b"]): (r["n_a"], r["n_b"], r["ks_num"], r["ks_ppm"])
        for r in all_queries()["stats_ks_two_sample"](spark, sf_dir).collect()
    }
    vals = _typed_cents(sf_dir)
    types = sorted(vals)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            ca, cb = Counter(vals[ta]), Counter(vals[tb])
            n_a, n_b = len(vals[ta]), len(vals[tb])
            cum_a = cum_b = ks = 0
            for x in sorted(set(ca) | set(cb)):
                cum_a += ca.get(x, 0)
                cum_b += cb.get(x, 0)
                ks = max(ks, abs(cum_a * n_b - cum_b * n_a))
            assert got[(ta, tb)] == (
                n_a, n_b, ks, 10**6 * ks // (n_a * n_b)
            ), (ta, tb)
            # float cross-check of the supremum
            assert abs(
                got[(ta, tb)][3] - 1e6 * ks / (n_a * n_b)
            ) <= 1.0


# --------------------------------------------------------------------------
# batch 2: parametric/moment statistics, multiple testing, attribution,
# iterative kernels, feature selection, LM smoothing
# --------------------------------------------------------------------------


def test_anova_oneway_matches_float_reference(spark, sf_dir):
    """F statistic from the textbook per-group SS formulas in plain
    floats (group means, SSB, SSW) — never the engine's pinned-order
    expression tree."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["stats_anova_oneway"](spark, sf_dir).collect()[0]
    vals = _typed_cents(sf_dir)
    groups = [vals[t] for t in sorted(vals)]
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = sum(sum(g) for g in groups) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups)
    ssw = sum(sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["n_total"] == n
    assert abs(row["f_stat"] - f) <= max(1e-6, abs(f) * 1e-9)


def test_chi_square_and_cramers_v_match_float_reference(spark, sf_dir):
    """Cell expectations/contributions and the quantized total vs the
    textbook float contingency formulas; V² from the same table."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    rows = all_queries()["stats_chi_square"](spark, sf_dir).collect()
    con = _con(sf_dir, "events")
    obs_rows = con.execute("""
        SELECT event_type, CAST(strftime(ts, '%w') AS INTEGER), COUNT(*)
        FROM events GROUP BY 1, 2
    """).fetchall()
    con.close()
    obs = {(et, int(d)): int(c) for et, d, c in obs_rows}
    row_t: Counter = Counter()
    col_t: Counter = Counter()
    for (et, d), c in obs.items():
        row_t[et] += c
        col_t[d] += c
    grand = sum(obs.values())
    chi2 = 0.0
    for (et, d), c in obs.items():
        e = row_t[et] * col_t[d] / grand
        chi2 += (c - e) ** 2 / e
    got_total = rows[0]["chi2_micro"]
    for r in rows:
        e = row_t[r["event_type"]] * col_t[r["dow"]] / grand
        assert r["n_obs"] == obs[(r["event_type"], r["dow"])]
        assert abs(r["expected"] - e) <= abs(e) * 1e-9
        assert abs(r["contrib"] - (r["n_obs"] - e) ** 2 / e) <= 1e-6
        assert r["chi2_micro"] == got_total
    # per-cell micro rounding: <= 0.5 micro per cell
    assert abs(got_total - chi2 * 1e6) <= 0.5 * len(obs) + 1
    v = all_queries()["stats_cramers_v"](spark, sf_dir).collect()[0]
    r_dim, c_dim = len(row_t), len(col_t)
    v2 = chi2 / (grand * (min(r_dim, c_dim) - 1))
    assert (v["n_cells"], v["n_rows_dim"], v["n_cols_dim"]) == (
        len(obs), r_dim, c_dim,
    )
    assert v["grand_n"] == grand and v["chi2_micro"] == got_total
    assert abs(v["v2_ppm"] - v2 * 1e6) <= 2.0


def test_cohens_d_matches_float_reference(spark, sf_dir):
    """d = (m1 − m2)/s_pooled from raw per-cohort purchase cents."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["stats_cohens_d"](spark, sf_dir).collect()[0]
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT user_id % 2, CAST(ROUND(value * 100) AS BIGINT)
        FROM events WHERE event_type = 'purchase'
    """).fetchall()
    con.close()
    g1 = [int(v) for u, v in rows if u == 0]
    g2 = [int(v) for u, v in rows if u == 1]
    m1, m2 = sum(g1) / len(g1), sum(g2) / len(g2)
    ssw = sum((x - m1) ** 2 for x in g1) + sum((x - m2) ** 2 for x in g2)
    d = (m1 - m2) / math.sqrt(ssw / (len(g1) + len(g2) - 2))
    assert (row["n1"], row["n2"]) == (len(g1), len(g2))
    assert abs(row["cohens_d"] - d) <= 1e-6  # engine rounds to 6 dp


def test_ztest_two_proportions_matches_float_reference(spark, sf_dir):
    """z² = (p1 − p2)² / (p̂(1−p̂)(1/n1 + 1/n2)) in plain floats."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["stats_ztest_two_proportions"](
        spark, sf_dir
    ).collect()[0]
    con = _con(sf_dir, "events")
    (n1, k1, n2, k2) = con.execute("""
        SELECT SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END),
               SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
                        THEN 1 ELSE 0 END),
               SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END),
               SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
                        THEN 1 ELSE 0 END)
        FROM events
    """).fetchone()
    con.close()
    assert (row["n1"], row["k1"], row["n2"], row["k2"]) == (n1, k1, n2, k2)
    p1, p2, pp = k1 / n1, k2 / n2, (k1 + k2) / (n1 + n2)
    z2 = (p1 - p2) ** 2 / (pp * (1 - pp) * (1 / n1 + 1 / n2))
    assert abs(row["z2_ppm"] - z2 * 1e6) <= 1.0


def test_autocorrelation_matches_python_reference(spark, sf_dir):
    """Per-lag covariance/variance numerators from a literal Python walk
    over the daily series, plus the float r_k consistency check."""
    from tmdb_movie_data_pipeline_spark.operators.aggregates import (
        _ACF_MAX_LAG,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["lag"]: (r["n"], r["cov_num"], r["var_t_num"], r["var_l_num"])
        for r in all_queries()["stats_autocorrelation"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT),
               SUM(CAST(ROUND(value * 100) AS BIGINT))
        FROM events GROUP BY 1
    """).fetchall()
    con.close()
    series = {int(d): int(x) for d, x in rows}
    for k in range(1, _ACF_MAX_LAG + 1):
        pairs = [
            (series[d], series[d - k]) for d in series if d - k in series
        ]
        n = len(pairs)
        st = sum(a for a, _ in pairs)
        sl = sum(b for _, b in pairs)
        stl = sum(a * b for a, b in pairs)
        stt = sum(a * a for a, _ in pairs)
        sll = sum(b * b for _, b in pairs)
        assert got[k] == (
            n, n * stl - st * sl, n * stt - st * st, n * sll - sl * sl,
        )
        # float r_k from the same pairs must match the numerator ratio
        mt, ml = st / n, sl / n
        cov = sum((a - mt) * (b - ml) for a, b in pairs)
        vt = sum((a - mt) ** 2 for a, _ in pairs)
        vl = sum((b - ml) ** 2 for _, b in pairs)
        r_float = cov / math.sqrt(vt * vl)
        r_int = got[k][1] / math.sqrt(got[k][2] * got[k][3])
        assert abs(r_float - r_int) < 1e-9


def _pseudo_p(doc_id: int, strong: bool) -> int:
    if strong and doc_id % 10 == 5:
        return 1 + (doc_id * 2654435761) % 90
    if doc_id % 10 == 0:
        return 2501 + (doc_id * 2654435761) % 500
    return 1 + (doc_id * 2654435761) % 1000000


def test_benjamini_hochberg_matches_stepup_reference(spark, sf_dir):
    """The step-up rejection set rebuilt with Fractions: k* = max{i :
    p_(i) <= i·α/m}, reject ranks <= k* — INCLUDING hypotheses whose own
    inequality fails (the absorption property a naive threshold misses,
    asserted to be non-vacuous)."""
    from tmdb_movie_data_pipeline_spark.operators.aggregates import (
        _BH_ALPHA_PPM,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["doc_id"]: (r["p_ppm"], r["rnk"], r["k_star"])
        for r in all_queries()["stats_benjamini_hochberg"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    ids = [int(i) for (i,) in con.execute(
        "SELECT doc_id FROM documents"
    ).fetchall()]
    con.close()
    m = len(ids)
    alpha = Fraction(_BH_ALPHA_PPM, 10**6)
    ranked = sorted(((_pseudo_p(i, False), i) for i in ids))
    k_star = max(
        (r for r, (p, _) in enumerate(ranked, 1)
         if Fraction(p, 10**6) <= r * alpha / m),
        default=0,
    )
    want = {
        i: (p, r, k_star)
        for r, (p, i) in enumerate(ranked, 1)
        if r <= k_star
    }
    assert got == want
    # absorption is live: some rejected rank fails its OWN inequality
    assert any(
        Fraction(p, 10**6) > r * alpha / m
        for r, (p, i) in enumerate(ranked, 1)
        if r <= k_star
    )


def test_holm_bonferroni_matches_stepdown_reference(spark, sf_dir):
    """Step-down walk: stop at the first rank with p_(k) > α/(m−k+1);
    reject strictly before it."""
    from tmdb_movie_data_pipeline_spark.operators.aggregates import (
        _BH_ALPHA_PPM,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["doc_id"]: (r["p_ppm"], r["rnk"], r["k_stop"])
        for r in all_queries()["stats_holm_bonferroni"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    ids = [int(i) for (i,) in con.execute(
        "SELECT doc_id FROM documents"
    ).fetchall()]
    con.close()
    m = len(ids)
    alpha = Fraction(_BH_ALPHA_PPM, 10**6)
    ranked = sorted(((_pseudo_p(i, True), i) for i in ids))
    k_stop = m + 1
    for r, (p, _) in enumerate(ranked, 1):
        if Fraction(p, 10**6) > alpha / (m - r + 1):
            k_stop = r
            break
    want = {
        i: (p, r, k_stop)
        for r, (p, i) in enumerate(ranked, 1)
        if r < k_stop
    }
    assert got == want


def test_mcnemar_matches_float_reference(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["stats_mcnemar_test"](spark, sf_dir).collect()[0]
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view'
                        AND EXTRACT(DAY FROM ts) <= 15 THEN 1 ELSE 0 END),
               MAX(CASE WHEN event_type = 'view'
                        AND EXTRACT(DAY FROM ts) > 15 THEN 1 ELSE 0 END)
        FROM events GROUP BY 1
    """).fetchall()
    con.close()
    b = sum(1 for _, x, y in rows if x == 1 and y == 0)
    c = sum(1 for _, x, y in rows if x == 0 and y == 1)
    assert row["n_users"] == len(rows)
    assert (row["b_disc"], row["c_disc"]) == (b, c)
    if b + c == 0:
        # all pairs concordant (the sf0.001 state): NULLIF nulls the
        # statistic identically in both engines
        assert row["chi2_ppm"] is None
    else:
        chi2 = (b - c) ** 2 / (b + c)
        assert abs(row["chi2_ppm"] - chi2 * 1e6) <= 1.0


def test_shapley_matches_permutation_reference(spark, sf_dir):
    """Exact Shapley values rebuilt by LITERALLY enumerating all 4! = 24
    channel orderings and averaging marginal contributions — the factorial
    weight table _SHAP_W24 is exactly the folded-constant set at risk.
    Also pins the efficiency identity Σφ = v(full) − v(∅)."""
    from itertools import permutations

    from tmdb_movie_data_pipeline_spark.operators.events import (
        _SHAP_CHANNELS,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["channel"]: r["phi_x24"]
        for r in all_queries()["events_shapley_attribution"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute(
        "SELECT user_id, event_type, ts FROM events ORDER BY user_id, ts"
    ).fetchall()
    con.close()
    first_purchase: dict = {}
    for u, et, ts in rows:
        if et == "purchase" and u not in first_purchase:
            first_purchase[u] = ts
    bit = dict(_SHAP_CHANNELS)
    masks: Counter = Counter()
    touched: dict = defaultdict(int)
    for u, et, ts in rows:
        if (
            u in first_purchase
            and ts < first_purchase[u]
            and et != "purchase"
            and et in bit
        ):
            touched[u] |= bit[et]
    for u in first_purchase:
        masks[touched.get(u, 0)] += 1

    def v(s: int) -> int:
        return sum(e for m, e in masks.items() if (m & s) == m)

    phi: Counter = Counter()
    chans = [c for c, _ in _SHAP_CHANNELS]
    for perm in permutations(chans):
        s = 0
        for c in perm:
            phi[c] += v(s | bit[c]) - v(s)
            s |= bit[c]
    assert got == dict(phi)
    full = sum(bit.values())
    assert sum(phi.values()) == 24 * (v(full) - v(0))


def test_markov_stationary_matches_python_reference(spark, sf_dir):
    """The integer power iteration rebuilt in unbounded-int Python dicts
    from raw (user, ts, event_id)-ordered transitions, plus a float
    power-iteration check that the fixed point tracks the real stationary
    distribution of the row-normalized transition matrix."""
    from tmdb_movie_data_pipeline_spark.operators.events import (
        _MK_ITERS,
        _MK_SCALE,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["event_type"]: r["stationary_u"]
        for r in all_queries()["events_markov_stationary"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    con.close()
    trans: Counter = Counter()
    prev_u = prev_t = None
    for u, et in rows:
        if u == prev_u:
            trans[(prev_t, et)] += 1
        prev_u, prev_t = u, et
    rt: Counter = Counter()
    for (a, _), n in trans.items():
        rt[a] += n
    pi = {t: _MK_SCALE for t in rt}
    pf = {t: 1.0 / len(rt) for t in rt}
    for _ in range(_MK_ITERS):
        nxt: Counter = Counter()
        nf: Counter = Counter()
        for (a, b), n in trans.items():
            nxt[b] += pi[a] * n // rt[a]
            nf[b] += pf.get(a, 0.0) * n / rt[a]
        pi = dict(nxt)
        tot = sum(nf.values())
        pf = {t: x / tot for t, x in nf.items()}
    assert got == pi
    mass = sum(pi.values())
    for t, p in pi.items():
        assert abs(p / mass - pf[t]) < 1e-3, t  # tracks the true chain


def test_pca_power_iteration_matches_python_reference(spark, sf_dir):
    """The shift-renormalized integer iteration rebuilt in unbounded ints
    over the engine's Gram relation, plus a numpy check that the result
    points along the true top eigenvector of the float Gram."""
    import numpy as np

    from tmdb_movie_data_pipeline_spark.operators.clustering import (
        _GRAM_DIM,
        _PCA_ITERS,
        _PCA_TARGET_BITS,
        _PCA_V0,
        embedding_gram,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["i"]: r["v_q"]
        for r in all_queries()["ml_pca_power_iteration"](
            spark, sf_dir
        ).collect()
    }
    gram_rows = embedding_gram(spark, sf_dir).collect()
    g: dict = defaultdict(int)
    for r in gram_rows:
        g[(r["i"], r["j"])] = int(r["gram_q"])
        if r["j"] > r["i"]:
            g[(r["j"], r["i"])] = int(r["gram_q"])
    v = {j: _PCA_V0 for j in range(_GRAM_DIM)}
    for _ in range(_PCA_ITERS):
        u: dict = defaultdict(int)
        for (i, j), q in g.items():
            u[i] += q * v[j]
        m = max(abs(x) for x in u.values())
        s = max(m.bit_length() - _PCA_TARGET_BITS, 0)
        v = {j: x >> s for j, x in u.items()}
    assert got == v
    # the integer fixed point must track REAL float power iteration run
    # the same number of rounds from the same start (the fixture's
    # eigengap is ~1.07, so neither converges to the eigh top in 8
    # rounds — same-round tracking is the honest float check) ...
    gm = np.zeros((_GRAM_DIM, _GRAM_DIM))
    for (i, j), q in g.items():
        gm[i, j] = q
    vf = np.ones(_GRAM_DIM)
    for _ in range(_PCA_ITERS):
        vf = gm @ vf
        vf = vf / np.linalg.norm(vf)
    vi = np.array([float(v[j]) for j in range(_GRAM_DIM)])
    assert abs(vi @ vf) / np.linalg.norm(vi) > 0.999
    # ... and the iteration must MOVE toward the dominant subspace: the
    # Rayleigh quotient strictly improves over the constant start
    v0 = np.ones(_GRAM_DIM) / math.sqrt(_GRAM_DIM)
    r0 = v0 @ gm @ v0
    r8 = (vi @ gm @ vi) / (vi @ vi)
    w = np.linalg.eigvalsh(gm)
    assert r0 < r8 <= w[-1] * (1 + 1e-12)


def test_best_split_gini_matches_python_reference(spark, sf_dir):
    """Every candidate threshold's weighted Gini impurity recomputed in
    floats from a dict histogram; argmin with the bucket tie-break."""
    from tmdb_movie_data_pipeline_spark.operators.clustering import (
        _GINI_BUCKET,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["ml_best_split_gini"](spark, sf_dir).collect()[0]
    con = _con(sf_dir, "documents")
    rows = con.execute("SELECT n_chars, lang FROM documents").fetchall()
    con.close()
    hist: dict = defaultdict(Counter)
    for x, lang in rows:
        hist[int(x) // _GINI_BUCKET][lang] += 1
    langs = sorted({l for c in hist.values() for l in c})
    total = Counter()
    for c in hist.values():
        total.update(c)
    n_all = sum(total.values())
    best = None
    cum = Counter()
    for b in sorted(hist):
        cum.update(hist[b])
        nl = sum(cum.values())
        nr = n_all - nl
        if nr == 0:
            continue
        # weighted impurity: nl·gini_l + nr·gini_r
        #                  = nl − Σcl²/nl + nr − Σcr²/nr
        imp = (
            nl - sum(cum[l] ** 2 for l in langs) / nl
            + nr
            - sum((total[l] - cum[l]) ** 2 for l in langs) / nr
        )
        key = (imp, b, nl, nr)
        if best is None or key < best:
            best = key
    assert row["split_bucket"] == best[1]
    assert (row["n_left"], row["n_right"]) == (best[2], best[3])
    assert abs(row["impurity"] - best[0]) <= abs(best[0]) * 1e-12


def test_chi2_feature_selection_matches_python_reference(spark, sf_dir):
    """Per-feature n-scaled chi² rebuilt in unbounded ints, plus the float
    identity chi2_micro_n ≈ 1e6·n·chi²_float."""
    from tmdb_movie_data_pipeline_spark.operators.clustering import (
        _FS_LEN_BUCKET,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["feature"]: r["chi2_micro_n"]
        for r in all_queries()["ml_chi2_feature_selection"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute(
        "SELECT n_chars, source, lang FROM documents"
    ).fetchall()
    con.close()
    feats = {
        "len_bucket": Counter(
            (str(int(x) // _FS_LEN_BUCKET), lang) for x, _, lang in rows
        ),
        "source": Counter((src, lang) for _, src, lang in rows),
    }
    for feature, obs in feats.items():
        row_t: Counter = Counter()
        col_t: Counter = Counter()
        for (fv, lang), o in obs.items():
            row_t[fv] += o
            col_t[lang] += o
        n = sum(obs.values())
        want = 0
        chi2_float = 0.0
        for (fv, lang), o in obs.items():
            dev = o * n - row_t[fv] * col_t[lang]
            want += 10**6 * dev * dev // (n * row_t[fv] * col_t[lang])
            e = row_t[fv] * col_t[lang] / n
            chi2_float += (o - e) ** 2 / e
        assert got[feature] == want
        # dev²/(n·row·col) == (o−e)²/e with e = row·col/n, so the sum is
        # plain 1e6·chi² (one floor per cell)
        assert abs(got[feature] - 1e6 * chi2_float) <= len(obs) + 1


def test_kn_continuation_matches_dict_reference(spark, sf_dir):
    """Continuation counts, right-diversity, count-of-counts and the KN
    discount rebuilt with plain Python dict bigrams (DuckDB supplies only
    the shared tokenization), discount cross-checked in float."""
    from tmdb_movie_data_pipeline_spark.operators.text import (
        _KN_TOPN,
        _TOKENS_SQL,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    rows = all_queries()["text_kn_continuation"](spark, sf_dir).collect()
    con = _con(sf_dir, "documents")
    docs = con.execute(f"SELECT {_TOKENS_SQL} FROM documents").fetchall()
    con.close()
    bc: Counter = Counter()
    for (toks,) in docs:
        for a, b in zip(toks, toks[1:]):
            bc[(a, b)] += 1
    n1 = sum(1 for c in bc.values() if c == 1)
    n2 = sum(1 for c in bc.values() if c == 2)
    cont: Counter = Counter()
    freq: Counter = Counter()
    rdiv: Counter = Counter()
    for (a, b), c in bc.items():
        cont[b] += 1
        freq[b] += c
        rdiv[a] += 1
    order = sorted(cont, key=lambda w: (-cont[w], w))[:_KN_TOPN]
    disc = 1000 * n1 // (n1 + 2 * n2)
    assert abs(disc - 1000 * n1 / (n1 + 2 * n2)) <= 1.0  # float cross-check
    assert [r["word"] for r in rows] == order
    for r in rows:
        w = r["word"]
        assert (
            r["cont_count"], r["freq"], r["right_div"],
            r["bigram_types"], r["n1"], r["n2"], r["discount_milli"],
        ) == (cont[w], freq[w], rdiv[w], len(bc), n1, n2, disc)


def test_grouped_ols_matches_float_reference(spark, sf_dir):
    """Per-type OLS slope vs the textbook centered least-squares fit in
    plain floats over raw (hour, cents) points."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["event_type"]: (r["n"], r["slope_cents_per_hour"])
        for r in all_queries()["ml_grouped_ols"](spark, sf_dir).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT event_type,
               (epoch_us(ts) // 3600000000)
                 - (epoch_us(TIMESTAMP '1995-01-01 00:00:00') // 3600000000),
               CAST(ROUND(value * 100) AS BIGINT)
        FROM events
    """).fetchall()
    con.close()
    pts: dict = defaultdict(list)
    for et, x, y in rows:
        pts[et].append((int(x), int(y)))
    for et, ps in pts.items():
        n = len(ps)
        mx = sum(x for x, _ in ps) / n
        my = sum(y for _, y in ps) / n
        cov = sum((x - mx) * (y - my) for x, y in ps)
        var = sum((x - mx) ** 2 for x, _ in ps)
        slope = cov / var
        assert got[et][0] == n
        assert abs(got[et][1] - slope) <= abs(slope) * 1e-9 + 1e-12


# --------------------------------------------------------------------------
# batch 3: harmonic/reciprocal folds, Flesch constants, causal estimates,
# graph moments, robust ANOVA
# --------------------------------------------------------------------------


def test_benjamini_yekutieli_matches_stepdown_reference(spark, sf_dir):
    """BY step-up rebuilt independently: the harmonic penalty c(m)
    recomputed both as the engine's documented integer surrogate
    (Σ 1e6 div i, checked within the documented m/1e6 bias of the REAL
    float harmonic sum) and the rejection walk with cross-multiplied
    unbounded ints; also pins the load-bearing BY-vs-BH distinction
    (BY's penalty excludes the marginal tier BH's bar would admit)."""
    from tmdb_movie_data_pipeline_spark.operators.aggregates import (
        _BH_ALPHA_PPM,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["doc_id"]: (r["p_ppm"], r["rnk"], r["k_star"], r["c_micro"])
        for r in all_queries()["stats_benjamini_yekutieli"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    ids = [int(i) for (i,) in con.execute(
        "SELECT doc_id FROM documents"
    ).fetchall()]
    con.close()
    m = len(ids)
    c_micro = sum(10**6 // i for i in range(1, m + 1))
    h_m = sum(1 / i for i in range(1, m + 1))  # the REAL harmonic sum
    assert 0 <= h_m * 1e6 - c_micro <= m  # documented floor bias bound
    ranked = sorted(((_pseudo_p(i, True), i) for i in ids))
    k_by = max(
        (r for r, (p, _) in enumerate(ranked, 1)
         if p * m * c_micro <= r * _BH_ALPHA_PPM * 10**6),
        default=0,
    )
    want = {
        i: (p, r, k_by, c_micro)
        for r, (p, i) in enumerate(ranked, 1)
        if r <= k_by
    }
    assert got == want
    # BH's independence bar on the SAME landscape admits strictly more
    k_bh = max(
        (r for r, (p, _) in enumerate(ranked, 1)
         if p * m <= r * _BH_ALPHA_PPM),
        default=0,
    )
    assert k_by < k_bh
    # ... and BY keeps only the strong tier (p <= 90 ppm block)
    assert all(p <= 90 for r, (p, _) in enumerate(ranked, 1) if r <= k_by)


def test_rrf_fusion_matches_python_reference(spark, sf_dir):
    """RRF fused ranking rebuilt in Python: the sparse distinct-token
    overlap retriever from raw text with set intersections, the dense
    ranks from the shared exact-cosine tier, reciprocal-rank scores
    recomputed from _RRF_K — and the integer floors checked against the
    REAL 1/(k+r) float scores."""
    from tmdb_movie_data_pipeline_spark.operators.similarity import (
        _RRF_DEPTH,
        _RRF_K,
        _RRF_TOP,
        N_QUERIES,
        cosine_topk,
    )
    from tmdb_movie_data_pipeline_spark.operators.text import _TOKENS_SQL
    from tmdb_movie_data_pipeline_spark.io import load_table
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["query_id"], r["neighbor_id"]): (
            r["rank_dense"], r["rank_sparse"], r["rrf_ppm"], r["fused_rank"]
        )
        for r in all_queries()["ml_hybrid_rrf_fusion"](
            spark, sf_dir
        ).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    dense_rows = cosine_topk(
        emb.filter(emb.vec_id < N_QUERIES), emb, _RRF_DEPTH
    ).collect()
    dense = {
        (r["query_id"], r["neighbor_id"]): r["rank"] for r in dense_rows
    }
    con = _con(sf_dir, "documents")
    docs = con.execute(
        f"SELECT doc_id, {_TOKENS_SQL} FROM documents"
    ).fetchall()
    con.close()
    toks = {int(d): set(t) for d, t in docs}
    sparse = {}
    for q in range(N_QUERIES):
        ov = [
            (len(toks[q] & toks[d]), d)
            for d in toks
            if d != q and len(toks[q] & toks[d]) > 0
        ]
        ov.sort(key=lambda x: (-x[0], x[1]))
        for rank, (_, d) in enumerate(ov[:_RRF_DEPTH], 1):
            sparse[(q, d)] = rank
    fused = {}
    for key in set(dense) | set(sparse):
        rd, rs = dense.get(key, 0), sparse.get(key, 0)
        score = (10**6 // (_RRF_K + rd) if rd else 0) + (
            10**6 // (_RRF_K + rs) if rs else 0
        )
        score_f = (1 / (_RRF_K + rd) if rd else 0.0) + (
            1 / (_RRF_K + rs) if rs else 0.0
        )
        assert abs(score - score_f * 1e6) <= 2.0  # two floors
        fused[key] = (rd, rs, score)
    want = {}
    for q in range(N_QUERIES):
        cand = sorted(
            ((v[2], k[1], v) for k, v in fused.items() if k[0] == q),
            key=lambda x: (-x[0], x[1]),
        )
        for fr, (_, nid, v) in enumerate(cand[:_RRF_TOP], 1):
            want[(q, nid)] = (*v, fr)
    assert got == want


def test_readability_matches_flesch_float_reference(spark, sf_dir):
    """fre_milli vs the REAL Flesch formula 206.835 − 1.015·W/S −
    84.6·Y/W with S/W/Y re-derived in Python regex — the three folded
    integer constants (206835/1015/84600) are exactly what's at risk."""
    import re

    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["doc_id"]: (r["n_sents"], r["n_words"], r["n_syll"], r["fre_milli"])
        for r in all_queries()["text_readability"](spark, sf_dir).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    for doc_id, text in rows:
        s = max(
            sum(1 for seg in re.split(r"[.!?]+", text) if seg.strip()), 1
        )
        norm = re.sub(r"\s+", " ", text).strip().lower()
        w = max(len(norm.split(" ")), 1)
        y = len(re.split(r"[aeiouy]+", norm)) - 1
        fre = 206.835 - 1.015 * w / s - 84.6 * y / w
        gs, gw, gy, gf = got[int(doc_id)]
        assert (gs, gw, gy) == (s, w, y), doc_id
        assert gf == 206835 - 1015 * w // s - 84600 * y // w
        assert abs(gf - fre * 1000) <= 2.0, doc_id  # two floors


def test_pmi_lift_matches_python_reference(spark, sf_dir):
    """Windowed co-occurrence lift rebuilt with literal Python window
    walks and checked against the float lift c_pair·T/(c1·c2)."""
    from tmdb_movie_data_pipeline_spark.operators.text import (
        _PMI_MIN_LIFT_PPM,
        _PMI_MIN_PAIR,
        _PMI_WINDOW,
        _TOKENS_SQL,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["w1"], r["w2"]): (r["c_pair"], r["c_w1"], r["c_w2"], r["lift_ppm"])
        for r in all_queries()["text_pmi_lift_pairs"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    docs = con.execute(f"SELECT {_TOKENS_SQL} FROM documents").fetchall()
    con.close()
    pc: Counter = Counter()
    uni: Counter = Counter()
    t = 0
    for (toks,) in docs:
        uni.update(toks)
        t += len(toks)
        for i, a in enumerate(toks):
            for b in toks[i + 1 : i + 1 + _PMI_WINDOW]:
                pc[(min(a, b), max(a, b))] += 1
    want = {}
    for (w1, w2), c in pc.items():
        if c < _PMI_MIN_PAIR:
            continue
        lift = 10**6 * c * t // (uni[w1] * uni[w2])
        if lift >= _PMI_MIN_LIFT_PPM:
            want[(w1, w2)] = (c, uni[w1], uni[w2], lift)
            assert abs(lift - 1e6 * c * t / (uni[w1] * uni[w2])) <= 1.0
    assert got == want


def test_degree_assortativity_matches_pearson_reference(spark, sf_dir):
    """Integer moments rebuilt from the staged pair list, and r²/sign
    checked against the REAL float Pearson correlation of endpoint
    degrees over the symmetrized edge list."""
    from tmdb_movie_data_pipeline_spark.operators.dedup import (
        lsh_pairs_staged,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["graph_degree_assortativity"](
        spark, sf_dir
    ).collect()[0]
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in lsh_pairs_staged(spark, sf_dir).collect()
    ]
    edges = pairs + [(b, a) for a, b in pairs]
    deg: Counter = Counter(u for u, _ in edges)
    me = len(edges)
    xs = [deg[u] for u, _ in edges]
    ys = [deg[v] for _, v in edges]
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    assert (row["n_edges_directed"], row["sum_deg"], row["sum_xy"]) == (
        me, sx, sxy,
    )
    num = me * sxy - sx * sx
    den = me * sxx - sx * sx
    assert row["r_sign"] == (num > 0) - (num < 0)
    assert row["r2_ppm"] == (10**6 * num * num) // (den * den)
    # float Pearson over the same pairs (marginals coincide by symmetry)
    mx = sx / me
    cov = sum((x - mx) * (y - mx) for x, y in zip(xs, ys))
    var = sum((x - mx) ** 2 for x in xs)
    r = cov / var
    assert abs(row["r2_ppm"] - r * r * 1e6) <= 2.0
    assert row["r_sign"] == (r > 0) - (r < 0)


def test_diff_in_diff_matches_float_reference(spark, sf_dir):
    """DiD rebuilt in Python floats: per-user pre/post purchase revenue
    over the FULL user universe, (Δtreated − Δcontrol) in milli-cents."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["stats_diff_in_diff"](spark, sf_dir).collect()[0]
    con = _con(sf_dir, "events")
    d0, d1 = con.execute(
        "SELECT MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)) FROM events"
    ).fetchone()
    users = [int(u) for (u,) in con.execute(
        "SELECT DISTINCT user_id FROM events"
    ).fetchall()]
    rev = con.execute(f"""
        SELECT user_id,
               CASE WHEN CAST(ts AS DATE) <= DATE '{d0}' + CAST(
                    date_diff('day', DATE '{d0}', DATE '{d1}') // 2 AS INT)
                    THEN 0 ELSE 1 END,
               SUM(CAST(ROUND(value * 100) AS BIGINT))
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    """).fetchall()
    con.close()
    cents: dict = defaultdict(int)
    for u, p, c in rev:
        cents[(int(u), int(p))] = int(c)
    t_users = [u for u in users if u % 2 == 0]
    c_users = [u for u in users if u % 2 == 1]
    st0 = sum(cents[(u, 0)] for u in t_users)
    st1 = sum(cents[(u, 1)] for u in t_users)
    sc0 = sum(cents[(u, 0)] for u in c_users)
    sc1 = sum(cents[(u, 1)] for u in c_users)
    assert (row["n_treat"], row["n_ctrl"]) == (len(t_users), len(c_users))
    assert (
        row["treat_pre_cents"], row["treat_post_cents"],
        row["ctrl_pre_cents"], row["ctrl_post_cents"],
    ) == (st0, st1, sc0, sc1)
    did = 1000 * (
        (st1 - st0) / len(t_users) - (sc1 - sc0) / len(c_users)
    )
    assert abs(row["did_milli_cents"] - did) <= 1.0


def test_brown_forsythe_matches_float_reference(spark, sf_dir):
    """Per-group lower medians, absolute deviations and the textbook
    ANOVA F over them, all in plain Python floats."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["stats_brown_forsythe"](spark, sf_dir).collect()[0]
    vals = _typed_cents(sf_dir)
    zs = {}
    for t, vs in vals.items():
        med = sorted(vs)[(len(vs) + 1) // 2 - 1]  # lower median
        zs[t] = [abs(v - med) for v in vs]
    groups = [zs[t] for t in sorted(zs)]
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = sum(sum(g) for g in groups) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups)
    ssw = sum(sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["n_total"] == n
    assert abs(row["f_stat"] - f) <= max(1e-6, abs(f) * 1e-9)


def test_kruskal_mean_ranks_matches_midrank_reference(spark, sf_dir):
    """Per-priority mean rank of order totals vs real float midranks of
    the pooled sample."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["grp"]: (
            r["n"], r["rank_sum_x2"], r["mean_rank_milli"],
            r["expected_milli"], r["dev_milli"],
        )
        for r in all_queries()["stats_kruskal_mean_ranks"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "orders")
    rows = con.execute(
        "SELECT o_orderpriority, CAST(ROUND(o_totalprice) AS BIGINT)"
        " FROM orders"
    ).fetchall()
    con.close()
    grps: dict = defaultdict(list)
    for g, v in rows:
        grps[g].append(int(v))
    order = sorted(grps)
    pooled = [v for g in order for v in grps[g]]
    ranks = _avg_ranks(pooled)
    n_total = len(pooled)
    i = 0
    for g in order:
        n = len(grps[g])
        rsum = sum(ranks[i : i + n])
        i += n
        gn, rx2, mrm, em, dm = got[g]
        assert gn == n
        assert rx2 == round(2 * rsum)
        assert abs(mrm - 1000 * rsum / n) <= 1.0
        assert em == 500 * (n_total + 1)
        assert dm == mrm - em


def test_ks_one_pair_matches_counter_reference(spark, sf_dir):
    """stats_ks_test (the purchase-vs-view pair, numerator-only form)
    rebuilt with Counters."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["stats_ks_test"](spark, sf_dir).collect()[0]
    vals = _typed_cents(sf_dir)
    a, b = vals["purchase"], vals["view"]
    ca, cb = Counter(a), Counter(b)
    cum1 = cum2 = d = 0
    for x in sorted(set(ca) | set(cb)):
        cum1 += ca.get(x, 0)
        cum2 += cb.get(x, 0)
        d = max(d, abs(len(b) * cum1 - len(a) * cum2))
    assert (row["n1"], row["n2"], row["d_num"]) == (len(a), len(b), d)
    # float supremum consistency
    assert abs(
        d / (len(a) * len(b))
        - max(
            abs(
                sum(1 for v in a if v <= x) / len(a)
                - sum(1 for v in b if v <= x) / len(b)
            )
            for x in set(a) | set(b)
        )
    ) < 1e-12


def test_ab_ttest_matches_welch_float_reference(spark, sf_dir):
    """Welch t and Satterthwaite dof per event type from raw per-cohort
    cents in plain Python floats."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["event_type"]: (r["n_a"], r["n_b"], r["t_stat"], r["dof"])
        for r in all_queries()["stats_ab_ttest"](spark, sf_dir).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT event_type, user_id % 2, CAST(ROUND(value * 100) AS BIGINT)
        FROM events
    """).fetchall()
    con.close()
    coh: dict = defaultdict(lambda: ([], []))
    for et, par, v in rows:
        coh[et][int(par)].append(int(v))
    for et, (a, b) in coh.items():
        na, nb = len(a), len(b)
        ma, mb = sum(a) / na, sum(b) / nb
        va = sum((x - ma) ** 2 for x in a) / (na - 1) / na
        vb = sum((x - mb) ** 2 for x in b) / (nb - 1) / nb
        t = (ma - mb) / math.sqrt(va + vb)
        dof = (va + vb) ** 2 / (va * va / (na - 1) + vb * vb / (nb - 1))
        gn_a, gn_b, gt, gdof = got[et]
        assert (gn_a, gn_b) == (na, nb)
        assert abs(gt - t) <= max(1e-9, abs(t) * 1e-9)
        assert abs(gdof - dof) <= max(1e-6, abs(dof) * 1e-9)


def test_max_drawdown_matches_walk_reference(spark, sf_dir):
    """Per-user peak-to-trough walk in plain Python over the (ts,
    event_id)-ordered purchase series."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["user_id"]: (
            r["max_drawdown_cents"], r["peak_cents"], r["n_points"]
        )
        for r in all_queries()["events_max_drawdown"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT user_id, CAST(ROUND(value * 100) AS BIGINT)
        FROM events WHERE event_type = 'purchase'
        ORDER BY user_id, ts, event_id
    """).fetchall()
    con.close()
    want: dict = {}
    state: dict = {}
    for u, v in rows:
        u = int(u)
        cum, peak, dd, n = state.get(u, (0, None, 0, 0))
        cum += int(v)
        peak = cum if peak is None else max(peak, cum)
        dd = max(dd, peak - cum)
        state[u] = (cum, peak, dd, n + 1)
    for u, (cum, peak, dd, n) in state.items():
        want[u] = (dd, peak, n)
    assert got == want


# --------------------------------------------------------------------------
# batch 4: log10/sqrt/power-of-two folds, concentration curves, KM steps,
# CUSUM argmax, normal-equation solves
# --------------------------------------------------------------------------


def test_benford_matches_log10_reference(spark, sf_dir):
    """The folded _BENFORD_PPM table vs REAL math.log10(1 + 1/d), plus
    the observed digit histogram rebuilt from raw cents."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    rows = all_queries()["stats_benford_digits"](spark, sf_dir).collect()
    con = _con(sf_dir, "orders")
    cents = [
        int(c) for (c,) in con.execute(
            "SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) FROM orders"
        ).fetchall()
    ]
    con.close()
    digits = Counter(int(str(c)[0]) for c in cents if c > 0)
    n_total = sum(digits.values())
    assert len(rows) == 9
    for r in rows:
        d = r["digit"]
        expected = round(1e6 * math.log10(1 + 1 / d))
        assert abs(r["expected_ppm"] - expected) <= 1, d  # the folded table
        assert r["n"] == digits.get(d, 0)
        assert r["observed_ppm"] == 10**6 * digits.get(d, 0) // n_total
        assert r["abs_diff_ppm"] == abs(r["observed_ppm"] - r["expected_ppm"])


def test_temperature_mix_matches_sqrt_reference(spark, sf_dir):
    """The tau = 0.5 upsampling quotas rebuilt with real math.sqrt weights
    and a literal largest-remainder walk; Σ quota == budget pinned."""
    from tmdb_movie_data_pipeline_spark.operators.llm_prep import (
        _TMQ_BUDGET,
        _TMQ_WSCALE,
        _TOKENS_SQL,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["source"]: (r["avail_tokens"], r["w"], r["quota"])
        for r in all_queries()["llm_temperature_mix_quota"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    avail = dict(con.execute(
        f"SELECT source, SUM(len({_TOKENS_SQL})) FROM documents GROUP BY 1"
    ).fetchall())
    con.close()
    w = {s: int(_TMQ_WSCALE * math.sqrt(n)) for s, n in avail.items()}
    total_w = sum(w.values())
    floor_q = {s: _TMQ_BUDGET * x // total_w for s, x in w.items()}
    rem = {s: _TMQ_BUDGET * x % total_w for s, x in w.items()}
    leftover = _TMQ_BUDGET - sum(floor_q.values())
    order = sorted(rem, key=lambda s: (-rem[s], s))
    quota = {
        s: floor_q[s] + (1 if i < leftover else 0)
        for i, s in enumerate(order)
    }
    want = {s: (int(avail[s]), w[s], quota[s]) for s in avail}
    assert got == want
    assert sum(q for _, _, q in got.values()) == _TMQ_BUDGET
    # the tau = 0.5 flattening property: quota share ordering follows
    # sqrt(n) share, which upweights the tail vs raw n share
    tot_n = sum(avail.values())
    for s in avail:
        if avail[s] / tot_n < 1 / len(avail):  # a tail source
            assert quota[s] / _TMQ_BUDGET >= avail[s] / tot_n * 0.999


def test_decayed_engagement_matches_python_reference(spark, sf_dir):
    """Half-life decay rebuilt per event with exact Fractions: weight is
    EXACTLY 2^-halvings of SCALE (the power-of-two shift fold)."""
    from tmdb_movie_data_pipeline_spark.operators.events import (
        _DE_HALF_LIFE_DAYS,
        _DE_SCALE,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["user_id"]: (r["n_purchases"], r["raw_cents"], r["decayed_cents"])
        for r in all_queries()["events_decayed_engagement"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    as_of = con.execute(
        "SELECT MAX(CAST(ts AS DATE)) FROM events"
    ).fetchone()[0]
    rows = con.execute(f"""
        SELECT user_id, CAST(ROUND(value * 100) AS BIGINT),
               datediff('day', CAST(ts AS DATE), DATE '{as_of}')
        FROM events WHERE event_type = 'purchase'
    """).fetchall()
    con.close()
    acc: dict = defaultdict(lambda: [0, 0, 0])
    for u, cents, age in rows:
        halv = min(int(age) // _DE_HALF_LIFE_DAYS, 62)
        wt = _DE_SCALE >> halv
        assert wt == _DE_SCALE * Fraction(1, 2**halv)  # exact halving
        a = acc[int(u)]
        a[0] += 1
        a[1] += int(cents)
        a[2] += int(cents) * wt
    want = {
        u: (n, raw, wsum // _DE_SCALE) for u, (n, raw, wsum) in acc.items()
    }
    assert got == want


def test_zipf_profile_matches_counter_reference(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.operators.text import _TOKENS_SQL
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["rank"]: (r["term"], r["freq"], r["rank_freq_product"])
        for r in all_queries()["text_zipf_profile"](spark, sf_dir).collect()
    }
    con = _con(sf_dir, "documents")
    docs = con.execute(f"SELECT {_TOKENS_SQL} FROM documents").fetchall()
    con.close()
    tf: Counter = Counter()
    for (toks,) in docs:
        tf.update(t for t in toks if t != "")
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    want = {
        r: (t, f, r * f)
        for r, (t, f) in enumerate(ranked, 1)
        if r in {1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096}
    }
    assert got == want


def test_lorenz_curve_matches_python_reference(spark, sf_dir):
    """Cumulative user/event shares rebuilt by a literal sorted walk,
    with the float share cross-check and curve-convexity pin."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["events_per_user"]: (
            r["n_users"], r["cum_users"], r["cum_events"],
            r["cum_users_ppm"], r["cum_events_ppm"],
        )
        for r in all_queries()["events_lorenz_curve"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    per_user = [
        int(k) for (_, k) in con.execute(
            "SELECT user_id, COUNT(*) FROM events GROUP BY 1"
        ).fetchall()
    ]
    con.close()
    hist = Counter(per_user)
    tot_u, tot_e = len(per_user), sum(per_user)
    cu = ce = 0
    want = {}
    prev = 0.0
    for k in sorted(hist):
        cu += hist[k]
        ce += k * hist[k]
        want[k] = (
            hist[k], cu, ce,
            10**6 * cu // tot_u, 10**6 * ce // tot_e,
        )
        assert abs(want[k][3] - 1e6 * cu / tot_u) <= 1.0
        assert abs(want[k][4] - 1e6 * ce / tot_e) <= 1.0
        # Lorenz convexity: event share never exceeds user share when
        # walking from the least-active side
        assert ce / tot_e <= cu / tot_u + 1e-12
        assert ce / tot_e >= prev
        prev = ce / tot_e
    assert got == want


def test_cusum_matches_argmax_reference(spark, sf_dir):
    """argmax_i |Σ(v_j − mean)| per type rebuilt with REAL float means —
    the n-scaled integer trick must pick the same day."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["event_type"]: (r["change_epoch_day"], r["s_scaled"], r["n_days"])
        for r in all_queries()["events_cusum_change_point"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT),
               SUM(CAST(ROUND(value * 100) AS BIGINT))
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchall()
    con.close()
    series: dict = defaultdict(list)
    for et, d, v in rows:
        series[et].append((int(d), int(v)))
    for et, pts in series.items():
        n = len(pts)
        mean = sum(v for _, v in pts) / n
        tot = sum(v for _, v in pts)
        best = None
        cum = 0
        for i, (d, v) in enumerate(pts, 1):
            cum += v
            s_float = cum - i * mean
            s_scaled = n * cum - i * tot  # the engine's integer form
            assert abs(n * s_float - s_scaled) < 1e-4 * max(1, abs(s_scaled))
            key = (abs(s_scaled), -d)  # max |S|, earliest day tie-break
            if best is None or key > best[0]:
                best = (key, d, s_scaled)
        assert got[et] == (best[1], best[2], n), et


def test_survival_table_matches_km_reference(spark, sf_dir):
    """Kaplan–Meier step ingredients rebuilt from last-activity days,
    with the float step factor (n−d)/n cross-check."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["epoch_day"]: (r["n_at_risk"], r["d_events"], r["step_survival_ppm"])
        for r in all_queries()["events_survival_table"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    last = dict(con.execute("""
        SELECT user_id,
               MAX(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)))
        FROM events GROUP BY 1
    """).fetchall())
    con.close()
    deaths = Counter(int(d) for d in last.values())
    at_risk = len(last)
    want = {}
    for d in sorted(deaths):
        want[d] = (
            at_risk, deaths[d],
            10**6 * (at_risk - deaths[d]) // at_risk,
        )
        assert abs(
            want[d][2] - 1e6 * (at_risk - deaths[d]) / at_risk
        ) <= 1.0
        at_risk -= deaths[d]
    assert at_risk == 0  # every user dies exactly once
    assert got == want


def test_silhouette_matches_float_reference(spark, sf_dir):
    """Simplified silhouette rebuilt in Python from raw embeddings:
    shared integer quantization, per-label centroids, a/b distances,
    sign-split ppm — and the per-label mean checked against the REAL
    float silhouette of the same quantized points."""
    from tmdb_movie_data_pipeline_spark.operators.clustering import (
        _SIL_SCALE,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["label"]: (r["n_vecs"], r["sum_s_ppm"], r["mean_s_ppm"])
        for r in all_queries()["ml_silhouette_centroid"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "embeddings")
    rows = con.execute(
        "SELECT vec_id, label, embedding FROM embeddings"
    ).fetchall()
    con.close()
    pts = {
        int(v): (int(lab), [round((float(x) + 1.0) * _SIL_SCALE) for x in emb])
        for v, lab, emb in rows
    }
    by_label: dict = defaultdict(list)
    for lab, q in pts.values():
        by_label[lab].append(q)
    cent = {
        lab: [sum(col) // len(vs) for col in zip(*vs)]
        for lab, vs in by_label.items()
    }
    sums: Counter = Counter()
    counts: Counter = Counter()
    float_sums: Counter = Counter()
    for lab, q in pts.values():
        d2 = {
            cl: sum((a - b) ** 2 for a, b in zip(q, c))
            for cl, c in cent.items()
        }
        a = d2[lab]
        b = min(v for cl, v in d2.items() if cl != lab)
        if max(a, b) == 0:
            s = 0
        elif b >= a:
            s = 10**6 * (b - a) // max(a, b)
        else:
            s = -(10**6 * (a - b) // max(a, b))
        sums[lab] += s
        counts[lab] += 1
        float_sums[lab] += (b - a) / max(a, b) if max(a, b) else 0.0
    want = {}
    for lab in sums:
        ssum = sums[lab]
        mean = ssum // counts[lab] if ssum >= 0 else -((-ssum) // counts[lab])
        want[lab] = (counts[lab], ssum, mean)
        # float cross-check: per-point floor bias < 1 ppm, mean floor +1,
        # sign-split truncation +1
        assert abs(mean - 1e6 * float_sums[lab] / counts[lab]) <= 3.0
    assert got == want


def test_ols_normal_equations_matches_lstsq_reference(spark, sf_dir):
    """The Cramer's-rule integer solve vs numpy least squares on the same
    quantized design matrix."""
    import numpy as np

    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["ml_ols_normal_equations"](
        spark, sf_dir
    ).collect()[0]
    con = _con(sf_dir, "lineitem")
    rows = con.execute("""
        SELECT CAST(ROUND(l_quantity) AS BIGINT),
               CAST(ROUND(l_discount * 1000) AS BIGINT),
               CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        FROM lineitem
    """).fetchall()
    con.close()
    X = np.array([[1.0, float(q), float(d)] for q, d, _ in rows])
    y = np.array([float(p) for _, _, p in rows])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row["n_rows"] == len(rows)
    assert row["det_sign"] == 1  # non-collinear design
    for got_milli, b in zip(
        (row["beta0_milli"], row["beta1_milli"], row["beta2_milli"]), beta
    ):
        assert abs(got_milli - b * 1000) <= 1.0 + abs(b) * 1e-6


def test_ols_residual_diagnostics_matches_float_reference(spark, sf_dir):
    """R² and Durbin–Watson from REAL float residuals of the daily fit."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    row = all_queries()["ml_ols_residual_diagnostics"](
        spark, sf_dir
    ).collect()[0]
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT),
               SUM(CAST(ROUND(value * 100) AS BIGINT))
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY 1
    """).fetchall()
    con.close()
    xs = [float(x) for x, _ in rows]
    ys = [float(y) for _, y in rows]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    res = [y - (my + slope * (x - mx)) for x, y in zip(xs, ys)]
    sse = sum(e * e for e in res)
    sst = sum((y - my) ** 2 for y in ys)
    r2 = 1 - sse / sst
    dw = sum(
        (a - b) ** 2 for a, b in zip(res[1:], res)
    ) / sse
    assert row["n_days"] == n
    assert abs(row["r2_ppm"] - r2 * 1e6) <= 2.0
    assert abs(row["dw_ppm"] - dw * 1e6) <= 2.0


# --------------------------------------------------------------------------
# batch 5: graph kernels over the dup-pair relation, sigma/MAD anomaly
# gates, UniMax water-filling, tokenizer fertility
# --------------------------------------------------------------------------


def _dup_adj(spark, sf_dir):
    """Adjacency sets of the staged near-dup pair graph."""
    from tmdb_movie_data_pipeline_spark.operators.dedup import (
        lsh_pairs_staged,
    )

    adj: dict = defaultdict(set)
    for r in lsh_pairs_staged(spark, sf_dir).collect():
        adj[r["doc_a"]].add(r["doc_b"])
        adj[r["doc_b"]].add(r["doc_a"])
    return adj


def test_kcore_matches_peel_reference(spark, sf_dir):
    """Synchronous k-core peeling rebuilt with Python sets, plus the
    convergence fact that makes the fixed round count honest: on this
    fixture the peel reaches its fixpoint within the unrolled rounds."""
    from tmdb_movie_data_pipeline_spark.operators.graph import (
        _KCORE_K,
        _KCORE_ROUNDS,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["doc_id"]: r["core_degree"]
        for r in all_queries()["graph_kcore"](spark, sf_dir).collect()
    }
    adj = _dup_adj(spark, sf_dir)
    alive = set(adj)
    history = []
    for _ in range(_KCORE_ROUNDS):
        alive = {
            v for v in alive if len(adj[v] & alive) >= _KCORE_K
        }
        history.append(set(alive))
    want = {v: len(adj[v] & alive) for v in alive}
    assert got == want
    # fixpoint within the unrolled rounds: one more peel changes nothing
    assert {
        v for v in alive if len(adj[v] & alive) >= _KCORE_K
    } == alive
    # every survivor genuinely has core degree >= k
    assert all(d >= _KCORE_K for d in want.values())


def test_clustering_coefficient_matches_set_reference(spark, sf_dir):
    """Per-vertex triangles via set intersections and the REAL float
    cc = 2T/(d(d-1))."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["doc_id"]: (r["degree"], r["n_triangles"], r["cc_ppm"])
        for r in all_queries()["graph_clustering_coefficient"](
            spark, sf_dir
        ).collect()
    }
    adj = _dup_adj(spark, sf_dir)
    want = {}
    for v, nb in adj.items():
        t = sum(len(adj[u] & nb) for u in nb) // 2
        d = len(nb)
        cc = 2 * 10**6 * t // (d * (d - 1)) if d >= 2 else 0
        want[v] = (d, t, cc)
        if d >= 2:
            assert abs(cc - 1e6 * 2 * t / (d * (d - 1))) <= 1.0
            assert 0 <= cc <= 10**6
    assert got == want


def test_link_prediction_matches_set_reference(spark, sf_dir):
    """Common-neighbors scores of NON-adjacent pairs via set
    intersections, with the full (score desc, a, b) top-N tie-break."""
    from tmdb_movie_data_pipeline_spark.operators.graph import _LINK_TOPN
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = [
        (r["doc_a"], r["doc_b"], r["common"])
        for r in all_queries()["graph_link_prediction"](
            spark, sf_dir
        ).collect()
    ]
    adj = _dup_adj(spark, sf_dir)
    scores = {}
    verts = sorted(adj)
    for i, a in enumerate(verts):
        for b in verts[i + 1 :]:
            if b in adj[a]:
                continue
            c = len(adj[a] & adj[b])
            if c:
                scores[(a, b)] = c
    want = sorted(
        ((a, b, c) for (a, b), c in scores.items()),
        key=lambda x: (-x[2], x[0], x[1]),
    )[:_LINK_TOPN]
    assert sorted(got, key=lambda x: (-x[2], x[0], x[1])) == want


def test_two_hop_reach_matches_set_reference(spark, sf_dir):
    """Neighbors-of-neighbors blast radius via set unions, with the
    engine's full (reach desc, degree desc, id) top-N tie-break."""
    from tmdb_movie_data_pipeline_spark.operators.graph import _REACH_TOPN
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = [
        (r["doc_id"], r["degree"], r["hop2_reach"])
        for r in all_queries()["graph_two_hop_reach"](
            spark, sf_dir
        ).collect()
    ]
    adj = _dup_adj(spark, sf_dir)
    full = []
    for v, nb in adj.items():
        hop2 = set()
        for u in nb:
            hop2 |= adj[u]
        hop2 -= nb
        hop2.discard(v)
        full.append((v, len(nb), len(hop2)))
    want = sorted(full, key=lambda x: (-x[2], -x[1], x[0]))[:_REACH_TOPN]
    assert sorted(got, key=lambda x: (-x[2], -x[1], x[0])) == want


def test_anomaly_zscore_matches_float_reference(spark, sf_dir):
    """The squared integer 3-sigma inequality vs REAL float population
    z-scores, rebuilt per (type, day) group."""
    from tmdb_movie_data_pipeline_spark.operators.events import _Z_K
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["event_id"]: (r["event_type"], r["day"], r["value_cents"])
        for r in all_queries()["events_anomaly_zscore"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT event_id, event_type,
               strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d'),
               CAST(ROUND(value * 100) AS BIGINT)
        FROM events
    """).fetchall()
    con.close()
    groups: dict = defaultdict(list)
    for eid, et, day, qc in rows:
        groups[(et, day)].append((int(eid), int(qc)))
    want = {}
    for (et, day), mem in groups.items():
        n = len(mem)
        s = sum(q for _, q in mem)
        qq = sum(q * q for q, in [(q,) for _, q in mem])
        for eid, q in mem:
            if (n * q - s) ** 2 > _Z_K**2 * (n * qq - s * s):
                want[eid] = (et, day, q)
                # float cross-check (strictly flagged side only: the
                # boundary belongs to the integer form)
                mu = s / n
                var = qq / n - mu * mu
                assert (q - mu) ** 2 > _Z_K**2 * var * (1 - 1e-9)
    assert got == want


def test_anomaly_robust_matches_mad_reference(spark, sf_dir):
    """Median/MAD flags rebuilt with literal sorted lower medians."""
    from tmdb_movie_data_pipeline_spark.operators.events import _RA_K
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["event_type"], r["epoch_day"]): (
            r["v_cents"], r["med_cents"], r["mad_cents"], r["is_anomaly"]
        )
        for r in all_queries()["events_anomaly_robust"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT),
               SUM(CAST(ROUND(value * 100) AS BIGINT))
        FROM events GROUP BY 1, 2
    """).fetchall()
    con.close()
    series: dict = defaultdict(dict)
    for et, d, v in rows:
        series[et][int(d)] = int(v)
    want = {}
    for et, days in series.items():
        vs = sorted(days.values())
        med = vs[(len(vs) + 1) // 2 - 1]
        ads = sorted(abs(v - med) for v in days.values())
        mad = ads[(len(ads) + 1) // 2 - 1]
        for d, v in days.items():
            want[(et, d)] = (v, med, mad, abs(v - med) > _RA_K * mad)
    assert got == want


def test_unimax_matches_waterfill_reference(spark, sf_dir):
    """UniMax allocation rebuilt as the LITERAL water-filling loop (walk
    languages by ascending cap; grant the cap while it fits the equal
    share, then split the remainder) — independent of the engine's
    closed-form window derivation. Budget exhaustion pinned."""
    from tmdb_movie_data_pipeline_spark.operators.llm_prep import (
        _TOKENS_SQL,
        _UNIMAX_B_DEN,
        _UNIMAX_B_NUM,
        _UNIMAX_EPOCHS,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["lang"]: (r["n_tokens"], r["cap"], r["alloc_tokens"], r["epochs_ppm"])
        for r in all_queries()["llm_unimax_language_caps"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    avail = {
        s: int(n)
        for s, n in con.execute(
            f"SELECT lang, SUM(len({_TOKENS_SQL})) FROM documents GROUP BY 1"
        ).fetchall()
    }
    con.close()
    b = _UNIMAX_B_NUM * sum(avail.values()) // _UNIMAX_B_DEN
    caps = {s: _UNIMAX_EPOCHS * n for s, n in avail.items()}
    order = sorted(caps, key=lambda s: (caps[s], s))
    alloc = {}
    remaining, langs_left = b, len(order)
    i = 0
    while i < len(order):
        s = order[i]
        if caps[s] * langs_left <= remaining:
            alloc[s] = caps[s]
            remaining -= caps[s]
            langs_left -= 1
            i += 1
        else:
            # equal split of the remainder, +1 to the lowest-cap ranks
            share, extra = divmod(remaining, langs_left)
            for j, s2 in enumerate(order[i:]):
                alloc[s2] = share + (1 if j < extra else 0)
            remaining = 0
            break
    assert sum(alloc.values()) == b  # budget exhausted exactly
    want = {
        s: (avail[s], caps[s], alloc[s], 10**6 * alloc[s] // avail[s])
        for s in avail
    }
    assert got == want
    # no language exceeds its cap, and caps bind only from below
    assert all(alloc[s] <= caps[s] for s in avail)


def test_tokenizer_fertility_matches_regex_reference(spark, sf_dir):
    """Per-language fertility rebuilt with Python regex token counts and
    float ratio cross-checks."""
    import re

    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["lang"]: (
            r["n_docs"], r["n_words"], r["n_subwords"],
            r["fertility_ppm"], r["bpe_fertility_ppm"],
        )
        for r in all_queries()["llm_tokenizer_fertility"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute("SELECT lang, text FROM documents").fetchall()
    con.close()
    acc: dict = defaultdict(lambda: [0, 0, 0, 0])
    for lang, text in rows:
        norm = re.sub(r"\s+", " ", text).strip().lower()
        a = acc[lang]
        a[0] += 1
        a[1] += len(norm.split(" "))
        a[2] += len(re.findall(r"[a-z]+|[0-9]+", text.lower()))
        a[3] += -(-len(text) // 4)  # ceil(len/4)
    want = {}
    for lang, (nd, nw, ns, nb) in acc.items():
        want[lang] = (nd, nw, ns, 10**6 * ns // nw, 10**6 * nb // nw)
        assert abs(want[lang][3] - 1e6 * ns / nw) <= 1.0
        assert abs(want[lang][4] - 1e6 * nb / nw) <= 1.0
    assert got == want


# --------------------------------------------------------------------------
# batch 6: decomposition identities, sweep lines, tail/divergence profiles
# --------------------------------------------------------------------------


def test_seasonal_decompose_matches_python_reference(spark, sf_dir):
    """STL-lite rebuilt with a literal centered-window walk; the additive
    identity x = trend + seasonal + residual pinned row by row, and the
    seasonal means cross-checked in float."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["day"]: (
            r["rev_cents"], r["trend_cents"], r["seasonal_cents"],
            r["residual_cents"],
        )
        for r in all_queries()["events_seasonal_decompose"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT CAST(ts AS DATE), CAST(dayofweek(CAST(ts AS DATE)) + 1
               AS BIGINT),
               SUM(CAST(ROUND(value * 100) AS BIGINT))
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2 ORDER BY 1
    """).fetchall()
    con.close()
    days = [(d, int(dow), int(x)) for d, dow, x in rows]
    det = []
    for i in range(len(days)):
        if i < 3 or i >= len(days) - 3:
            continue  # only full 7-day windows qualify
        window = days[i - 3 : i + 4]
        trend = sum(x for _, _, x in window) // 7
        d, dow, x = days[i]
        det.append((str(d), dow, x, trend, x - trend))
    seas_acc: dict = defaultdict(list)
    for _, dow, _, _, dc in det:
        seas_acc[dow].append(dc)
    seas = {}
    for dow, dcs in seas_acc.items():
        s = sum(dcs)
        seas[dow] = s // len(dcs) if s >= 0 else -((-s) // len(dcs))
        # float cross-check of the sign-safe integer mean
        assert abs(seas[dow] - s / len(dcs)) <= 1.0
    want = {
        day: (x, trend, seas[dow], x - trend - seas[dow])
        for day, dow, x, trend, _ in det
    }
    assert got == want
    # the decomposition identity, row by row
    for x, trend, s, resid in got.values():
        assert x == trend + s + resid


def test_peak_concurrency_matches_sweep_reference(spark, sf_dir):
    """The interval sweep line rebuilt with a literal sorted event-walk
    using the engine's (t, delta, event_id) tie order."""
    from tmdb_movie_data_pipeline_spark.operators.events import (
        _IVL_DUR_CHOICES,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["event_type"]: (r["peak"], r["n_intervals"], r["first_peak_us"])
        for r in all_queries()["events_peak_concurrency"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT event_type, event_id, epoch_us(ts) FROM events
    """).fetchall()
    con.close()
    by_type: dict = defaultdict(list)
    for et, eid, s in rows:
        e = int(s) + (1 + int(eid) % _IVL_DUR_CHOICES) * 60 * 1_000_000
        by_type[et].append((int(s), 1, int(eid)))
        by_type[et].append((e, -1, int(eid)))
    want = {}
    for et, bounds in by_type.items():
        bounds.sort()  # (t, delta, event_id): -1 before +1 at equal t
        run = peak = 0
        first = None
        for t, delta, _ in bounds:
            run += delta
            if run > peak:
                peak = run
                first = t
            elif run == peak and first is None:
                first = t
        want[et] = (peak, len(bounds) // 2, first)
    assert got == want


def test_term_burstiness_matches_float_reference(spark, sf_dir):
    """Church–Gale VMR rebuilt per term in floats with zero-docs
    included, vs the N-scaled integer milli form."""
    from tmdb_movie_data_pipeline_spark.operators.text import (
        _BURST_TOPN,
        _TOKENS_SQL,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["term"]: (r["df"], r["tf"], r["vmr_milli"])
        for r in all_queries()["text_term_burstiness"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    docs = con.execute(f"SELECT {_TOKENS_SQL} FROM documents").fetchall()
    con.close()
    n_docs = len(docs)
    per_term: dict = defaultdict(Counter)
    for i, (toks,) in enumerate(docs):
        for t in toks:
            if t != "":
                per_term[t][i] += 1
    top = sorted(
        per_term, key=lambda t: (-sum(per_term[t].values()), t)
    )[:_BURST_TOPN]
    want = {}
    for t in top:
        counts = per_term[t]
        tf = sum(counts.values())
        vmr_int = 1000 * (n_docs * sum(c * c for c in counts.values())
                          - tf * tf) // (n_docs * tf)
        want[t] = (len(counts), tf, vmr_int)
        # float VMR with zero docs included: var/mean over ALL docs
        mean = tf / n_docs
        var = (
            sum((c - mean) ** 2 for c in counts.values())
            + (n_docs - len(counts)) * mean**2
        ) / n_docs
        assert abs(vmr_int - 1000 * var / mean) <= 1.0, t
    assert got == want


def test_source_tvd_matches_python_reference(spark, sf_dir):
    """Total variation distance between per-source term distributions
    rebuilt with Counters and exact cross-multiplication, plus the float
    ½Σ|p−q| identity."""
    from tmdb_movie_data_pipeline_spark.operators.text import _TOKENS_SQL
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["source_a"], r["source_b"]): (r["shared_terms"], r["tvd_ppm"])
        for r in all_queries()["text_source_tvd"](spark, sf_dir).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute(
        f"SELECT source, UNNEST({_TOKENS_SQL}) FROM documents"
    ).fetchall()
    con.close()
    tf: dict = defaultdict(Counter)
    for src, t in rows:
        if t != "":
            tf[src][t] += 1
    srcs = sorted(tf)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            na, nb = sum(tf[a].values()), sum(tf[b].values())
            shared = set(tf[a]) & set(tf[b])
            num = sum(
                abs(tf[a].get(t, 0) * nb - tf[b].get(t, 0) * na)
                for t in set(tf[a]) | set(tf[b])
            )
            tvd = 10**6 * num // (2 * na * nb)
            want[(a, b)] = (len(shared), tvd)
            # float ½ Σ |p - q| over the union support
            f = 0.5 * sum(
                abs(tf[a].get(t, 0) / na - tf[b].get(t, 0) / nb)
                for t in set(tf[a]) | set(tf[b])
            )
            assert abs(tvd - f * 1e6) <= 1.0
            assert 0 <= tvd <= 10**6
    assert got == want


def test_tail_ratio_matches_float_reference(spark, sf_dir):
    """P(X>2x)/P(X>x) profile from literal float comparisons over raw
    values (the engine compares the UNQUANTIZED double column)."""
    from tmdb_movie_data_pipeline_spark.operators.aggregates import (
        _TAIL_THRESHOLDS,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["x"]: (r["n_gt_x"], r["n_gt_2x"], r["tail_ratio_ppm"])
        for r in all_queries()["stats_tail_ratio_profile"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    vals = [float(v) for (v,) in con.execute(
        "SELECT value FROM events"
    ).fetchall()]
    con.close()
    want = {}
    for x in _TAIL_THRESHOLDS:
        n1 = sum(1 for v in vals if v > x)
        n2 = sum(1 for v in vals if v > 2 * x)
        want[x] = (n1, n2, 10**6 * n2 // n1)
        assert abs(want[x][2] - 1e6 * n2 / n1) <= 1.0
    assert got == want


def test_lift_gains_curve_matches_python_reference(spark, sf_dir):
    """The marker-count classifier's gains/lift at every score cutoff,
    rebuilt from Python token counts with float recall/lift checks."""
    from tmdb_movie_data_pipeline_spark.operators.clustering import (
        _LIFT_MARKERS,
    )
    from tmdb_movie_data_pipeline_spark.operators.text import _TOKENS_SQL
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["score"]: (
            r["n_docs"], r["n_pos"], r["cum_docs"], r["cum_pos"],
            r["recall_ppm"], r["lift_ppm"],
        )
        for r in all_queries()["ml_lift_gains_curve"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute(
        f"SELECT lang, {_TOKENS_SQL} FROM documents"
    ).fetchall()
    con.close()
    markers = set(_LIFT_MARKERS)
    hist: dict = defaultdict(lambda: [0, 0])
    for lang, toks in rows:
        score = sum(1 for t in toks if t in markers)
        hist[score][0] += 1
        hist[score][1] += 1 if lang == "en" else 0
    tot_docs = sum(n for n, _ in hist.values())
    tot_pos = sum(p for _, p in hist.values())
    want = {}
    cd = cp = 0
    for s in sorted(hist, reverse=True):
        n, p = hist[s]
        cd, cp = cd + n, cp + p
        want[s] = (
            n, p, cd, cp,
            10**6 * cp // tot_pos,
            10**6 * cp * tot_docs // (cd * tot_pos),
        )
        assert abs(want[s][4] - 1e6 * cp / tot_pos) <= 1.0
        assert abs(
            want[s][5] - 1e6 * (cp / cd) / (tot_pos / tot_docs)
        ) <= 1.0
    assert got == want


def test_backtest_seasonal_naive_matches_python_reference(spark, sf_dir):
    """The temporal-split seasonal-naive backtest rebuilt literally:
    per-(type, weekday) TRAIN-only integer-mean model scored on the
    held-out days; the leak-free property pinned (no test day enters
    its own forecast)."""
    from tmdb_movie_data_pipeline_spark.operators.events import (
        _BT_TRAIN_DAYS,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["event_type"], r["epoch_day"]): (
            r["actual_cents"], r["forecast_cents"], r["abs_err_cents"]
        )
        for r in all_queries()["events_backtest_seasonal_naive"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT),
               CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT),
               SUM(CAST(ROUND(value * 100) AS BIGINT))
        FROM events GROUP BY 1, 2, 3
    """).fetchall()
    con.close()
    daily = [(et, int(d), int(dow), int(v)) for et, d, dow, v in rows]
    split = min(d for _, d, _, _ in daily) + _BT_TRAIN_DAYS
    model: dict = defaultdict(list)
    for et, d, dow, v in daily:
        if d < split:
            model[(et, dow)].append(v)
    fc = {k: sum(vs) // len(vs) for k, vs in model.items()}
    want = {}
    for et, d, dow, v in daily:
        if d >= split and (et, dow) in fc:
            want[(et, d)] = (v, fc[(et, dow)], abs(v - fc[(et, dow)]))
    assert got == want
    # leak-free: every forecast derives only from strictly earlier days
    assert all(d >= split for _, d in got)


# --------------------------------------------------------------------------
# batch 7: stratified uplift, SQ8 audit, Gopher gates, quota allocation,
# lexical-richness ratios, Pearson matrix
# --------------------------------------------------------------------------


def test_uplift_stratified_matches_python_reference(spark, sf_dir):
    """Per-weekday conversion uplift rebuilt from user-day sets, with the
    float rate-difference cross-check."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["dow"]: (r["n_t"], r["n_c"], r["conv_t"], r["conv_c"], r["uplift_ppm"])
        for r in all_queries()["stats_uplift_stratified"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    ud = con.execute("""
        SELECT DISTINCT user_id,
               CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT),
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT)
        FROM events
    """).fetchall()
    conv = set(
        (int(u), int(d))
        for u, d in con.execute("""
            SELECT DISTINCT user_id,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
            FROM events WHERE event_type = 'purchase'
        """).fetchall()
    )
    con.close()
    acc: dict = defaultdict(lambda: [0, 0, 0, 0])
    for u, dow, d in ud:
        u, dow, d = int(u), int(dow), int(d)
        t = u % 2 == 0
        c = (u, d) in conv
        a = acc[dow]
        a[0] += t
        a[1] += not t
        a[2] += t and c
        a[3] += (not t) and c
    want = {}
    for dow, (nt, nc, ct, cc) in acc.items():
        up = 10**6 * ct // nt - 10**6 * cc // nc
        want[dow] = (nt, nc, ct, cc, up)
        assert abs(up - 1e6 * (ct / nt - cc / nc)) <= 2.0
    assert got == want


def test_scalar_quantization_matches_float_reference(spark, sf_dir):
    """SQ8 codes and reconstruction errors rebuilt in Python doubles
    (same IEEE ops); aggregates compared with half-ulp rounding slack."""
    from tmdb_movie_data_pipeline_spark.operators.pq import _SQ_LEVELS
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["pos"]: (
            r["n_vecs"], r["total_err_pico"], r["mean_err_pico"],
            r["max_err_pico"], r["codes_used"],
        )
        for r in all_queries()["ml_scalar_quantization_error"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "embeddings")
    rows = con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    con.close()
    dims = len(rows[0][1])
    for pos in range(dims):
        xs = [float(emb[pos]) for _, emb in rows]
        mn, mx = min(xs), max(xs)
        codes = set()
        errs = []
        for x in xs:
            if mx == mn:
                codes.add(0)
                errs.append(0)
                continue
            code = min(math.floor((x - mn) * float(_SQ_LEVELS) / (mx - mn)),
                       _SQ_LEVELS)
            codes.add(code)
            rec = mn + code * (mx - mn) / float(_SQ_LEVELS)
            errs.append((x - rec) * (x - rec) * 1e12)
        n_vecs, total, mean, mx_err, codes_used = got[pos]
        assert n_vecs == len(xs)
        assert codes_used == len(codes)
        # per-row ROUND to pico: half-unit slack per element
        assert abs(total - sum(errs)) <= len(xs) * 0.51
        assert abs(mx_err - max(errs)) <= 0.51
        assert abs(mean - total // n_vecs) <= 1


def test_gopher_rules_match_python_reference(spark, sf_dir):
    """The Gopher-style quality gate battery rebuilt rule by rule in
    Python (word count, mean word length bounds, top-token share,
    distinct stopwords) — all four flags and the conjunction."""
    from tmdb_movie_data_pipeline_spark.operators.llm_prep import (
        _GR_MAX_WORDS,
        _GR_MIN_STOP,
        _GR_MIN_WORDS,
        _GR_MWL_HI,
        _GR_MWL_LO,
        _GR_STOPWORDS,
        _GR_TOP_SHARE_DEN,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries
    import re

    got = {
        r["doc_id"]: (
            r["n_words"], r["ok_word_count"], r["ok_mean_word_len"],
            r["ok_top_token"], r["ok_stopwords"], r["passes"],
        )
        for r in all_queries()["llm_gopher_rules"](spark, sf_dir).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    stop = set(_GR_STOPWORDS)
    want = {}
    for doc_id, text in rows:
        toks = re.sub(r"\s+", " ", text).strip().lower().split(" ")
        n = len(toks)
        sum_len = sum(len(t) for t in toks)
        n_stop = len(stop & set(toks))
        top_c = max(Counter(toks).values())
        ok_wc = _GR_MIN_WORDS <= n <= _GR_MAX_WORDS
        ok_mwl = _GR_MWL_LO * n <= sum_len <= _GR_MWL_HI * n
        ok_top = _GR_TOP_SHARE_DEN * top_c <= n
        ok_stop = n_stop >= _GR_MIN_STOP
        want[int(doc_id)] = (
            n, ok_wc, ok_mwl, ok_top, ok_stop,
            ok_wc and ok_mwl and ok_top and ok_stop,
        )
    assert got == want
    # the gate discriminates on this fixture: both outcomes live
    assert {p for *_, p in got.values()} == {True, False}


def test_token_budget_quota_matches_remainder_reference(spark, sf_dir):
    """tau = 1 largest-remainder allocation rebuilt literally; exact
    budget exhaustion and the proportionality bound |quota − ideal| ≤ 1."""
    from tmdb_movie_data_pipeline_spark.operators.llm_prep import (
        _TB_BUDGET,
        _TOKENS_SQL,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["lang"]: (r["avail_tokens"], r["floor_quota"], r["quota"])
        for r in all_queries()["llm_token_budget_quota"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    avail = {
        s: int(n)
        for s, n in con.execute(
            f"SELECT lang, SUM(len({_TOKENS_SQL})) FROM documents GROUP BY 1"
        ).fetchall()
    }
    con.close()
    total = sum(avail.values())
    floor_q = {s: _TB_BUDGET * n // total for s, n in avail.items()}
    rem = {s: _TB_BUDGET * n % total for s, n in avail.items()}
    leftover = _TB_BUDGET - sum(floor_q.values())
    order = sorted(rem, key=lambda s: (-rem[s], s))
    quota = {
        s: floor_q[s] + (1 if i < leftover else 0)
        for i, s in enumerate(order)
    }
    want = {s: (avail[s], floor_q[s], quota[s]) for s in avail}
    assert got == want
    assert sum(quota.values()) == _TB_BUDGET
    for s in avail:  # Hare-quota property: within 1 of the real share
        assert abs(quota[s] - _TB_BUDGET * avail[s] / total) < 1.0


def test_hapax_ratio_matches_counter_reference(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.operators.text import _TOKENS_SQL
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["lang"]: (
            r["vocab"], r["n_tokens"], r["hapax"],
            r["hapax_vocab_ppm"], r["hapax_token_ppm"],
        )
        for r in all_queries()["text_hapax_ratio"](spark, sf_dir).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute(
        f"SELECT lang, UNNEST({_TOKENS_SQL}) FROM documents"
    ).fetchall()
    con.close()
    tf: dict = defaultdict(Counter)
    for lang, t in rows:
        if t != "":
            tf[lang][t] += 1
    want = {}
    for lang, c in tf.items():
        vocab = len(c)
        toks = sum(c.values())
        hap = sum(1 for v in c.values() if v == 1)
        want[lang] = (
            vocab, toks, hap,
            10**6 * hap // vocab, 10**6 * hap // toks,
        )
    assert got == want


def test_oov_bigram_rate_matches_python_reference(spark, sf_dir):
    """The top-N-per-context bigram LM and per-doc OOV share rebuilt
    with dicts (LM admission: rank ≤ N by (count desc, w2), context
    support ≥ MIN_CTX)."""
    from tmdb_movie_data_pipeline_spark.operators.text import (
        _LM_MIN_CTX,
        _LM_TOPN,
        _TOKENS_SQL,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_in_lm"], r["oov_ppm"])
        for r in all_queries()["text_oov_bigram_rate"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    docs = con.execute(
        f"SELECT doc_id, {_TOKENS_SQL} FROM documents"
    ).fetchall()
    con.close()
    cnt: Counter = Counter()
    per_doc: dict = {}
    for doc_id, toks in docs:
        bis = list(zip(toks, toks[1:]))
        per_doc[int(doc_id)] = bis
        cnt.update(bis)
    by_ctx: dict = defaultdict(list)
    for (w1, w2), n in cnt.items():
        by_ctx[w1].append((n, w2))
    lm = set()
    for w1, lst in by_ctx.items():
        if sum(n for n, _ in lst) < _LM_MIN_CTX:
            continue
        lst.sort(key=lambda x: (-x[0], x[1]))
        for n, w2 in lst[:_LM_TOPN]:
            lm.add((w1, w2))
    want = {}
    for doc_id, bis in per_doc.items():
        if not bis:
            continue
        hits = sum(1 for b in bis if b in lm)
        want[doc_id] = (
            len(bis), hits, 10**6 * (len(bis) - hits) // len(bis)
        )
    assert got == want


def test_char_diversity_matches_counter_reference(spark, sf_dir):
    """Simpson collision index over the normalized 256-char prefix,
    with the float Σp² cross-check."""
    import re

    from tmdb_movie_data_pipeline_spark.operators.text import (
        _DIVERSITY_PREFIX,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["doc_id"]: (r["n_chars_pfx"], r["distinct_chars"], r["simpson_ppm"])
        for r in all_queries()["text_char_diversity"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    want = {}
    for doc_id, text in rows:
        norm = re.sub(r"\s+", " ", text).strip().lower()[:_DIVERSITY_PREFIX]
        c = Counter(ch for ch in norm if ch != "")
        n = sum(c.values())
        if n < 2:
            continue
        coll = sum(v * (v - 1) for v in c.values())
        simpson = 10**6 * coll // (n * (n - 1))
        want[int(doc_id)] = (n, len(c), simpson)
        # float unbiased Simpson index
        assert abs(simpson - 1e6 * coll / (n * (n - 1))) <= 1.0
    assert got == want


def test_corr_matrix_matches_float_reference(spark, sf_dir):
    """The three Pearson correlations from raw quantized lineitem columns
    in plain Python floats (centered formula, real sqrt)."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["pair"]: r["corr"]
        for r in all_queries()["stats_corr_matrix"](spark, sf_dir).collect()
    }
    con = _con(sf_dir, "lineitem")
    rows = con.execute("""
        SELECT CAST(l_quantity AS BIGINT),
               CAST(ROUND(l_extendedprice) AS BIGINT),
               CAST(ROUND(l_discount * 10000) AS BIGINT)
        FROM lineitem
    """).fetchall()
    con.close()

    def corr(xs, ys):
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        vx = sum((x - mx) ** 2 for x in xs)
        vy = sum((y - my) ** 2 for y in ys)
        return cov / math.sqrt(vx * vy)

    q = [float(a) for a, _, _ in rows]
    p = [float(b) for _, b, _ in rows]
    d = [float(c) for _, _, c in rows]
    for pair, (xs, ys) in {
        "qty_price": (q, p),
        "qty_discount": (q, d),
        "price_discount": (p, d),
    }.items():
        r = corr(xs, ys)
        assert abs(got[pair] - r) <= 1e-9 + abs(r) * 1e-9, pair
        assert -1.0 <= got[pair] <= 1.0
    assert set(got) == {"qty_price", "qty_discount", "price_discount"}


# --------------------------------------------------------------------------
# batch 8: growth accounting, rolling windows, interpolation, burst gates,
# percentile selection
# --------------------------------------------------------------------------


def test_burst_detection_matches_python_reference(spark, sf_dir):
    """The integer cross-multiplied burst gate vs the REAL float trailing
    mean n > 1.25 * mean(prior) per (type, day)."""
    from tmdb_movie_data_pipeline_spark.operators.events import (
        _BURST_DEN,
        _BURST_NUM,
        _BURST_W,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["event_type"], r["epoch_day"]): (
            r["n"], r["trailing_sum"], r["prior_days"], r["is_burst"]
        )
        for r in all_queries()["events_burst_detection"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT),
               COUNT(*)
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchall()
    con.close()
    series: dict = defaultdict(list)
    for et, d, n in rows:
        series[et].append((int(d), int(n)))
    want = {}
    for et, pts in series.items():
        for i, (d, n) in enumerate(pts):
            window = pts[max(0, i - _BURST_W) : i]
            ts = sum(x for _, x in window)
            pd_ = len(window)
            burst = pd_ > 0 and n * pd_ * _BURST_DEN > _BURST_NUM * ts
            want[(et, d)] = (n, ts, pd_, burst)
            if pd_ > 0:  # float cross-check on the strict side
                if burst:
                    assert n > _BURST_NUM / _BURST_DEN * (ts / pd_) * (
                        1 - 1e-12
                    )
    assert got == want
    assert any(b for *_, b in want.values())  # the gate fires somewhere


def test_gap_fill_interpolate_matches_python_reference(spark, sf_dir):
    """Linear interpolation over calendar gaps rebuilt with a literal
    per-user spine walk; filled values cross-checked against the float
    two-point line."""
    import datetime

    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["user_id"], r["day"]): (r["filled"], r["value_interp"])
        for r in all_queries()["events_gap_fill_interpolate"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE),
               SUM(CAST(ROUND(value * 100) AS BIGINT))
        FROM events WHERE user_id % 50 = 0 GROUP BY 1, 2
    """).fetchall()
    con.close()
    per_user: dict = defaultdict(dict)
    for u, d, q in rows:
        per_user[int(u)][d] = int(q)
    want = {}
    for u, days in per_user.items():
        lo, hi = min(days), max(days)
        d = lo
        while d <= hi:
            if d in days:
                want[(u, str(d))] = (0, days[d] / 100.0)
            else:
                prev_d = max(x for x in days if x < d)
                next_d = min(x for x in days if x > d)
                pq, nq = days[prev_d], days[next_d]
                span = (next_d - prev_d).days
                val = (
                    pq * (next_d - d).days + nq * (d - prev_d).days
                ) // span
                want[(u, str(d))] = (1, val / 100.0)
                # float two-point line within the floor quantum
                t = (d - prev_d).days / span
                assert abs(val - (pq * (1 - t) + nq * t)) <= 1.0
            d += datetime.timedelta(days=1)
    assert got == want
    assert any(f for f, _ in got.values())  # gaps exist and get filled


def test_growth_accounting_matches_python_reference(spark, sf_dir):
    """Weekly new/retained/resurrected/churned classification rebuilt
    from per-user week sets, plus the accounting identity
    active(w) = new + retained + resurrected."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["week"]: (
            r["n_new"], r["n_retained"], r["n_resurrected"], r["n_churned"]
        )
        for r in all_queries()["events_growth_accounting"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT DISTINCT user_id,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
        FROM events
    """).fetchall()
    con.close()
    weeks: dict = defaultdict(set)
    for u, w in rows:
        weeks[int(u)].add(int(w))
    new_c: Counter = Counter()
    ret: Counter = Counter()
    res: Counter = Counter()
    churn: Counter = Counter()
    active: Counter = Counter()
    for u, ws in weeks.items():
        first = min(ws)
        for w in ws:
            active[w] += 1
            if w == first:
                new_c[w] += 1
            elif w - 1 in ws:
                ret[w] += 1
            else:
                res[w] += 1
            if w + 1 not in ws:
                churn[w + 1] += 1
    want = {
        w: (new_c[w], ret[w], res[w], churn[w])
        for w in set(new_c) | set(ret) | set(res) | set(churn)
    }
    assert got == want
    for w, (n, r_, rs, _) in want.items():
        assert active[w] == n + r_ + rs  # the accounting identity


def test_rolling_mau_matches_set_reference(spark, sf_dir):
    """Trailing 28-day distinct actives + same-day DAU per day, rebuilt
    from per-day user sets."""
    import datetime

    from tmdb_movie_data_pipeline_spark.operators.events import _MAU_WINDOW
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["day"]: (r["mau28"], r["dau"])
        for r in all_queries()["events_rolling_mau"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute(
        "SELECT DISTINCT user_id, CAST(ts AS DATE) FROM events"
    ).fetchall()
    con.close()
    per_day: dict = defaultdict(set)
    for u, d in rows:
        per_day[d].add(int(u))
    max_d = max(per_day)
    want = {}
    # every day any window-day could claim, clipped at the data's end
    all_days = set()
    for d in per_day:
        for off in range(_MAU_WINDOW):
            wd = d + datetime.timedelta(days=off)
            if wd <= max_d:
                all_days.add(wd)
    for wd in all_days:
        mau: set = set()
        for off in range(_MAU_WINDOW):
            mau |= per_day.get(wd - datetime.timedelta(days=off), set())
        want[str(wd)] = (len(mau), len(per_day.get(wd, set())))
    assert got == want
    # DAU <= MAU always; they agree on the first observed day
    assert all(dau <= mau for mau, dau in got.values())


def test_quality_percentile_gate_matches_sorted_reference(spark, sf_dir):
    """The top-20% stopword-ratio gate rebuilt by literally sorting the
    float scores with the doc_id tie-break."""
    from tmdb_movie_data_pipeline_spark.operators.llm_prep import (
        GATE_KEEP_PCT,
    )
    from tmdb_movie_data_pipeline_spark.operators.text import _TOKENS_SQL
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["doc_id"]: (r["n_tokens"], r["stopword_ratio"])
        for r in all_queries()["llm_quality_percentile_gate"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute(
        f"SELECT doc_id, {_TOKENS_SQL} FROM documents"
    ).fetchall()
    con.close()
    stop = {"the", "a", "and", "of", "is", "to", "in"}
    scored = []
    for doc_id, toks in rows:
        if not toks:
            continue
        ratio = sum(1 for t in toks if t in stop) / len(toks)
        scored.append((int(doc_id), len(toks), ratio))
    k = len(scored) * GATE_KEEP_PCT // 100
    keep = sorted(scored, key=lambda x: (-x[2], x[0]))[:k]
    want = {d: (n, r) for d, n, r in keep}
    assert set(got) == set(want)
    for d, (n, r) in want.items():
        assert got[d][0] == n
        assert abs(got[d][1] - r) <= 1e-12
    assert len(got) == k  # exactly the top slice, no boundary spill


# --------------------------------------------------------------------------
# batch 9: quantile clips, RAKE, stickiness
# --------------------------------------------------------------------------


def test_embedding_outlier_clip_matches_python_reference(spark, sf_dir):
    """Ordinal p1/p99 bounds, clipped counts and clip energy rebuilt per
    dimension with sorted lists and unbounded ints; the ordinal bound
    checked against the ceil-rank definition."""
    from tmdb_movie_data_pipeline_spark.operators.pq import (
        _CLIP_HI_PCT,
        _CLIP_LO_PCT,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["pos"]: (
            r["n"], r["p_lo_micro"], r["p_hi_micro"], r["n_clipped"],
            r["clip_energy_micro2"],
        )
        for r in all_queries()["ml_embedding_outlier_clip"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "embeddings")
    rows = con.execute("SELECT embedding FROM embeddings").fetchall()
    con.close()
    dims = len(rows[0][0])
    for pos in range(dims):
        xs = sorted(round(float(e[pos]) * 10**6) for (e,) in rows)
        n = len(xs)
        lo = xs[-(-_CLIP_LO_PCT * n // 100) - 1]  # ceil rank, 1-based
        hi = xs[-(-_CLIP_HI_PCT * n // 100) - 1]
        clipped = sum(1 for x in xs if x < lo or x > hi)
        energy = sum(
            (x - hi) ** 2 if x > hi else (lo - x) ** 2
            for x in xs
            if x < lo or x > hi
        )
        assert got[pos] == (n, lo, hi, clipped, energy), pos
        # the clip touches at most (lo_pct + (100 - hi_pct))% + rounding
        assert clipped <= n * (_CLIP_LO_PCT + 100 - _CLIP_HI_PCT) / 100 + 2


def test_rake_word_scores_match_python_reference(spark, sf_dir):
    """RAKE degree/frequency rebuilt by literally segmenting each doc at
    stopwords and summing phrase lengths, with the float degree/freq
    ratio check."""
    from tmdb_movie_data_pipeline_spark.operators.text import (
        _RAKE_STOPS,
        _RAKE_TOPN,
        _TOKENS_SQL,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["word"]: (r["freq"], r["degree"], r["rake_milli"])
        for r in all_queries()["text_rake_word_scores"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    docs = con.execute(f"SELECT {_TOKENS_SQL} FROM documents").fetchall()
    con.close()
    stops = set(_RAKE_STOPS)
    freq: Counter = Counter()
    degree: Counter = Counter()
    for (toks,) in docs:
        phrase = []
        for t in list(toks) + [next(iter(stops))]:  # sentinel flush
            if t in stops or t == "":
                for w in phrase:
                    freq[w] += 1
                    degree[w] += len(phrase)
                phrase = []
            else:
                phrase.append(t)
    top = sorted(freq, key=lambda w: (-freq[w], w))[:_RAKE_TOPN]
    want = {
        w: (freq[w], degree[w], 1000 * degree[w] // freq[w]) for w in top
    }
    assert got == want
    for w in top:
        assert abs(want[w][2] - 1000 * degree[w] / freq[w]) <= 1.0
        assert degree[w] >= freq[w]  # each occurrence contributes >= 1


def test_dau_wau_stickiness_matches_set_reference(spark, sf_dir):
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["epoch_day"]: (r["dau"], r["wau"], r["stickiness_ppm"])
        for r in all_queries()["events_dau_wau_stickiness"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT DISTINCT user_id,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        FROM events
    """).fetchall()
    con.close()
    per_day: dict = defaultdict(set)
    for u, d in rows:
        per_day[int(d)].add(int(u))
    want = {}
    for d, users in per_day.items():
        wau: set = set()
        for off in range(7):
            wau |= per_day.get(d - off, set())
        want[d] = (
            len(users), len(wau), 10**6 * len(users) // len(wau)
        )
        assert abs(want[d][2] - 1e6 * len(users) / len(wau)) <= 1.0
        assert len(users) <= len(wau)
    assert got == want


# --------------------------------------------------------------------------
# batch 10: packing/batching assignment, class centroids, repetition gates,
# Markov transitions
# --------------------------------------------------------------------------


def test_sequence_packing_matches_walk_reference(spark, sf_dir):
    """Concat-and-chunk pack assignment rebuilt with a literal per-source
    running walk in doc_id order; the pack-budget invariants pinned."""
    from tmdb_movie_data_pipeline_spark.operators.llm_prep import (
        PACK_BUDGET,
        _TOKENS_SQL,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["doc_id"]: (
            r["source"], r["n_tokens"], r["cum_tokens"], r["pack_id"],
            r["offset_in_pack"],
        )
        for r in all_queries()["llm_sequence_packing"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute(
        f"SELECT doc_id, source, len({_TOKENS_SQL}) FROM documents"
        " ORDER BY source, doc_id"
    ).fetchall()
    con.close()
    want = {}
    cum: Counter = Counter()
    for doc_id, src, n in rows:
        n = int(n)
        start = cum[src]
        cum[src] += n
        want[int(doc_id)] = (
            src, n, cum[src], start // PACK_BUDGET, start % PACK_BUDGET,
        )
    assert got == want
    for _, n, cum_t, pack, off in got.values():
        assert 0 <= off < PACK_BUDGET
        assert pack == (cum_t - n) // PACK_BUDGET


def test_padding_waste_matches_python_reference(spark, sf_dir):
    """Length-bucketed batch assembly and exact padding accounting
    rebuilt with a literal (length, id)-ordered walk per bucket."""
    from tmdb_movie_data_pipeline_spark.operators.llm_prep import (
        _PAD_BATCH_SIZE,
        _PAD_BUCKET_TOKENS,
        _TOKENS_SQL,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["bucket"], r["batch_idx"]): (
            r["n_seqs"], r["max_tokens"], r["sum_tokens"],
            r["padding_waste"], r["waste_ppm"],
        )
        for r in all_queries()["llm_padding_waste_batching"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute(
        f"SELECT doc_id, len({_TOKENS_SQL}) FROM documents"
    ).fetchall()
    con.close()
    buckets: dict = defaultdict(list)
    for doc_id, n in rows:
        n = int(n)
        buckets[n // _PAD_BUCKET_TOKENS].append((n, int(doc_id)))
    want = {}
    for b, seqs in buckets.items():
        seqs.sort()
        for i in range(0, len(seqs), _PAD_BATCH_SIZE):
            batch = seqs[i : i + _PAD_BATCH_SIZE]
            idx = i // _PAD_BATCH_SIZE
            mx = max(n for n, _ in batch)
            sm = sum(n for n, _ in batch)
            waste = len(batch) * mx - sm
            want[(b, idx)] = (
                len(batch), mx, sm, waste,
                10**6 * waste // (len(batch) * mx),
            )
            # waste within a 16-token bucket of batch-8 is bounded by
            # (batch-1) * (bucket-1) tokens
            assert waste <= (len(batch) - 1) * (_PAD_BUCKET_TOKENS - 1)
    assert got == want


def test_label_centroids_match_python_reference(spark, sf_dir):
    """Per-class centroid sums in unbounded ints and the IEEE mean."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["label"], r["dim"]): (r["n"], r["sum_micro"], r["centroid_micro"])
        for r in all_queries()["ml_label_centroids"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "embeddings")
    rows = con.execute("SELECT label, embedding FROM embeddings").fetchall()
    con.close()
    acc: dict = defaultdict(lambda: [0, 0])
    for lab, emb in rows:
        for dim, x in enumerate(emb):
            a = acc[(int(lab), dim)]
            a[0] += 1
            a[1] += round(float(x) * 10**6)
    want = {
        k: (n, s, s / n) for k, (n, s) in acc.items()
    }
    assert set(got) == set(want)
    for k, (n, s, c) in want.items():
        gn, gs, gc = got[k]
        assert (gn, gs) == (n, s), k
        assert abs(gc - c) <= abs(c) * 1e-12 + 1e-9, k


def test_repetition_filter_matches_counter_reference(spark, sf_dir):
    """All three repetition ratios and the conjunction gate rebuilt from
    dict unigram/trigram counts (floats via the same int/int divisions)."""
    from tmdb_movie_data_pipeline_spark.operators.text import (
        REP_MAX_DUP_TRIGRAM,
        REP_MAX_DUP_UNIGRAM,
        REP_MAX_TOP_TOKEN,
        _TOKENS_SQL,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_distinct_tokens"], r["n_trigrams"],
            r["n_distinct_trigrams"], r["passes_repetition"],
        )
        for r in all_queries()["text_repetition_filter"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    docs = con.execute(
        f"SELECT doc_id, {_TOKENS_SQL} FROM documents"
    ).fetchall()
    con.close()
    want = {}
    for doc_id, toks in docs:
        if len(toks) < 3:
            continue
        uni = Counter(toks)
        tris = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        n, nd = len(toks), len(uni)
        nt, ndt = len(tris), len(set(tris))
        top = max(uni.values())
        passes = (
            1.0 - nd / n <= REP_MAX_DUP_UNIGRAM
            and top / n <= REP_MAX_TOP_TOKEN
            and 1.0 - ndt / nt <= REP_MAX_DUP_TRIGRAM
        )
        want[int(doc_id)] = (n, nd, nt, ndt, passes)
    assert got == want


def test_transition_matrix_matches_python_reference(spark, sf_dir):
    """First-order Markov transitions rebuilt from the (ts, event_id)-
    ordered per-user stream; probabilities row-normalize to 1."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["from_type"], r["to_type"]): (r["n_trans"], r["prob"])
        for r in all_queries()["events_transition_matrix"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    con.close()
    trans: Counter = Counter()
    prev_u = prev_t = None
    for u, et in rows:
        if u == prev_u:
            trans[(prev_t, et)] += 1
        prev_u, prev_t = u, et
    row_tot: Counter = Counter()
    for (a, _), n in trans.items():
        row_tot[a] += n
    assert set(got) == set(trans)
    for k, n in trans.items():
        gn, gp = got[k]
        assert gn == n
        assert abs(gp - n / row_tot[k[0]]) <= 1e-12
    for a in row_tot:  # rows normalize exactly
        assert abs(
            sum(p for (f, _), (_, p) in got.items() if f == a) - 1.0
        ) <= 1e-9


# --------------------------------------------------------------------------
# batch 11: leave-one-fold-out CV, RAG chunking, cumulative distinct
# --------------------------------------------------------------------------


def test_kfold_centroid_cv_matches_python_reference(spark, sf_dir):
    """5-fold leave-one-out centroid CV rebuilt DIRECTLY (per fold,
    recompute centroids from the other folds' points — not by the
    engine's subtraction trick), nearest-centroid argmin with the label
    tie-break, per-fold accuracy."""
    from tmdb_movie_data_pipeline_spark.operators.clustering import (
        _CV_FOLDS,
        _CV_SCALE,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["fold"]: (r["n_test"], r["n_correct"], r["acc_ppm"])
        for r in all_queries()["ml_kfold_centroid_cv"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "embeddings")
    rows = con.execute(
        "SELECT vec_id, label, embedding FROM embeddings"
    ).fetchall()
    con.close()
    pts = [
        (
            int(v) % _CV_FOLDS,
            int(lab),
            [round((float(x) + 1.0) * _CV_SCALE) for x in emb],
        )
        for v, lab, emb in rows
    ]
    want = {}
    for fold in range(_CV_FOLDS):
        train = [(lab, q) for f, lab, q in pts if f != fold]
        test = [(lab, q) for f, lab, q in pts if f == fold]
        sums: dict = defaultdict(lambda: None)
        counts: Counter = Counter()
        for lab, q in train:
            counts[lab] += 1
            if sums[lab] is None:
                sums[lab] = list(q)
            else:
                for i, x in enumerate(q):
                    sums[lab][i] += x
        cent = {
            lab: [s // counts[lab] for s in sums[lab]] for lab in counts
        }
        correct = 0
        for lab, q in test:
            best = min(
                cent,
                key=lambda cl: (
                    sum((a - b) ** 2 for a, b in zip(q, cent[cl])), cl,
                ),
            )
            correct += best == lab
        want[fold] = (
            len(test), correct, 10**6 * correct // len(test)
        )
    assert got == want


def test_rag_chunk_overlap_matches_python_reference(spark, sf_dir):
    """Strided chunking rebuilt with literal Python slices, content
    hashes with hashlib, and the overlap invariant between consecutive
    chunks pinned."""
    import hashlib

    from tmdb_movie_data_pipeline_spark.operators.llm_prep import (
        _RAG_CHUNK,
        _RAG_STRIDE,
        _TOKENS_SQL,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["start_token"], r["n_tokens"], r["first_token"],
            r["last_token"], r["chunk_hash"],
        )
        for r in all_queries()["llm_rag_chunk_overlap"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    docs = con.execute(
        f"SELECT doc_id, {_TOKENS_SQL} FROM documents"
    ).fetchall()
    con.close()
    want = {}
    for doc_id, toks in docs:
        toks = list(toks)
        for s in range(1, max(len(toks), 1) + 1, _RAG_STRIDE):
            ck = toks[s - 1 : s - 1 + _RAG_CHUNK]
            if not ck:
                continue
            idx = (s - 1) // _RAG_STRIDE
            want[(int(doc_id), idx)] = (
                s, len(ck), ck[0], ck[-1],
                hashlib.md5(" ".join(ck).encode()).hexdigest(),
            )
        # overlap invariant: consecutive full chunks share
        # CHUNK - STRIDE tokens
        for idx in range(len(toks) // _RAG_STRIDE):
            a = toks[idx * _RAG_STRIDE : idx * _RAG_STRIDE + _RAG_CHUNK]
            b = toks[(idx + 1) * _RAG_STRIDE :
                     (idx + 1) * _RAG_STRIDE + _RAG_CHUNK]
            if len(a) == _RAG_CHUNK and len(b) == _RAG_CHUNK:
                assert a[_RAG_STRIDE:] == b[: _RAG_CHUNK - _RAG_STRIDE]
    assert got == want


def test_cumulative_distinct_matches_python_reference(spark, sf_dir):
    """Running distinct-type count per user rebuilt with a literal
    ordered walk and a real Python set — the per-row state the engine's
    two-window decomposition deliberately avoids."""
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["user_id"], r["event_id"]): r["n_types_so_far"]
        for r in all_queries()["events_cumulative_distinct"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute(
        "SELECT user_id, event_id, event_type FROM events"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    con.close()
    want = {}
    cur_u = None
    seen: set = set()
    for u, eid, et in rows:
        if u != cur_u:
            cur_u, seen = u, set()
        seen.add(et)
        want[(int(u), int(eid))] = len(seen)
    assert got == want
    # monotone per user, bounded by the type universe
    assert max(got.values()) <= 5


# --------------------------------------------------------------------------
# batch 12: velocity windows, tier migration, quality gates, deterministic
# resampling, exact stratified splits
# --------------------------------------------------------------------------


def test_velocity_flags_match_python_reference(spark, sf_dir):
    """The trailing RANGE-frame velocity rule rebuilt with a literal
    two-pointer walk over each user's epoch-second purchase stream
    (self-inclusive, simultaneous events counted symmetrically)."""
    from tmdb_movie_data_pipeline_spark.operators.events import (
        _VEL_MIN_COUNT,
        _VEL_WINDOW_SEC,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["event_id"]: (r["user_id"], r["cents"], r["n_window"])
        for r in all_queries()["events_velocity_flags"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute("""
        SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT),
               CAST(ROUND(value * 100) AS BIGINT)
        FROM events WHERE event_type = 'purchase'
        ORDER BY user_id, 3, event_id
    """).fetchall()
    con.close()
    per_user: dict = defaultdict(list)
    for u, eid, sec, cents in rows:
        per_user[int(u)].append((int(sec), int(eid), int(cents)))
    want = {}
    for u, evs in per_user.items():
        secs = [s for s, _, _ in evs]
        for i, (sec, eid, cents) in enumerate(evs):
            # RANGE frame: ALL events with sec in [sec-W, sec] — including
            # simultaneous ones ordered after this row
            n = sum(1 for s in secs if sec - _VEL_WINDOW_SEC <= s <= sec)
            if n >= _VEL_MIN_COUNT:
                want[eid] = (u, cents, n)
    assert got == want
    assert want  # the rule fires at this scale (the fixture guarantee)


def test_rfm_migration_matches_python_reference(spark, sf_dir):
    """Tier migration cells rebuilt from per-user half-period purchase
    counts with the fixed tier edges; the matrix conserves users."""
    from tmdb_movie_data_pipeline_spark.operators.events import _MIG_SPLIT
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        (r["tier_from"], r["tier_to"]): (r["n_users"], r["net_purchase_delta"])
        for r in all_queries()["events_rfm_migration_matrix"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "events")
    rows = con.execute(f"""
        SELECT user_id,
               SUM(CASE WHEN ts < TIMESTAMP '{_MIG_SPLIT}' THEN 1 ELSE 0 END),
               SUM(CASE WHEN ts >= TIMESTAMP '{_MIG_SPLIT}' THEN 1 ELSE 0 END)
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    """).fetchall()
    con.close()

    def tier(c: int) -> str:
        return (
            "absent" if c == 0 else
            "low" if c <= 2 else
            "mid" if c <= 5 else "high"
        )

    cells: dict = defaultdict(lambda: [0, 0])
    for _, c1, c2 in rows:
        k = (tier(int(c1)), tier(int(c2)))
        cells[k][0] += 1
        cells[k][1] += int(c2) - int(c1)
    want = {k: tuple(v) for k, v in cells.items()}
    assert got == want
    assert sum(n for n, _ in got.values()) == len(rows)  # users conserved


def test_quality_score_matches_python_reference(spark, sf_dir):
    """Length/stopword/punctuation features and the pass gate rebuilt
    with Python regex over raw text."""
    import re

    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_chars"], r["avg_token_len"],
            r["stopword_ratio"], r["punct_ratio"], r["passes_quality"],
        )
        for r in all_queries()["text_quality_score"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    stop = {"the", "a", "and", "of", "is", "to", "in"}
    for doc_id, text in rows:
        norm = re.sub(r"\s+", " ", text).strip().lower()
        toks = norm.split(" ")
        n = len(toks)
        avg_len = sum(len(t) for t in toks) / n
        sw = sum(1 for t in toks if t in stop) / n
        punct = sum(
            1 for ch in text if not (ch.isascii() and (ch.isalnum() or ch == " "))
        ) / len(text)
        passes = 20 <= n <= 1000 and sw >= 0.01
        gn, gc, gavg, gsw, gp, gpass = got[int(doc_id)]
        assert (gn, gc) == (n, len(norm))
        assert abs(gavg - avg_len) <= 1e-12
        assert abs(gsw - sw) <= 1e-12
        assert abs(gp - punct) <= 1e-12
        assert gpass == passes


def test_domain_mix_matches_python_reference(spark, sf_dir):
    """The deterministic hash-threshold resample rebuilt literally:
    thr = ceil(budget·w·2³² / (W·n_s)), keep iff the Knuth hash falls
    under it; kept counts must track the target share within the
    hash-uniformity tolerance."""
    from tmdb_movie_data_pipeline_spark.operators.llm_prep import (
        _MIX_BUDGET,
        _MIX_KNUTH,
        _MIX_MASK,
        _MIX_MOD,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["source"]: (r["weight"], r["n_docs"], r["n_kept"])
        for r in all_queries()["llm_domain_mix_resample"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute("SELECT doc_id, source FROM documents").fetchall()
    con.close()
    by_src: dict = defaultdict(list)
    for doc_id, src in rows:
        by_src[src].append(int(doc_id))
    w = {s: int(s[3:]) % 4 + 1 for s in by_src}
    big_w = sum(w.values())
    want = {}
    for s, ids in by_src.items():
        n_s = len(ids)
        thr = (
            _MIX_BUDGET * w[s] * _MIX_MOD + big_w * n_s - 1
        ) // (big_w * n_s)
        kept = sum(
            1 for d in ids if ((d % _MIX_MASK) * _MIX_KNUTH) % _MIX_MOD < thr
        )
        want[s] = (w[s], n_s, kept)
    assert got == want


def test_stratified_split_matches_python_reference(spark, sf_dir):
    """Exact 80/10/10 largest-remainder quotas per stratum rebuilt with a
    literal apportionment walk and an md5-ranked assignment; per-stratum
    quota exactness pinned (the guarantee the hash split trades away)."""
    import hashlib

    from tmdb_movie_data_pipeline_spark.operators.llm_prep import (
        _SPLIT_WEIGHTS,
    )
    from tmdb_movie_data_pipeline_spark.registry import all_queries

    got = {
        r["doc_id"]: (r["lang"], r["split"])
        for r in all_queries()["llm_stratified_split_exact"](
            spark, sf_dir
        ).collect()
    }
    con = _con(sf_dir, "documents")
    rows = con.execute("SELECT doc_id, lang FROM documents").fetchall()
    con.close()
    by_lang: dict = defaultdict(list)
    for doc_id, lang in rows:
        by_lang[lang].append(int(doc_id))
    want = {}
    for lang, ids in by_lang.items():
        n = len(ids)
        q = {}
        r = {}
        for name, prio, wt in _SPLIT_WEIGHTS:
            q[name] = wt * n // 10
            r[name] = wt * n % 10
        leftover = n - sum(q.values())
        order = sorted(
            _SPLIT_WEIGHTS, key=lambda v: (-r[v[0]], v[1])
        )
        for i, (name, _, _) in enumerate(order):
            if i < leftover:
                q[name] += 1
        assert sum(q.values()) == n  # exact apportionment
        ranked = sorted(
            ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )
        i = 0
        for name, prio, _ in sorted(_SPLIT_WEIGHTS, key=lambda v: v[1]):
            for d in ranked[i : i + q[name]]:
                want[d] = (lang, name)
            i += q[name]
    assert got == want
