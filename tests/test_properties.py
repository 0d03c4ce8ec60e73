"""Property-based tests (hypothesis) for the pure planning/quantization
logic — the invariants that must hold for ANY input, not just fixtures."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from tmdb_movie_data_pipeline_spark.sources.rest import month_windows

dates = st.dates(min_value=datetime.date(1990, 1, 1), max_value=datetime.date(2035, 12, 31))


@given(d1=dates, d2=dates)
@settings(max_examples=200, deadline=None)
def test_month_windows_cover_range_without_overlap(d1, d2):
    start, end = min(d1, d2), max(d1, d2)
    wins = month_windows(start.isoformat(), end.isoformat())
    assert wins, "at least one window"
    # first window starts at the first of start's month (reference snap);
    # last window ends exactly at `end`
    assert wins[0][0] == start.replace(day=1).isoformat()
    assert wins[-1][1] == end.isoformat()
    for a, b in wins:
        da, db = datetime.date.fromisoformat(a), datetime.date.fromisoformat(b)
        assert da <= db
        assert da.day == 1
        assert (da.year, da.month) == (db.year, db.month), "window within one month"
    # contiguous: next window starts the day after the previous ends
    for (_, b), (a2, _) in zip(wins, wins[1:]):
        db = datetime.date.fromisoformat(b)
        assert datetime.date.fromisoformat(a2) == db + datetime.timedelta(days=1)


@given(
    x=st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
)
@settings(max_examples=500, deadline=None)
def test_quantization_halfaway_matches_engines(x):
    """The pandas-side half-away-from-zero quantizer must equal DuckDB's
    ROUND for every double (the cross-engine contract in operators/udfs.py)."""
    import math

    import duckdb

    py = math.floor(x * 100 + 0.5) if x >= 0 else math.ceil(x * 100 - 0.5)
    (dk,) = duckdb.connect().execute("SELECT CAST(ROUND(? * 100) AS BIGINT)", [x]).fetchone()
    assert int(py) == int(dk)


@given(
    vals=st.lists(
        st.floats(min_value=0, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=100, deadline=None)
def test_quantized_sum_is_order_independent(vals):
    """The qsum contract: quantized-integer sums are identical under any
    permutation (raw float sums are not — that is the whole point)."""
    import math

    def q(x):
        return math.floor(x * 100 + 0.5)

    fwd = sum(q(v) for v in vals)
    rev = sum(q(v) for v in reversed(vals))
    assert fwd == rev


# -- piecewise basis-point scaling (agg_hhi_concentration / agg_gini) ---------

_PIECEWISE_CUT = 900_000_000_000_000  # 9e14, as in the operators


def _piecewise_bp(num: int, den: int) -> int:
    """The exact CASE both engines run: multiplied form below the cut,
    denominator-divided form above."""
    if num < _PIECEWISE_CUT:
        return (10_000 * num) // den
    return num // (den // 10_000)


@given(
    num=st.integers(min_value=0, max_value=(1 << 62) - 1),
    den=st.integers(min_value=1, max_value=(1 << 62) - 1),
)
@settings(max_examples=500)
def test_piecewise_bp_scaling_stays_within_one_bp(num, den):
    """For num <= den (the HHI/Gini regime: numerator bounded by the
    denominator), the piecewise form never deviates more than 1 bp from
    the true rational 1e4*num/den — including across the branch cut.
    (A flat denominator-floor form failed this by 2-4x on small inputs —
    the regression this test now pins.)"""
    if num > den:
        num, den = den, num
    if num >= _PIECEWISE_CUT and den // 10_000 == 0:
        return  # unreachable: num <= den forces den >= cut >> 1e4
    got = _piecewise_bp(num, den)
    true_bp = 10_000 * num / den
    assert abs(got - true_bp) <= 1.0 + 1e-9, (num, den, got, true_bp)


# -- weighted-median crossing row: value invariant under tie permutation ------


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # value (small: forces ties)
            st.integers(min_value=1, max_value=9),  # weight
        ),
        min_size=1,
        max_size=40,
    ),
    seed=st.integers(min_value=0, max_value=999),
)
@settings(max_examples=300)
def test_weighted_median_crossing_value_is_permutation_invariant(rows, seed):
    """The crossing-row PREDICATE (cumw-w < target <= cumw) picks a row
    whose VALUE is identical no matter how ties are ordered — the
    property agg_weighted_median's cross-engine contract rests on."""
    import random

    target = (sum(w for _, w in rows) + 1) // 2

    def crossing_value(seq):
        cum = 0
        for v, w in seq:
            cum += w
            if cum - w < target <= cum:
                return v
        raise AssertionError("no crossing row")

    base = crossing_value(sorted(rows, key=lambda r: r[0]))
    rng = random.Random(seed)
    for _ in range(5):
        shuffled = rows[:]
        rng.shuffle(shuffled)
        # stable sort by value only — tie order follows the shuffle
        assert crossing_value(sorted(shuffled, key=lambda r: r[0])) == base
