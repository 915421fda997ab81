"""ext190: the Lindley max-plus composition algebra, exercised over
ADVERSARIAL batch splits in pure python -- every split of a day's
increment sequence (including empty and single-row batch segments, the
cross-batch boundary row, and multi-day batches) must compose to the
brute-force whole-sequence recursion. This is the algebra the live
streaming fold relies on; the oracle then pins the Spark wiring."""

from __future__ import annotations

import itertools

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext190 import _SERVICE_US


def _brute(arrivals):
    """W_i = max(0, W_{i-1} + S - gap_i); returns (w_end, peak)."""
    w = peak = 0
    for prev, cur in zip(arrivals, arrivals[1:]):
        w = max(0, w + _SERVICE_US - (cur - prev))
        peak = max(peak, w)
    return w, peak


def _quad(ds):
    """(total, maxpref, maxsuffix, kadane) of an increment list; None
    fields for the empty list (the NULL-ignoring greatest analogue)."""
    if not ds:
        return None
    total, pref, minpref_excl = 0, [], 0
    best_pref = None
    kad = None
    run = 0
    minp = 0
    for d in ds:
        run += d
        pref.append(run)
    total = run
    maxpref = max(pref)
    maxsuffix = max(total - p + d for p, d in zip(pref, ds))
    kad, minp = None, 0
    for p in pref:
        cand = p - min(0, minp)
        kad = cand if kad is None else max(kad, cand)
        minp = min(minp, p)
    return total, maxpref, maxsuffix, kad


def _fold_batches(arrival_batches):
    """Replays the streaming fold's per-day merge over batches of
    arrival timestamps (already day-filtered)."""
    state = None  # (w, peak, last_us, seen)
    for batch in arrival_batches:
        if not batch:
            continue
        ds = [
            _SERVICE_US - (b - a) for a, b in zip(batch, batch[1:])
        ]  # in-batch increments (first row's gap crosses the boundary)
        q = _quad(ds)
        if state is None:
            w = max(0, q[2]) if q else 0
            peak = max(0, q[3]) if q else 0
            state = (w, peak, batch[-1], len(batch))
            continue
        w_prev, peak_prev, last_us, seen = state
        w1b = max(0, w_prev + _SERVICE_US - (batch[0] - last_us))
        cands_w = [0, w1b + (q[0] if q else 0)]
        if q:
            cands_w.append(q[2])
        w = max(cands_w)
        cands_p = [peak_prev, w1b]
        if q:
            cands_p.extend([q[3], w1b + q[1]])
        peak = max(cands_p)
        state = (w, peak, batch[-1], seen + len(batch))
    return state


def test_composition_equals_bruteforce_on_all_splits():
    # an arrival pattern with bursts (queue builds) and lulls (resets)
    gaps = [10, 80, 10, 10, 200, 5, 5, 5, 120, 30, 10, 300, 2]
    arrivals = [0]
    for g in gaps:
        arrivals.append(arrivals[-1] + g * 1_000_000)
    n = len(arrivals)
    w_ref, peak_ref = _brute(arrivals)
    # every 3-cut split (including empty segments) must agree
    for c1, c2, c3 in itertools.combinations_with_replacement(
        range(n + 1), 3
    ):
        batches = [
            arrivals[:c1],
            arrivals[c1:c2],
            arrivals[c2:c3],
            arrivals[c3:],
        ]
        st = _fold_batches(batches)
        assert st is not None
        assert (st[0], st[1]) == (w_ref, peak_ref), (c1, c2, c3)
        assert st[3] == n


def test_boundary_only_batches():
    # pathological: every batch holds exactly one arrival -- every
    # increment is a boundary stitch
    arrivals = [i * 30_000_000 for i in range(10)]  # 30s gaps, S=45s
    st = _fold_batches([[a] for a in arrivals])
    w_ref, peak_ref = _brute(arrivals)
    assert (st[0], st[1]) == (w_ref, peak_ref)
    assert st[0] > 0  # 45s service vs 30s gaps: backlog must build
