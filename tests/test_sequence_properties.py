"""Property laws for the sequence_count machine (pure driver — the
single-pass machine IS the spec all three engines replay, so the laws
are stated against a resumable reference implementation and the
engine-agreement fuzz lives in test_sequence_count.py).

One NON-law is pinned too: completions are NOT monotone in the
``within`` gap bound — a larger window can trap the machine mid-chain
waiting on a completion that arrives too late, while a smaller window
resets early and catches a later fresh chain.  Found by hypothesis-
style search while drafting this suite; kept as a regression test so
nobody "fixes" the machine into a law it never had (ClickHouse's
greedy matcher shares the shape)."""

from hypothesis import given, settings
from hypothesis import strategies as st

STAGES = ["a", "b", "c"]


def machine_step(state, ev, n_stages, within_us):
    """One transition of the documented machine — the resumable form
    (the streaming twin's prefix-stability argument IS this
    factoring)."""
    k, lt, n = state
    t, si = ev
    if si < 0 or si != k:
        return (k, lt, n)
    if k > 0 and within_us is not None and t - lt > within_us:
        return (0, None, n)
    if k == n_stages - 1:
        return (0, None, n + 1)
    return (k + 1, t, n)


def run(evs, n_stages, within_us, state=(0, None, 0)):
    for ev in sorted(evs):
        state = machine_step(state, ev, n_stages, within_us)
    return state


_events = st.lists(
    st.tuples(
        st.integers(0, 60),  # µs — dense, lots of ties
        st.integers(-1, 2),  # stage index, -1 = untracked
    ),
    min_size=0,
    max_size=40,
)
_within = st.one_of(st.none(), st.integers(1, 80))


@settings(max_examples=300, deadline=None)
@given(_events, _within)
def test_count_bounded_by_scarcest_stage(evs, w):
    """Each completion consumes exactly one event of every stage type,
    so n <= min over stages of that stage's event count."""
    _, _, n = run(evs, 3, w)
    counts = [sum(1 for _, si in evs if si == k) for k in range(3)]
    assert n <= min(counts) if counts else n == 0


@settings(max_examples=300, deadline=None)
@given(_events, _within, st.integers(0, 61))
def test_prefix_stability(evs, w, cut):
    """Folding a time-prefix and resuming from its state equals one
    whole-stream fold — the exact law sequence_count_stream's
    buffer-until-watermark correctness rests on (sealed events fold,
    state carries, nothing is revisited)."""
    evs = sorted(evs)
    pre = [e for e in evs if e[0] <= cut]
    post = [e for e in evs if e[0] > cut]
    mid = run(pre, 3, w)
    assert run(post, 3, w, state=mid) == run(evs, 3, w)


@settings(max_examples=300, deadline=None)
@given(_events, _within)
def test_input_order_irrelevant(evs, w):
    """The machine consumes the (t, stage-index)-sorted stream, so any
    arrival permutation folds identically (the out-of-order ingestion
    guarantee)."""
    assert run(list(reversed(evs)), 3, w) == run(evs, 3, w)


@settings(max_examples=300, deadline=None)
@given(_events, _within)
def test_untracked_events_invisible(evs, w):
    """Untracked types are no-ops — the law that makes the streaming
    twin's tracked-type source filter exact."""
    tracked = [e for e in evs if e[1] >= 0]
    assert run(tracked, 3, w) == run(evs, 3, w)


@settings(max_examples=300, deadline=None)
@given(_events, _within, st.integers(0, 10**12))
def test_time_translation_invariant(evs, w, shift):
    """Gaps, not absolute instants, drive every transition."""
    shifted = [(t + shift, si) for t, si in evs]
    k1, lt1, n1 = run(evs, 3, w)
    k2, lt2, n2 = run(shifted, 3, w)
    assert (k1, n1) == (k2, n2)
    assert (lt1 is None) == (lt2 is None)
    if lt1 is not None:
        assert lt2 == lt1 + shift


def test_within_not_monotone_pinned():
    """NON-law regression: n is NOT monotone in the gap bound.  In this
    stream the W=10 machine anchors at t=2, reaches k=2 at t=6, then
    stays trapped until the only 'c' (t=38) arrives 32 past the gap —
    reset with nothing left; the W=2 machine resets at t=6 already,
    anchors fresh at t=34 and completes 36b -> 38c.  A larger window
    traps; a smaller one frees."""
    evs = [
        (2, 0), (3, 2), (4, 2), (6, 1), (7, 1), (25, 1), (26, 1),
        (27, 1), (34, 0), (36, 0), (36, 1), (37, 0), (37, 0), (37, 1),
        (38, 2),
    ]
    _, _, n_small = run(evs, 3, 2)
    _, _, n_large = run(evs, 3, 10)
    assert n_small == 1 and n_large == 0  # larger within, FEWER chains
