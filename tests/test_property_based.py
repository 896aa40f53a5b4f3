"""Property-based tests (hypothesis): distributed semantics must equal the
pandas reference semantics on arbitrary inputs, not just fixtures.

One Spark round-trip per property (lists in, lists out) keeps runtime sane;
hypothesis drives the input shapes.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from market_data_pipeline_spark.functions.helpers import keep_last_dedupe
from market_data_pipeline_spark.functions.parsing import parse_financial_value

SETTLE = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def dup_rows(draw):
    """(symbol, time, close, event_id) rows with deliberate key collisions."""
    n = draw(st.integers(2, 25))
    rows = []
    for i in range(n):
        sym = draw(st.sampled_from(["A", "B", "C"]))
        t = draw(st.integers(0, 5))
        close = draw(st.floats(min_value=-100, max_value=100, allow_nan=False, width=32))
        rows.append((sym, t, float(close), i))
    return rows


@given(dup_rows())
@SETTLE
def test_keep_last_dedupe_matches_pandas(spark, rows):
    df = spark.createDataFrame(rows, "symbol string, time long, close double, event_id long")
    got = {
        (r.symbol, r.time): (r.close, r.event_id)
        for r in keep_last_dedupe(df, ["symbol", "time"], "event_id").collect()
    }
    pdf = pd.DataFrame(rows, columns=["symbol", "time", "close", "event_id"])
    expect = pdf.drop_duplicates(subset=["symbol", "time"], keep="last")
    exp = {
        (r.symbol, r.time): (r.close, r.event_id) for r in expect.itertuples(index=False)
    }
    assert got == exp


def _py_parse(s: str) -> float | None:
    """Python twin of the reference's _parse_financial_value semantics."""
    import re

    t = s.strip().lower()
    m = re.search(r"([-+]?[0-9]*\.?[0-9]+)", t.replace(",", ""))
    if not m:
        return None
    v = float(m.group(1))
    if re.search(r"%\s*$", t):
        return v / 100.0
    if re.search(r"(tỷ|ty)\s*$", t):
        return v * 1e9
    if re.search(r"(triệu|trieu|tr)\s*$", t):
        return v * 1e6
    return v


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
            st.sampled_from(["", "%", " tỷ", " triệu", " tr", " ty", " trieu", "x", " đồng"]),
        ),
        min_size=1,
        max_size=20,
    )
)
@SETTLE
def test_financial_parser_matches_python_reference(spark, vals):
    raws = [f"{num}{suffix}" for num, suffix in vals] + ["n/a", "", "--", "1,234.5 tỷ"]
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = {
        r.raw: r.parsed
        for r in df.withColumn("parsed", parse_financial_value(F.col("raw"))).collect()
    }
    for raw in raws:
        exp = _py_parse(raw)
        if exp is None:
            assert got[raw] is None, raw
        else:
            assert got[raw] == pytest.approx(exp, rel=1e-9), raw


@st.composite
def asof_case(draw):
    n_left = draw(st.integers(1, 20))
    n_right = draw(st.integers(0, 10))
    left = [
        (draw(st.sampled_from(["A", "B"])), draw(st.integers(0, 100)), float(i))
        for i in range(n_left)
    ]
    right = [
        (draw(st.sampled_from(["A", "B"])), draw(st.integers(0, 100)), float(100 + i))
        for i in range(n_right)
    ]
    return left, right


@given(asof_case())
@SETTLE
def test_asof_join_matches_pandas_merge_asof(spark, case):
    import datetime as dt

    from market_data_pipeline_spark.operators import asof

    left_rows, right_rows = case
    # contract: right side has unique (key, time) — dedupe before the join
    # (equal-instant right rows have no deterministic winner)
    right_rows = list({(s, m): (s, m, v) for s, m, v in right_rows}.values())
    base = dt.datetime(2024, 1, 1)

    def ts(m):
        return base + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(s, ts(m), v) for s, m, v in left_rows], "sym string, t timestamp, v double"
    )
    right = spark.createDataFrame(
        [(s, ts(m), v) for s, m, v in right_rows], "sym string, mt timestamp, mark double"
    )
    got = {
        (r.sym, r.t, r.v): r.mark
        for r in asof.asof_join(left, right, "sym", "t", "mt", ["mark"]).collect()
    }

    lp = pd.DataFrame(
        [(s, ts(m), v) for s, m, v in left_rows], columns=["sym", "t", "v"]
    ).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(
        [(s, ts(m), v) for s, m, v in right_rows], columns=["sym", "mt", "mark"]
    ).sort_values("mt", kind="mergesort")
    if rp.empty:
        assert all(v is None for v in got.values())
        return
    # pandas merge_asof needs dedup'd right keys per (sym, mt): keep the LAST
    # mark at each instant, matching the window-ffill (later rows win)
    rp = rp.drop_duplicates(subset=["sym", "mt"], keep="last")
    exp_df = pd.merge_asof(
        lp, rp, left_on="t", right_on="mt", by="sym", direction="backward"
    )
    for row in exp_df.itertuples(index=False):
        expect = None if pd.isna(row.mark) else row.mark
        assert got[(row.sym, row.t, row.v)] == expect


@given(asof_case())
@SETTLE
def test_asof_nearest_matches_pandas_merge_asof(spark, case):
    import datetime as dt

    from market_data_pipeline_spark.operators import asof

    left_rows, right_rows = case
    right_rows = list({(s, m): (s, m, v) for s, m, v in right_rows}.values())
    base = dt.datetime(2024, 1, 1)

    def ts(m):
        return base + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(s, ts(m), v) for s, m, v in left_rows], "sym string, t timestamp, v double"
    )
    right = spark.createDataFrame(
        [(s, ts(m), v) for s, m, v in right_rows], "sym string, mt timestamp, mark double"
    )
    got = {
        (r.sym, r.t, r.v): r.mark
        for r in asof.asof_join(
            left, right, "sym", "t", "mt", ["mark"], direction="nearest"
        ).collect()
    }
    lp = pd.DataFrame(
        [(s, ts(m), v) for s, m, v in left_rows], columns=["sym", "t", "v"]
    ).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(
        [(s, ts(m), v) for s, m, v in right_rows], columns=["sym", "mt", "mark"]
    ).sort_values("mt", kind="mergesort")
    if rp.empty:
        assert all(v is None for v in got.values())
        return
    rp = rp.drop_duplicates(subset=["sym", "mt"], keep="last")
    exp_df = pd.merge_asof(
        lp, rp, left_on="t", right_on="mt", by="sym", direction="nearest"
    )
    for row in exp_df.itertuples(index=False):
        expect = None if pd.isna(row.mark) else row.mark
        assert got[(row.sym, row.t, row.v)] == expect


@st.composite
def edge_sets(draw):
    n_nodes = draw(st.integers(2, 12))
    n_edges = draw(st.integers(1, 18))
    edges = []
    for _ in range(n_edges):
        a = draw(st.integers(0, n_nodes - 1))
        b = draw(st.integers(0, n_nodes - 1))
        if a != b:
            edges.append((min(a, b), max(a, b)))
    return edges or [(0, 1)]


@given(edge_sets())
@SETTLE
def test_dup_groups_matches_union_find(spark, edges):
    """dup_groups == classic union-find on arbitrary small graphs: same
    partition into components, labeled by min member."""
    from market_data_pipeline_spark.operators.dedup import dup_groups

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.group_id for r in dup_groups(df).collect()}
    assert got == expected


@given(asof_case(), st.sampled_from([None, 5.0 * 60, 30.0 * 60]))
@SETTLE
def test_asof_forward_tolerance_matches_pandas(spark, case, tol):
    """direction='forward' + tolerance vs pandas merge_asof on arbitrary
    series: nearest at-or-after match, nulled beyond the staleness bound."""
    import datetime as dt

    from market_data_pipeline_spark.operators import asof

    left_rows, right_rows = case
    right_rows = list({(s, m): (s, m, v) for s, m, v in right_rows}.values())
    base = dt.datetime(2024, 1, 1)

    def ts(m):
        return base + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(s, ts(m), v) for s, m, v in left_rows], "sym string, t timestamp, v double"
    )
    right = spark.createDataFrame(
        [(s, ts(m), v) for s, m, v in right_rows], "sym string, mt timestamp, mark double"
    )
    got = {
        (r.sym, r.t, r.v): r.mark
        for r in asof.asof_join(
            left, right, "sym", "t", "mt", ["mark"],
            direction="forward", tolerance_seconds=tol,
        ).collect()
    }

    lp = pd.DataFrame(
        [(s, ts(m), v) for s, m, v in left_rows], columns=["sym", "t", "v"]
    ).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(
        [(s, ts(m), v) for s, m, v in right_rows], columns=["sym", "mt", "mark"]
    ).sort_values("mt", kind="mergesort")
    if rp.empty:
        assert all(v is None for v in got.values())
        return
    rp = rp.drop_duplicates(subset=["sym", "mt"], keep="last")
    kwargs = {} if tol is None else {"tolerance": pd.Timedelta(seconds=tol)}
    exp_df = pd.merge_asof(
        lp, rp, left_on="t", right_on="mt", by="sym", direction="forward", **kwargs
    )
    for row in exp_df.itertuples(index=False):
        expect = None if pd.isna(row.mark) else row.mark
        assert got[(row.sym, row.t, row.v)] == expect


@st.composite
def event_streams(draw):
    """Per-user event streams with adversarial gaps around the threshold."""
    n_users = draw(st.integers(1, 3))
    rows = []
    for u in range(n_users):
        n = draw(st.integers(1, 12))
        t = draw(st.integers(0, 10_000))
        for _ in range(n):
            rows.append((u, t))
            # gaps straddle the 1800 s threshold: some exactly at it
            t += draw(st.sampled_from([1, 600, 1799, 1800, 1801, 4000]))
    return rows


@given(event_streams())
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_sessionize_partitions_events_with_gap_invariant(spark, rows):
    """Properties: every event lands in exactly one session; within a
    session no consecutive gap exceeds the threshold; consecutive sessions
    of one user are separated by MORE than the threshold; event counts are
    conserved."""
    import datetime as dt

    from market_data_pipeline_spark.operators import behavior

    base = dt.datetime(2025, 1, 1)
    df = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=s), 1.0) for u, s in rows],
        "user_id long, ts timestamp, value double",
    )
    sess = behavior.sessionize(df, gap_minutes=30).collect()
    assert sum(r.n_events for r in sess) == len(rows)

    by_user: dict[int, list] = {}
    for r in sess:
        by_user.setdefault(r.user_id, []).append(r)
    events_by_user: dict[int, list[int]] = {}
    for u, s in rows:
        events_by_user.setdefault(u, []).append(s)
    for u, slist in by_user.items():
        slist.sort(key=lambda r: r.session_seq)
        evs = sorted(events_by_user[u])
        # sessions tile the user's ordered events
        covered = []
        for r in slist:
            start_s = int((r.session_start - base).total_seconds())
            end_s = int((r.session_end - base).total_seconds())
            inside = [e for e in evs if start_s <= e <= end_s]
            assert len(inside) == r.n_events
            covered.extend(inside)
            # within-session max gap <= 1800
            gaps = [b - a for a, b in zip(inside, inside[1:])]
            assert all(g <= 1800 for g in gaps)
        assert sorted(covered) == evs
        # between consecutive sessions: gap > 1800
        for a, b in zip(slist, slist[1:]):
            gap = (b.session_start - a.session_end).total_seconds()
            assert gap > 1800


@given(
    st.lists(st.floats(min_value=0.0, max_value=1.0, allow_nan=False), min_size=1, max_size=30),
    st.lists(st.floats(min_value=0.0, max_value=1.0, allow_nan=False), min_size=1, max_size=30),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_distribution_drift_properties(spark, xs, ys):
    """Gibbs: smoothed KL >= 0 both directions; TVD in [0, 1]; counts
    conserved."""
    from market_data_pipeline_spark.operators import quality

    a = spark.createDataFrame([(float(x),) for x in xs], "x double")
    b = spark.createDataFrame([(float(y),) for y in ys], "x double")
    row = quality.distribution_drift(a, b, "x", bins=4, lo=0.0, hi=1.0).collect()[0]
    assert row.n_a == len(xs) and row.n_b == len(ys)
    assert row.kl_ab >= 0.0 and row.kl_ba >= 0.0
    assert 0.0 <= row.tvd <= 1.0


@given(edge_sets(), st.integers(1, 4))
@SETTLE
def test_kcore_matches_python_peel(spark, edges, k):
    """graph.kcore == the textbook iterative peel on arbitrary small
    graphs: same surviving node set, same in-core degrees."""
    from market_data_pipeline_spark.operators import graph

    # python replica: peel to fixpoint over the deduped undirected graph
    adj: dict[int, set[int]] = {}
    for a, b in set(edges):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # NOTE kcore counts PARALLEL edges separately only if the input has
    # duplicates; feed it the deduped edge list so both sides see the
    # same simple graph
    changed = True
    while changed:
        changed = False
        for n in [n for n, ns in adj.items() if len(ns) < k]:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
            changed = True
    want = {n: len(ns) for n, ns in adj.items()}

    e = spark.createDataFrame(sorted(set(edges)), "src long, dst long")
    got = {r.node: r.deg for r in graph.kcore(e, k=k, max_rounds=30).collect()}
    assert got == want


@st.composite
def asof_null_payload_case(draw):
    """Right rows whose payload value may be NULL — the struct-fill
    atomicity stress: a matched row with a NULL mark must surface that
    NULL, never an earlier row's non-null mark."""
    n_left = draw(st.integers(1, 15))
    n_right = draw(st.integers(1, 10))
    left = [
        (draw(st.sampled_from(["A", "B"])), draw(st.integers(0, 100)), float(i))
        for i in range(n_left)
    ]
    right = [
        (
            draw(st.sampled_from(["A", "B"])),
            draw(st.integers(0, 100)),
            draw(st.one_of(st.none(), st.floats(0, 10, allow_nan=False))),
            100 + i,  # rid: a never-null row id identifying the match
        )
        for i in range(n_right)
    ]
    return left, right


@given(asof_null_payload_case())
@SETTLE
def test_asof_nearest_null_payload_stays_atomic(spark, case):
    """direction='nearest' with NULL payload fields (r5 struct-fill fix):
    the match is decided by ROW (last non-null struct), so a NULL field
    of the matched row must come through as NULL — last(ignorenulls) must
    never skip past it to an older row's value — and rid/mark must always
    originate from ONE right row."""
    import datetime as dt

    from market_data_pipeline_spark.operators import asof

    left_rows, right_rows = case
    right_rows = list(
        {(s, m): (s, m, v, rid) for s, m, v, rid in right_rows}.values()
    )
    base = dt.datetime(2024, 1, 1)

    def ts(m):
        return base + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(s, ts(m), v) for s, m, v in left_rows], "sym string, t timestamp, v double"
    )
    right = spark.createDataFrame(
        [(s, ts(m), v, rid) for s, m, v, rid in right_rows],
        "sym string, mt timestamp, mark double, rid long",
    )
    got = {
        (r.sym, r.t, r.v): (r.rid, r.mark)
        for r in asof.asof_join(
            left, right, "sym", "t", "mt", ["mark", "rid"], direction="nearest"
        ).collect()
    }
    by_rid = {rid: v for _s, _m, v, rid in right_rows}

    lp = pd.DataFrame(
        [(s, ts(m), v) for s, m, v in left_rows], columns=["sym", "t", "v"]
    ).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(
        [(s, ts(m), rid) for s, m, _v, rid in right_rows],
        columns=["sym", "mt", "rid"],
    ).sort_values("mt", kind="mergesort")
    exp_df = pd.merge_asof(
        lp, rp, left_on="t", right_on="mt", by="sym", direction="nearest"
    )
    for row in exp_df.itertuples(index=False):
        rid_got, mark_got = got[(row.sym, row.t, row.v)]
        if pd.isna(row.rid):
            assert rid_got is None and mark_got is None
        else:
            assert rid_got == int(row.rid)
            # atomicity: the mark is the MATCHED row's mark — NULL stays
            # NULL, never an older row's non-null value
            assert mark_got == by_rid[int(row.rid)]


@st.composite
def unigram_word_tables(draw):
    n = draw(st.integers(1, 6))
    words = draw(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=7),
            min_size=n, max_size=n, unique=True,
        )
    )
    return [(w, draw(st.integers(1, 5))) for w in words]


def _ref_unigram(word_counts, em_iters=2):
    """Independent pure-Python Viterbi-EM reference mirroring the spec:
    seed probs from occurrence-weighted substrings (len ≤ 3), per-word
    best segmentation (ties to the LONGER final piece), hard-EM counts,
    10-dp quantization with the +1e-13 nudge at every prob/lp."""
    import math

    def quant(x, dp=10):
        return round(x + 1e-13, dp)

    seeds = {}
    for w, c in word_counts:
        for s in range(len(w)):
            for j in range(1, 4):
                if s + j <= len(w):
                    seeds[w[s : s + j]] = seeds.get(w[s : s + j], 0) + c
    tot = sum(seeds.values())
    lp = {p: quant(math.log(quant(c / tot))) for p, c in seeds.items()}

    def viterbi(w):
        NEG = -1e9
        b = [0.0] + [None] * len(w)
        bp = [0] * (len(w) + 1)
        for i in range(1, len(w) + 1):
            cands = []
            for j in (1, 2, 3):
                if i >= j:
                    cands.append((b[i - j] + lp.get(w[i - j : i], NEG), j))
                else:
                    cands.append((-1e18, j))
            best = max(c[0] for c in cands)
            b[i] = best
            # prefer the longest j achieving best (the j=3,2,1 CASE order)
            bp[i] = max(j for v, j in cands if v == best)
        pieces = []
        pos = len(w)
        while pos > 0:
            pieces.append(w[pos - bp[pos] : pos])
            pos -= bp[pos]
        return pieces

    for _ in range(em_iters):
        counts = {}
        for w, c in word_counts:
            for p in viterbi(w):
                counts[p] = counts.get(p, 0) + c
        tot = sum(counts.values())
        lp = {p: quant(math.log(quant(c / tot))) for p, c in counts.items()}
        probs = {p: quant(c / tot) for p, c in counts.items()}
    return probs


@given(unigram_word_tables())
@SETTLE
def test_unigram_train_matches_reference_viterbi_em(spark, case):
    """The distributed fold-based trainer must agree with an independent
    pure-Python Viterbi-EM on the final piece distribution, including
    tie-breaks and quantization points."""
    from market_data_pipeline_spark.operators import text

    w = spark.createDataFrame(case, "word string, cnt long")
    got = {
        r["piece"]: r["prob"] for r in text.unigram_train(w, em_iters=2).collect()
    }
    want = _ref_unigram(case, em_iters=2)
    assert got == want


@st.composite
def containment_corpora(draw):
    """Small corpora over a tiny vocabulary, biased toward shared runs so
    containment pairs actually occur (clones included)."""
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    n_docs = draw(st.integers(2, 8))
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(3, 10))
        toks = [vocab[draw(st.integers(0, len(vocab) - 1))] for _ in range(n_tok)]
        docs.append((i, " ".join(toks)))
    if draw(st.booleans()) and len(docs) >= 2:
        docs[-1] = (docs[-1][0], docs[0][1])  # force one exact clone
    return docs


@given(containment_corpora(), st.sampled_from([0.5, 0.75, 0.9]))
@SETTLE
def test_containment_join_matches_bruteforce(spark, docs, threshold):
    """containment_join == brute-force over distinct 3-gram shingle sets for
    arbitrary corpora and thresholds (ordered pairs, clone expansion and
    the one-sided prefix filter all exercised)."""
    import itertools

    from market_data_pipeline_spark.operators.dedup import containment_join

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.contained_id, r.container_id): (r.n_common, r.containment)
        for r in containment_join(df, threshold=threshold).collect()
    }

    def shingle_set(text):
        toks = text.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))}

    sets = {i: shingle_set(t) for i, t in docs}
    want = {}
    for a, b in itertools.permutations(sets, 2):
        if not sets[a]:
            continue
        n = len(sets[a] & sets[b])
        c = n / len(sets[a])
        if c >= threshold:
            want[(a, b)] = (n, round(c + 1e-12, 6))
    assert got == want
