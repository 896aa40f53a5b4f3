"""Unit tests for bench.py's interference-normalized regression gate
(r9 verdict task 2: the r9 driver run exited rc=1 on a clean tree —
budgets pinned on a faster box than the one that graded them).

The r9-replay scenario uses the ARCHIVED driver numbers from
BENCH_r09.json against a frozen copy of the r9-era budget pins (frozen
here so later budget re-pins can't silently change what this test
exercises). No Spark session needed — the gate is a pure function over
timing dicts once the baseline loader is stubbed.
"""

from __future__ import annotations

import json
import os

import bench as benchmod

# The budget pins as of the r9 close (BASELINE_BENCH.json at commit
# fe525db) — the exact numbers the r9 driver run was falsely gated on.
_R9_BASE = {
    "inv_q1_pricing_summary": 0.661,
    "inv_q5_revenue_by_nation": 1.76,
    "inv_q3_top_orders": 1.162,
    "inv_w1_sma": 1.196,
    "inv_w3_rsi": 0.982,
    "inv_w8_returns_momentum": 1.074,
    "inv_s1_bars_ohlcv": 0.721,
    "inv_a1_breadth": 1.198,
    "inv_w14_composite_signal": 3.548,
    "inv_w2_ema_macd": 1.762,
    "inv_a6a8_quality": 1.237,
    "inv_o4_topk_per_group": 0.863,
    "entry_flagship": 1.179,
    "inv_d_minhash_lsh": 6.437,
    "inv_sim_ann_topk": 4.218,
    "inv_t_tfidf": 3.791,
    "inv_x_curated_corpus": 4.82,
    "inv_x_semantic_curation": 5.72,
    "inv_d_jaccard_prefix": 5.18,
    "inv_g_pagerank": 5.2,
    "inv_g_hits": 3.38,
    "inv_d_lsh_band_sweep": 2.36,
    "inv_s_versioned_scan": 1.97,
    "inv_x_quality_logreg": 1.67,
    "inv_t_unigram_encode": 4.45,
    "inv_d_containment": 3.66,
    "inv_t_textrank": 2.1,
    "inv_g_link_prediction": 2.35,
    "inv_st_cusum": 2.17,
    "inv_d_incremental_versioned": 4.12,
    "inv_t_hybrid_ndcg": 4.98,
    "inv_t_bm25_prf": 2.22,
    "inv_v_pca_power": 3.01,
    "inv_t_hybrid_ndcg3": 3.29,
    "inv_d_cdc_admission": 4.95,
    "inv_t_unigram_ppl": 4.18,
    "inv_g_label_prop": 4.84,
    "inv_v_pca2": 5.44,
}


def _stub_baseline(monkeypatch, base=_R9_BASE, sf=0.1):
    monkeypatch.setattr(
        benchmod, "_load_baseline", lambda: {"queries": dict(base), "sf": sf}
    )


def _r9_driver_timings():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_r09.json")) as fh:
        return dict(json.load(fh)["parsed"]["queries"])


def test_gate_r9_driver_replay_normalizes_broad_slowdown(monkeypatch):
    """The r9 driver box ran plan-identical fixed-cost queries ~2x the
    pin (q1 0.661 -> 1.357 with zero code change). The normalized gate
    must absorb that broad factor: inv_st_cusum (3.58x its pin, tripped
    in r9) passes, and of the two r9 false alarms only the extreme
    single-query interference burst (curated_corpus at 7.1x, 34 s for a
    query the same commit ran in 3.6 s an hour later) survives as a
    SUSPECT — which main() answers with a late re-measure, not a pure
    threshold (a burst is a measurement artifact, so it gets more
    measurements)."""
    _stub_baseline(monkeypatch)
    t = _r9_driver_timings()
    f = benchmod._norm_factor(t, _R9_BASE)
    assert 1.3 < f < 2.5  # a broadly ~1.5-2x slow box, not a clean one
    assert benchmod._suspects(t) == ["inv_x_curated_corpus"]
    # and had the late re-measure recovered curated's honest cost (the
    # 8-core run of the same commit measured 3.58 s), the run gates clean
    t2 = dict(t, inv_x_curated_corpus=3.578)
    assert benchmod._suspects(t2) == []
    assert benchmod._gate(t2, 0.1) == 0


def test_gate_uniform_slow_box_is_clean(monkeypatch):
    """A uniformly 2.5x-slow host (every query scaled, no code change)
    used to trip the unnormalized 2x total check; the median factor
    absorbs it entirely."""
    _stub_baseline(monkeypatch)
    t = {n: round(v * 2.5, 3) for n, v in _R9_BASE.items()}
    assert benchmod._suspects(t) == []
    assert benchmod._gate(t, 0.1) == 0


def test_gate_still_trips_single_query_regression(monkeypatch):
    """A real regression is localized: on an otherwise-clean run one
    query at >3x+1s must still exit 1 — normalization must not blunt
    the per-query check when the rest of the run is on-budget."""
    _stub_baseline(monkeypatch)
    t = dict(_R9_BASE)
    t["inv_g_pagerank"] = round(_R9_BASE["inv_g_pagerank"] * 3.5 + 1.5, 3)
    assert benchmod._norm_factor(t, _R9_BASE) == 1.0
    assert benchmod._suspects(t) == ["inv_g_pagerank"]
    assert benchmod._gate(t, 0.1) == 1


def test_gate_still_trips_persistent_regression_on_slow_box(monkeypatch):
    """Normalization composes, it does not blanket-disable: on a 1.5x
    box a query at 6x its pin (persisting through the re-measure, which
    is what reaching _gate means) still trips."""
    _stub_baseline(monkeypatch)
    t = {n: round(v * 1.5, 3) for n, v in _R9_BASE.items()}
    t["inv_d_containment"] = round(_R9_BASE["inv_d_containment"] * 6.0, 3)
    assert benchmod._suspects(t) == ["inv_d_containment"]
    assert benchmod._gate(t, 0.1) == 1


def test_gate_still_trips_broad_code_regression(monkeypatch):
    """The total check stays a live backstop: a >4x across-the-board
    slowdown saturates the total clamp (2.0) and exits 1 even though no
    single query clears its normalized per-query threshold."""
    _stub_baseline(monkeypatch)
    t = {n: round(v * 4.5, 3) for n, v in _R9_BASE.items()}
    assert benchmod._gate(t, 0.1) == 1


def test_gate_disabled_off_sf_and_on_malformed_baseline(monkeypatch):
    _stub_baseline(monkeypatch)
    t = {n: v * 10 for n, v in _R9_BASE.items()}
    assert benchmod._gate(t, 0.01) == 0  # calibrated at the baseline SF
    monkeypatch.setattr(benchmod, "_load_baseline", lambda: None)
    assert benchmod._gate(t, 0.1) == 0
    assert benchmod._suspects(t) == []


def test_norm_factor_needs_quorum():
    """A small tracked intersection (e.g. a subset run) gates
    unnormalized — eight points is the minimum for a meaningful median."""
    small = {f"q{i}": 2.0 for i in range(5)}
    base = {f"q{i}": 1.0 for i in range(5)}
    assert benchmod._norm_factor(small, base) == 1.0
