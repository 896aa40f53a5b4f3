"""Graph analytics (operators/graph.py): hand-computed micro-graphs for
triangle census and PageRank, the basket-cap fan-out bound, and the
degree histogram. The cross-engine value checks live in the driver
oracle (`inv_g_*` in __spark_entry__.py); these tests pin the math on
graphs small enough to verify by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_data_pipeline_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_triangle_stats_k4_plus_pendant(spark):
    # K4 on {1,2,3,4} (4 triangles) plus pendant edge (4,5).
    # degrees: 1,2,3 -> 3; 4 -> 4; 5 -> 1. wedges = 3*C(3,2)+C(4,2)+0 = 15.
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)])
    row = graph.triangle_stats(e).collect()[0]
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7
    assert row["n_wedges"] == 15
    assert row["n_triangles"] == 4
    assert abs(row["clustering_coef"] - 3 * 4 / 15) < 1e-6


def test_triangle_stats_triangle_free(spark):
    # 4-cycle: wedges but zero triangles
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    row = graph.triangle_stats(e).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 4
    assert row["clustering_coef"] == 0.0


def test_pagerank_matches_pure_python_replica(spark):
    # path 1-2-3 plus triangle 3-4-5: asymmetric enough that ranks differ.
    pairs = [(1, 2), (2, 3), (3, 4), (3, 5), (4, 5)]
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank(_edges(spark, pairs), iterations=10).collect()
    }

    # pure-Python replica of the quantized loop (same nudge + rounding)
    sym: dict[int, list[int]] = {}
    for a, b in pairs:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    n = len(sym)
    pr = {v: round(1.0 / n + 1e-13, 10) for v in sym}
    for _ in range(10):
        nxt = {v: 0.0 for v in sym}
        for u, outs in sym.items():
            for v in outs:
                nxt[v] += pr[u] / len(outs)
        pr = {v: round(0.15 / n + 0.85 * s + 1e-13, 10) for v, s in nxt.items()}
    assert got == pr
    # rank mass stays ~1 (no dangling leakage on a symmetric graph)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_symmetric_star_orders_hub_first(spark):
    # star: hub 0 with leaves 1..4 — the hub must outrank every leaf
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank(
            _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)]), iterations=10
        ).collect()
    }
    hub, leaves = got[0], [got[i] for i in (1, 2, 3, 4)]
    assert all(hub > leaf for leaf in leaves)
    assert len(set(leaves)) == 1  # symmetry: identical leaf ranks


def test_edges_from_baskets_weights_and_order(spark):
    items = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 20), (2, 10), (2, 10)],  # dup line
        "bk long, it long",
    )
    rows = {
        (r["src"], r["dst"]): r["weight"]
        for r in graph.edges_from_baskets(items, "bk", "it").collect()
    }
    # (10,20) in both baskets; dup (2,10) line must not double-count
    assert rows == {(10, 20): 2, (10, 30): 1, (20, 30): 1}


def test_edges_from_baskets_cap_bounds_fanout(spark):
    # one degenerate 10-item basket, cap 3: only the 3 smallest ids pair
    items = spark.createDataFrame(
        [(1, i) for i in range(10)], "bk long, it long"
    )
    rows = sorted(
        (r["src"], r["dst"])
        for r in graph.edges_from_baskets(items, "bk", "it", max_basket=3).collect()
    )
    assert rows == [(0, 1), (0, 2), (1, 2)]


def test_degree_histogram_micro(spark):
    # star hub deg 3, leaves deg 1
    hist = {
        r["degree"]: r["n_nodes"]
        for r in graph.degree_histogram(
            _edges(spark, [(0, 1), (0, 2), (0, 3)])
        ).collect()
    }
    assert hist == {3: 1, 1: 3}


def test_copurchase_edges_src_lt_dst(spark, sf_dir):
    e = graph.copurchase_edges(spark, sf_dir)
    assert e.filter(F.col("src") >= F.col("dst")).count() == 0
    assert e.filter(F.col("weight") < 1).count() == 0


# -- weighted sampling (features.weighted_sample) lives here with the other
# -- round-4 additions: replica-exactness + weight-proportionality contract


def test_weighted_sample_matches_python_replica(spark):
    import math

    from market_data_pipeline_spark.operators import features

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(200)] + [(200, 0.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [
        (r["id"], r["es_key"])
        for r in features.weighted_sample(df, "id", "w", 25).collect()
    ]

    def key(i, w):
        u = ((i * 2654435761) % (1 << 20) + 0.5) / (1 << 20)
        return round(math.log(u) / w + 1e-12, 9)

    want = sorted(
        ((i, key(i, w)) for i, w in rows if w > 0),
        key=lambda t: (-t[1], t[0]),
    )[:25]
    assert got == want  # zero-weight row 200 must never appear


def test_weighted_sample_favors_heavy_rows(spark):
    # two strata with identical id-hash distribution (ids interleaved):
    # weight-1000 rows must dominate a k=50 sample over weight-1 rows
    from market_data_pipeline_spark.operators import features

    rows = [(i, 1000.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    picked = features.weighted_sample(df, "id", "w", 50).collect()
    heavy = sum(1 for r in picked if r["w"] == 1000.0)
    assert heavy >= 45


def test_weighted_sample_per_group_quota_and_determinism(spark):
    from market_data_pipeline_spark.operators import features

    rows = [(i, "a" if i < 100 else "b", float(1 + i % 7)) for i in range(150)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    out = features.weighted_sample_per_group(df, "g", "id", "w", 5).collect()
    by_g: dict[str, list] = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["id"])
    assert sorted(by_g) == ["a", "b"]
    assert len(by_g["a"]) == 5 and len(by_g["b"]) == 5
    # determinism: a second run selects the identical ids
    out2 = features.weighted_sample_per_group(df, "g", "id", "w", 5).collect()
    assert sorted((r["g"], r["id"]) for r in out) == sorted(
        (r["g"], r["id"]) for r in out2
    )


# -- plan-shape pins for the round-4 additions ----------------------------


def test_weighted_sample_plan_is_local_topk(spark):
    from market_data_pipeline_spark.operators import features

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    plan = (
        features.weighted_sample(df, "id", "w", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # per-partition top-k, never a global sort
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_weighted_group_sample_plan_prunes_with_window_group_limit(spark):
    from market_data_pipeline_spark.operators import features

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 7 + 1).cast("double").alias("w"),
    )
    plan = (
        features.weighted_sample_per_group(df, "g", "id", "w", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_triangle_closure_join_is_equi_join(spark):
    # the wedge-closure join must be a hash/merge EQUI-join on (v, w) —
    # never an unkeyed cartesian over the wedge stream. (The single-row
    # scalar assembly at the top IS a broadcast cross of 1-row aggregates;
    # that's the cheap, intended shape.)
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    plan = (
        graph.triangle_stats(e)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin [v#" in plan) or ("BroadcastHashJoin [v#" in plan)


def test_hop_distances_path_graph(spark):
    # path 1-2-3-4-5, seed {1}, max 3 hops: node 5 is unreached
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["hops"]
        for r in graph.hop_distances(e, seeds, max_hops=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_hop_distances_multi_source_takes_min(spark):
    # seeds at both ends of the path: middle node is 2 hops from either
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,), (5,)], "node long")
    got = {
        r["node"]: r["hops"]
        for r in graph.hop_distances(e, seeds, max_hops=3).collect()
    }
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_hop_distances_isolated_seed_survives(spark):
    # a seed with no edges still reports hops 0 (reach defined per seed)
    e = _edges(spark, [(1, 2)])
    seeds = spark.createDataFrame([(99,)], "node long")
    got = {
        r["node"]: r["hops"]
        for r in graph.hop_distances(e, seeds, max_hops=2).collect()
    }
    assert got == {99: 0}


def test_graph_components_match_union_find(spark):
    # two triangles bridged to nothing + an isolated edge
    from market_data_pipeline_spark.operators import dedup

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["group_id"] for r in dedup.dup_groups(e).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_temperature_mixture_rates_limits(spark):
    from market_data_pipeline_spark.operators import features

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "id long, g string",
    )
    # alpha=1: natural shares, boost 1
    nat = {r["g"]: r for r in features.temperature_mixture_rates(df, "g", 1.0).collect()}
    assert abs(nat["big"]["share"] - 0.9) < 1e-6
    assert abs(nat["big"]["boost"] - 1.0) < 1e-6
    # alpha=0: uniform temp shares regardless of size
    uni = {r["g"]: r for r in features.temperature_mixture_rates(df, "g", 0.0).collect()}
    assert abs(uni["big"]["temp_share"] - 0.5) < 1e-6
    assert abs(uni["small"]["temp_share"] - 0.5) < 1e-6
    # intermediate alpha boosts the rare group above natural share
    mid = {r["g"]: r for r in features.temperature_mixture_rates(df, "g", 0.3).collect()}
    assert mid["small"]["boost"] > 1.0 > mid["big"]["boost"]
    assert abs(mid["big"]["temp_share"] + mid["small"]["temp_share"] - 1.0) < 1e-5


def test_personalized_pagerank_concentrates_on_seeds(spark):
    # symmetric path 1-2-3-4-5; seeding node 1 must break the symmetry
    # between nodes 1 and 5 (equal by structure) and decay with distance
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank(e, iterations=10, seeds=seeds).collect()
    }
    assert got[1] > got[2] > got[3] > got[4] >= got[5]
    # rank mass still ~1 (teleport mass conserved on the seed)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_personalized_pagerank_matches_python_replica(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (3, 5), (4, 5)]
    seeds = spark.createDataFrame([(2,), (5,)], "node long")
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank(
            _edges(spark, pairs), iterations=10, seeds=seeds
        ).collect()
    }

    sym: dict[int, list[int]] = {}
    for a, b in pairs:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    sset = {2, 5}
    pr = {
        v: round((1.0 / len(sset) if v in sset else 0.0) + 1e-13, 10)
        for v in sym
    }
    for _ in range(10):
        nxt = {v: 0.0 for v in sym}
        for u, outs in sym.items():
            for v in outs:
                nxt[v] += pr[u] / len(outs)
        pr = {
            v: round(
                (0.15 / len(sset) if v in sset else 0.0) + 0.85 * s + 1e-13, 10
            )
            for v, s in nxt.items()
        }
    assert got == pr


def test_modularity_two_triangles_with_bridge(spark):
    # triangles {1,2,3} and {4,5,6} bridged by (3,4); perfect partition:
    # Q = 6/7 - 2*(7/14)^2 = 0.357143
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)])
    asg = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)], "node long, g long"
    )
    row = graph.modularity(e, asg).collect()[0]
    assert row["m_edges"] == 7
    assert row["n_communities"] == 2
    assert abs(row["q_modularity"] - (6 / 7 - 2 * (7 / 14) ** 2)) < 1e-5


def test_modularity_unassigned_nodes_are_singletons(spark):
    # same graph, but only the first triangle assigned: nodes 4,5,6 become
    # singleton communities (no intra edges), which must lower Q
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)])
    full = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)], "node long, g long"
    )
    part = spark.createDataFrame([(1, 1), (2, 1), (3, 1)], "node long, g long")
    q_full = graph.modularity(e, full).collect()[0]["q_modularity"]
    q_part = graph.modularity(e, part).collect()[0]["q_modularity"]
    assert q_part < q_full
    assert graph.modularity(e, part).collect()[0]["n_communities"] == 4


def test_personalized_pagerank_ignores_absent_seeds(spark):
    # a seed not in the edge set can't hold rank: mass must still sum to 1
    e = _edges(spark, [(1, 2), (2, 3)])
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank(e, iterations=10, seeds=seeds).collect()
    }
    assert 99 not in got
    assert abs(sum(got.values()) - 1.0) < 1e-4
    # and equals the run seeded with {1} alone (99 contributed nothing)
    alone = {
        r["node"]: r["pr"]
        for r in graph.pagerank(
            e, iterations=10, seeds=spark.createDataFrame([(1,)], "node long")
        ).collect()
    }
    assert got == alone


def test_hop_distances_duplicate_seed_rows_collapse(spark):
    e = _edges(spark, [(1, 2)])
    seeds = spark.createDataFrame([(1,), (1,), (1,)], "node long")
    rows = graph.hop_distances(e, seeds, max_hops=1).collect()
    assert sorted((r["node"], r["hops"]) for r in rows) == [(1, 0), (2, 1)]


def test_kcore_peels_tail_keeps_clique(spark):
    # K5 clique (nodes 1..5) with a pendant path 5-10-11: the path nodes
    # have degree <= 2 and peel away in waves; the clique survives as the
    # 3-core with every member at degree 4. Node 10's degree drops only
    # AFTER 11 is removed — two peel rounds, exercising the cascade.
    import itertools

    edges = list(itertools.combinations([1, 2, 3, 4, 5], 2)) + [(5, 10), (10, 11)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.deg for r in graph.kcore(e, k=3).collect()}
    assert got == {1: 4, 2: 4, 3: 4, 4: 4, 5: 4}
    # k above the clique degree peels everything
    assert graph.kcore(e, k=5).count() == 0
    # k=1 keeps the whole graph with full degrees
    all_deg = {r.node: r.deg for r in graph.kcore(e, k=1).collect()}
    assert all_deg[10] == 2 and all_deg[11] == 1 and all_deg[5] == 5


def test_hits_bipartite_mutual_reinforcement(spark):
    # part 100 sits in both baskets, parts 200/300 in one each: the shared
    # part must out-rank the singletons, and scores L1-normalize to ~1
    rows = [(1, 100), (1, 200), (2, 100), (2, 300)]
    e = spark.createDataFrame(rows, "ok long, pk long")
    got = {r.item: r.auth for r in graph.hits_bipartite(e, iterations=4).collect()}
    assert set(got) == {100, 200, 300}
    assert got[100] > got[200] and got[100] > got[300]
    assert abs(got[200] - got[300]) < 1e-9  # symmetric singletons
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_hits_bipartite_empty_input_returns_empty(spark):
    """nb == 0 must yield an empty typed frame, not a driver
    ZeroDivisionError (r4 advice)."""
    e = spark.createDataFrame([], "ok long, pk long")
    out = graph.hits_bipartite(e, iterations=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["item", "auth"]


def test_hits_bipartite_plan_has_no_global_window(spark):
    """The L1 normalization must be a broadcast scalar total over the
    CHECKPOINTED half-step aggregate — never a whole-frame window, which
    funnels the O(items) score table through one partition (r4 verdict
    #3: items = the full part/URL universe, grows with the graph)."""
    from tests.test_plan_shapes import _global_window_lines

    rows = [(1, 100), (1, 200), (2, 100), (2, 300)]
    e = spark.createDataFrame(rows, "ok long, pk long")
    out = graph.hits_bipartite(e, iterations=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert not _global_window_lines(plan)


def test_train_logistic_matches_python_replica(spark):
    """Quantized full-batch GD: every iterate's coefficients and pre-update
    log-loss must match a sequential python replica exactly — the 10dp
    quantization after each step is what makes the fixpoint independent of
    summation order (the pagerank/k-means contract)."""
    import math

    from market_data_pipeline_spark.operators import features

    rows = [
        (1.0 if i % 3 == 0 else 0.0, (i % 7) / 10.0, ((i * 5) % 11) / 20.0)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "y double, a double, b double")
    got = [
        (r.step, r.b0, r.b1, r.b2, r.logloss)
        for r in features.train_logistic(
            df, "y", ["a", "b"], iterations=4, lr=1.5
        ).collect()
    ]

    beta = [0.0, 0.0, 0.0]
    want = []
    n = len(rows)
    for step in range(1, 5):
        g = [0.0, 0.0, 0.0]
        ll = 0.0
        for y, a, b in rows:
            p = 1.0 / (1.0 + math.exp(-(beta[0] + beta[1] * a + beta[2] * b)))
            g[0] += p - y
            g[1] += (p - y) * a
            g[2] += (p - y) * b
            ll += -(y * math.log(p) + (1.0 - y) * math.log(1.0 - p))
        beta = [round(beta[j] - 1.5 * g[j] / n + 1e-9, 10) for j in range(3)]
        want.append((step, beta[0], beta[1], beta[2], round(ll / n + 1e-9, 6)))
    assert got == want
    # the model must actually learn: loss decreases monotonically here
    losses = [w[4] for w in want]
    assert losses == sorted(losses, reverse=True)


def test_ols_closed_form_exact_and_vs_numpy(spark):
    """Closed-form OLS: (1) a perfectly linear integer dataset recovers its
    generating coefficients exactly with R²=1; (2) a noisy dataset matches
    numpy's lstsq solution to 6 dp."""
    import numpy as np

    from market_data_pipeline_spark.operators.features import ols_closed_form

    gen = [(1 + 2 * a + 5 * b, a, b) for a in range(12) for b in range(7)]
    df = spark.createDataFrame(gen, "y long, x1 long, x2 long")
    row = ols_closed_form(df, "y", "x1", "x2").collect()[0]
    assert (row.n, row.beta0, row.beta1, row.beta2) == (84, 1.0, 2.0, 5.0)
    assert row.r2 == 1.0

    rng = np.random.RandomState(7)
    x1 = rng.randint(0, 50, 300)
    x2 = rng.randint(0, 20, 300)
    y = (3 + 4 * x1 - 2 * x2 + rng.randint(-5, 6, 300)).astype(int)
    noisy = spark.createDataFrame(
        [(int(yy), int(a), int(b)) for yy, a, b in zip(y, x1, x2)],
        "y long, x1 long, x2 long",
    )
    got = ols_closed_form(noisy, "y", "x1", "x2").collect()[0]
    A = np.column_stack([np.ones_like(x1), x1, x2]).astype(float)
    beta, *_ = np.linalg.lstsq(A, y.astype(float), rcond=None)
    assert abs(got.beta0 - beta[0]) < 1e-5
    assert abs(got.beta1 - beta[1]) < 1e-5
    assert abs(got.beta2 - beta[2]) < 1e-5
    resid = y - A @ beta
    r2 = 1 - (resid @ resid) / ((y - y.mean()) @ (y - y.mean()))
    assert abs(got.r2 - r2) < 1e-5


def test_association_rules_hand_computed(spark):
    """Baskets {a,b,c}, {a,b}, {a}: supp(ab)=2, conf(b→a)=1, conf(a→b)=2/3,
    lift(ab)=(2·3)/(3·2)=1; rarer pairs get higher lift."""
    from market_data_pipeline_spark.operators.graph import association_rules

    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a")]
    df = spark.createDataFrame(rows, "bk long, item string")
    out = association_rules(df, "bk", "item", min_pair_count=1, k=50).collect()
    got = {(r.antecedent, r.consequent): r for r in out}
    assert got[("b", "a")].confidence == 1.0
    assert got[("a", "b")].confidence == round(2 / 3 + 1e-12, 6)
    assert got[("a", "b")].support == round(2 / 3 + 1e-12, 6)
    assert got[("a", "b")].lift == 1.0 and got[("b", "a")].lift == 1.0
    # (b,c) co-occur once but b,c are rare -> lift (1·3)/(2·1) = 1.5 tops
    assert got[("b", "c")].lift == 1.5
    assert out[0].lift >= out[-1].lift
    # duplicate (basket,item) rows must not inflate supports
    dup = association_rules(
        df.unionByName(df), "bk", "item", min_pair_count=1, k=50
    ).collect()
    assert {(r.antecedent, r.consequent): (r.pair_count, r.lift) for r in dup} == {
        (r.antecedent, r.consequent): (r.pair_count, r.lift) for r in out
    }


def test_link_prediction_hand_computed(spark):
    """Path graph 1-2-3 plus hub 4 connected to 1,2,3: pair (1,3) shares
    neighbors {2,4} (cn=2) and is non-adjacent -> Jaccard 2/(3+3-2)=0.5;
    adjacent pairs never appear."""
    from market_data_pipeline_spark.operators.graph import link_prediction

    edges = [(1, 2), (2, 3), (1, 4), (2, 4), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = link_prediction(df, k=10).collect()
    got = {(r.node_a, r.node_b): (r.common_neighbors, r.jaccard_score) for r in rows}
    # degrees: 1->2 (2,4), 2->3 (1,3,4), 3->2 (2,4), 4->3 (1,2,3)
    assert got == {(1, 3): (2, round(2 / (2 + 2 - 2) + 1e-12, 6))}


def test_neyman_allocation_hand_computed(spark):
    """Two strata, equal sizes, σ ratio 3:1 -> allocations split 75/25;
    largest-remainder keeps the total EXACTLY at budget; a constant
    stratum (σ=0) gets nothing."""
    from market_data_pipeline_spark.operators.features import neyman_allocation

    rows = (
        [("a", v) for v in (10, 40)] * 6          # sigma 15, n 12
        + [("b", v) for v in (20, 30)] * 6        # sigma 5,  n 12
        + [("c", 7)] * 4                           # sigma 0,  n 4
    )
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r.g: r for r in neyman_allocation(df, "g", "x", budget=100).collect()}
    assert got["a"].sigma == 15.0 and got["b"].sigma == 5.0 and got["c"].sigma == 0.0
    assert got["a"].n_alloc == 75 and got["b"].n_alloc == 25 and got["c"].n_alloc == 0
    assert sum(r.n_alloc for r in got.values()) == 100
    # uneven budget exercises largest-remainder: 101 -> 75.75/25.25/0
    got2 = {r.g: r.n_alloc for r in neyman_allocation(df, "g", "x", budget=101).collect()}
    assert got2 == {"a": 76, "b": 25, "c": 0}
    assert sum(got2.values()) == 101


def test_calibration_report_perfectly_calibrated_and_ece(spark):
    """A separable dataset where the trained model predicts confidently:
    bins partition all rows, n sums to the corpus, ECE equals the
    n-weighted mean gap recomputed from the report itself, and every
    confidence/accuracy lies in [0,1]."""
    from market_data_pipeline_spark.operators.features import calibration_report

    rows = [(1.0, 1.0, 0.9) for _ in range(40)] + [(0.0, 0.0, 0.1) for _ in range(40)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    out = calibration_report(df, "y", ["x1", "x2"], bins=10, iterations=5, lr=2.0).collect()
    assert sum(r.n for r in out) == 80
    for r in out:
        assert 0.0 <= r.confidence <= 1.0 and 0.0 <= r.accuracy <= 1.0
        assert r.gap == round(abs(r.accuracy - r.confidence) + 1e-9, 6)
    ece = round(sum(r.n * r.gap for r in out) / sum(r.n for r in out) + 1e-9, 6)
    assert all(r.ece == ece for r in out)
    # the two pure classes land in different bins with matching accuracy
    by_acc = {r.accuracy for r in out}
    assert 1.0 in by_acc and 0.0 in by_acc


def test_label_propagation_hand_computed(spark):
    """Barbell graph (two triangles joined by one bridge edge): the
    expected labels come from a 10-line pure-python replay of the SAME
    rule (synchronous neighbor majority, ties to the smallest label) —
    the operator must match it round for round, and the two triangle
    cores must land in different communities."""
    from market_data_pipeline_spark.operators.graph import label_propagation

    raw = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    edges = spark.createDataFrame(raw, "src long, dst long")

    adj = {}
    for a, b in raw:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lbl = {n: n for n in adj}
    for _ in range(5):
        new = {}
        for n, nbrs in adj.items():
            counts = {}
            for v in nbrs:
                counts[lbl[v]] = counts.get(lbl[v], 0) + 1
            new[n] = min(counts, key=lambda c: (-counts[c], c))
        lbl = new

    got = {
        r.node: r.community
        for r in label_propagation(edges, iterations=5).collect()
    }
    assert got == lbl
    assert len({got[n] for n in (1, 2)} & {got[n] for n in (5, 6)}) == 0
