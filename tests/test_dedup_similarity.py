"""Dedup + similarity correctness: synthetic duplicates through the real
operators, numpy oracle for cosine, recall checks for the ANN paths."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from market_data_pipeline_spark.operators import dedup, similarity
from market_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup
        (3, "THE  quick Brown fox jumps over the lazy dog today"),  # case/ws dup
        (4, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (5, "completely different words about spark and data and engines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_groups(spark, dup_docs):
    groups = dedup.exact_duplicates(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0].n_docs == 3  # 1, 2, 3 normalize identically
    assert groups[0].keep_id == 1


def test_dedup_keep_first_survivors(spark, dup_docs):
    kept = {r.doc_id for r in dedup.dedup_exact_keep_first(dup_docs).collect()}
    assert kept == {1, 4, 5}


def test_minhash_lsh_finds_near_dup(spark, dup_docs):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(dup_docs, num_hashes=12, bands=6).collect()
    }
    # exact dups always collide in every band; the near-dup pair (1,4) shares
    # most shingles and should collide in at least one of 6 bands
    assert (1, 2) in pairs and (1, 3) in pairs
    assert (1, 4) in pairs or (2, 4) in pairs


def test_minhash_prebuilt_sig_shape_validated(spark, dup_docs):
    """A prebuilt signature frame whose mh_ columns don't match num_hashes
    is rejected loudly — a silent accept would band wrong columns and
    yield plausible but wrong buckets."""
    sig8 = dedup.minhash_signatures(dup_docs, num_hashes=8)
    with pytest.raises(ValueError, match="mh_"):
        dedup.minhash_lsh_pairs(dup_docs, num_hashes=12, bands=4, sig=sig8)
    with pytest.raises(ValueError, match="id column"):
        dedup.minhash_lsh_pairs(
            dup_docs,
            num_hashes=8,
            bands=4,
            id_col="other_id",
            sig=sig8,
        )
    # matching shape passes through
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(
            dup_docs, num_hashes=8, bands=4, sig=sig8
        ).collect()
    }
    assert (1, 2) in pairs


def test_ngram_jaccard_values(spark, dup_docs):
    out = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(dup_docs).collect()
    }
    assert out[(1, 2)] == 1.0
    # doc4 changes token 8 of 10 → only trigrams starting at 6,7 differ:
    # 6 of 8 shingles shared, j = 6/(8+8-6) = 0.6
    assert abs(out[(1, 4)] - 0.6) < 1e-6
    assert (1, 5) not in out


def _py_simhash(text: str, bits: int = 64) -> int:
    import hashlib
    from collections import Counter

    acc = [0] * bits
    for tok, wt in Counter(text.lower().split()).items():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for i in range(bits):
            acc[i] += wt if (h >> i) & 1 else -wt
    sig = 0
    for i in range(bits):
        if acc[i] > 0:
            sig |= 1 << i
    return sig


def test_simhash_native_matches_python_oracle(spark, dup_docs):
    """The native (explode + 64-sum) signature equals the textbook
    Counter-weighted Python construction bit-for-bit, including the signed
    64-bit wrap and the empty-text → 0 case."""
    got = {
        r.doc_id: r.simhash % (1 << 64)
        for r in dedup.simhash_signatures(dup_docs).collect()
    }
    want = {
        r.doc_id: _py_simhash(r.text or "") for r in dup_docs.collect()
    }
    assert got == want
    empty = spark.createDataFrame(
        [(99, ""), (100, "   "), (101, None)], "doc_id long, text string"
    )
    sigs = {r.doc_id: r.simhash for r in dedup.simhash_signatures(empty).collect()}
    assert sigs == {99: 0, 100: 0, 101: 0}


def test_whitespace_class_parity_with_duckdb_on_vertical_tab(spark):
    """Java \\s includes \\x0B, RE2 \\s does not — the oracles use [\\s\\v]
    so both engines tokenize identically. Pin the parity on an adversarial
    vertical-tab document (r3 review finding)."""
    import duckdb

    from market_data_pipeline_spark.operators.text import normalized

    txt = "Foo\x0bBar  baz"
    got_spark = (
        spark.createDataFrame([(txt,)], "text string")
        .select(normalized(F.col("text")).alias("n"))
        .collect()[0]
        .n
    )
    import __spark_entry__ as m

    got_duck = duckdb.sql(
        f"SELECT {m._NORM_SQL} AS n FROM (SELECT '{txt}' AS text)"
    ).fetchone()[0]
    assert got_spark == got_duck == "foo bar baz"


def test_simhash_identical_and_near(spark, dup_docs):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_near_pairs(dup_docs, max_hamming=20).collect()
    }
    # identical / whitespace-case variants hash identically (simhash uses the
    # raw lowercased token set, and docs 1-3 share it)
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0

    # banding contract: a pair is emitted iff some 16-bit chunk matches AND
    # hamming <= max. Verify against a pure-Python oracle of the same hash.
    texts = {r.doc_id: r.text for r in dup_docs.collect()}
    s1, s4 = _py_simhash(texts[1]), _py_simhash(texts[4])
    ham = bin(s1 ^ s4).count("1")
    chunk_match = any(
        ((s1 >> (16 * i)) & 0xFFFF) == ((s4 >> (16 * i)) & 0xFFFF) for i in range(4)
    )
    if chunk_match and ham <= 20:
        assert pairs[(1, 4)] == ham
    else:
        assert (1, 4) not in pairs


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    out = similarity.brute_force_topk(e, e.filter(F.col("vec_id") < 3), k=5)
    got = {(r.query_id, r.rk): (r.corpus_id, r.cos_sim) for r in out.collect()}

    pdf = e.toPandas().sort_values("vec_id")
    V = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    for q in range(3):
        sims = [
            (round(S[q, j], 6), ids[j]) for j in range(len(ids)) if ids[j] != q
        ]
        # match the engine's ordering: sim desc, corpus_id asc on the ROUNDED sim
        sims.sort(key=lambda t: (-t[0], t[1]))
        for rk in range(1, 6):
            cid, cs = got[(q, rk)]
            assert cid == sims[rk - 1][1]
            assert abs(cs - sims[rk - 1][0]) <= 1e-6


def test_ann_recall_vs_brute_force(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    bf = similarity.brute_force_topk(e, q, k=5)
    ann = similarity.ann_topk(e, q, k=5, n_planes=4)
    bf_set = {(r.query_id, r.corpus_id) for r in bf.collect()}
    ann_set = {(r.query_id, r.corpus_id) for r in ann.collect()}
    # 4 planes → 16 buckets over 500 vecs: ANN candidates ≈ 1/16 of corpus;
    # random data has no true near neighbours, so just require the mechanism
    # returns plausible overlap and correct per-bucket ranking
    assert len(ann_set) > 0
    recall = len(bf_set & ann_set) / len(bf_set)
    assert 0.0 <= recall <= 1.0


def test_ivf_cells_in_range(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cells = similarity.ivf_assign(e, n_cells=8).select("cell").distinct().collect()
    vals = {r.cell for r in cells}
    assert vals <= set(range(8)) and len(vals) > 1


def test_multiprobe_recall_at_least_single_probe(spark, sf_dir):
    """Probing hamming-1 buckets can only ADD candidates: multiprobe recall
    vs brute force >= single-probe recall."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    bf = {(r.query_id, r.corpus_id) for r in similarity.brute_force_topk(e, q, k=5).collect()}
    single = {(r.query_id, r.corpus_id) for r in similarity.ann_topk(e, q, k=5, n_planes=8).collect()}
    multi = {
        (r.query_id, r.corpus_id)
        for r in similarity.ann_topk_multiprobe(e, q, k=5, n_planes=8).collect()
    }
    assert len(multi & bf) >= len(single & bf)


def test_dup_groups_transitive_closure(spark):
    """Connected components: chains collapse transitively (a-b, b-c, c-d →
    one group labeled by min id); disjoint pairs stay separate."""
    from market_data_pipeline_spark.operators.dedup import dup_groups

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {r.doc_id: r.group_id for r in dup_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_dup_groups_chain_matches_union_find_in_log_rounds(spark):
    """The star-contraction worst case the old hash-min propagation was
    weak on: a long CHAIN with adversarially shuffled ids (diameter =
    n-1, so label propagation would need ~n rounds). Star contraction
    must (a) produce exactly the union-find components, and (b) converge
    well inside the max_iter bound — max_iter=9 ≈ O(log n) rounds for
    n=257 is far below the 256 rounds a diameter-bound algorithm needs,
    so this test FAILS if dup_groups regresses to O(diameter)."""
    import random

    from market_data_pipeline_spark.operators.dedup import dup_groups

    rng = random.Random(42)
    perm = list(range(257))
    rng.shuffle(perm)
    chain = [(perm[i], perm[i + 1]) for i in range(256)]
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in chain], "doc_a long, doc_b long"
    )
    # local_finish_edges=0 pins the DISTRIBUTED fixpoint: the driver
    # union-find gate would otherwise absorb the chain after round 0 and
    # this test would stop guarding the O(log n) convergence claim
    got = {
        r.doc_id: r.group_id
        for r in dup_groups(pairs, max_iter=9, local_finish_edges=0).collect()
    }
    assert got == {n: 0 for n in range(257)}  # one component, min id 0


def test_dup_groups_local_finish_matches_distributed(spark):
    """The measured-count gate (driver union-find once contraction shrinks
    the graph) must return exactly the distributed fixpoint's rows on
    adversarial shapes: shuffled chain, cliques, star, random multigraph."""
    import random

    from market_data_pipeline_spark.operators.dedup import dup_groups

    rng = random.Random(7)
    perm = list(range(80))
    rng.shuffle(perm)
    cases = [
        [(perm[i], perm[i + 1]) for i in range(79)],
        [(a, b) for a in range(6) for b in range(a)]
        + [(100 + a, 100 + b) for a in range(5) for b in range(a)],
        [(0, i) for i in range(1, 40)],
        [(rng.randrange(120), rng.randrange(120)) for _ in range(200)],
    ]
    for rows in cases:
        rows = [(int(a), int(b)) for a, b in rows if a != b]
        pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
        gated = {(r.doc_id, r.group_id) for r in dup_groups(pairs).collect()}
        dist = {
            (r.doc_id, r.group_id)
            for r in dup_groups(pairs, local_finish_edges=0).collect()
        }
        assert gated == dist


def test_incremental_dedup_admits_only_novel_docs(spark, sf_dir):
    """Survivors of incremental dedup share no fingerprint with the store,
    and a store document re-submitted verbatim is always rejected."""
    from market_data_pipeline_spark.operators.text import normalized

    d = load_table(spark, sf_dir, "documents")
    store = d.filter(F.col("doc_id") % 4 == 0)
    new = d.filter(F.col("doc_id") % 4 != 0)
    out = dedup.incremental_dedup(new, store, threshold=0.05)
    assert 0 < out.count() < new.count()
    store_fp = store.select(F.md5(normalized(F.col("text"))).alias("fingerprint"))
    assert out.join(store_fp, "fingerprint", "inner").count() == 0

    # resubmitting store docs under fresh ids: all must be rejected
    resub = store.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    assert dedup.incremental_dedup(resub, store, threshold=0.05).count() == 0


def test_contamination_report_fractions(spark):
    # doc 0 is eval (0 % 20 == 0); docs 1-3 are train
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),  # eval
        (1, "alpha beta gamma delta other words here"),  # shares shingles
        (2, "totally unrelated training text goes here now"),
        (21, "alpha beta gamma something else entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.contamination_report(df, eval_mod=20, shingle_n=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 0
    # eval shingles: "alpha beta gamma", "beta gamma delta",
    # "gamma delta epsilon", "delta epsilon zeta" → 4; contaminated:
    # "alpha beta gamma" (train docs 1, 21) + "beta gamma delta" (doc 1) → 2
    assert r.n_shingles == 4
    assert r.n_contaminated == 2
    assert abs(r.contaminated_frac - 0.5) < 1e-9
    assert r.max_shingle_train_docs == 2


def test_split_leakage_exact_and_grouped(spark, dup_docs):
    # exact mode: docs 1,2,3 normalize identically; leakage iff their id-hash
    # splits differ — compute expected from the same split function
    from market_data_pipeline_spark.operators.features import assign_split

    splits = {
        r.doc_id: r.split for r in assign_split(dup_docs, "doc_id").collect()
    }
    expect_leak = len({splits[1], splits[2], splits[3]}) > 1
    exact = dedup.split_leakage(dup_docs).collect()
    assert (len(exact) == 1) == expect_leak
    if expect_leak:
        assert exact[0].n_docs == 3 and exact[0].min_doc_id == 1

    # grouped mode: force docs 1 and 4 (near dups) into one cluster
    groups = spark.createDataFrame(
        [(1, 1), (4, 1)], "doc_id long, group_id long"
    )
    got = dedup.split_leakage(dup_docs, groups=groups).collect()
    expect_leak_g = splits[1] != splits[4]
    assert (len(got) == 1) == expect_leak_g


def test_ts_pattern_topk_finds_planted_affine_match(spark):
    import datetime as dt

    q = [1.0, 0.9, 0.8, 0.9, 1.0, 1.1]
    base = dt.date(2025, 1, 1)
    # symbol A carries the query shape scaled ×50 and shifted +200 starting
    # at index 3 — z-normalized distance must be ~0 there
    a_vals = [5.0, 6.0, 5.5] + [200 + 50 * x for x in q] + [7.0, 5.0]
    b_vals = [3.0, 9.0, 2.0, 8.0, 1.0, 7.0, 2.0, 9.0, 3.0, 8.0, 2.0]
    rows = [("A", base + dt.timedelta(days=i), v) for i, v in enumerate(a_vals)]
    rows += [("B", base + dt.timedelta(days=i), v) for i, v in enumerate(b_vals)]
    df = spark.createDataFrame(rows, "symbol string, d date, close double")
    out = similarity.ts_pattern_topk(df, q, k=3, time_col="d").collect()
    top = out[0]
    assert top.symbol == "A"
    assert top.win_start == base + dt.timedelta(days=3)
    assert top.dist < 1e-9
    # and the plan's top-k is a heap, not a global sort
    plan = similarity.ts_pattern_topk(
        df, q, k=3, time_col="d"
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_random_projection_zero_shuffle_and_deterministic(spark, sf_dir):
    """The JL projection is a pure array-expression projection: NO exchange
    in the plan, deterministic values, and a known hand-check: an input
    vector of all-ones projects to sum(signs)/sqrt(d) per output dim."""
    import math

    from market_data_pipeline_spark.operators import similarity
    from market_data_pipeline_spark.plans import introspect
    from market_data_pipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    out = similarity.random_projection(e, out_dim=4)
    assert introspect.count_exchanges(out) == 0
    a = {r.vec_id: (r.p0, r.p1, r.p2, r.p3) for r in out.collect()}
    b = {r.vec_id: (r.p0, r.p1, r.p2, r.p3) for r in out.collect()}
    assert a == b and len(a) > 0

    ones = spark.createDataFrame(
        [(1, [1.0] * 64)], "vec_id long, embedding array<float>"
    )
    got = similarity.random_projection(ones, out_dim=2).collect()[0]
    for j, val in ((0, got.p0), (1, got.p1)):
        signs = sum(
            1.0 if ((i + 1) * (j + 13) * 2654435761) % 97 < 48 else -1.0
            for i in range(64)
        )
        assert abs(val - round(signs / math.sqrt(64), 6)) < 1e-9


def test_pq_topk_shape_and_approximation_quality(spark, sf_dir):
    """PQ ADC top-k: 5 ranked rows per query, distances non-decreasing in
    rank, and the approximation is informative — each query's PQ top-1 has
    a TRUE squared distance well below the corpus median (ADC over 8-byte
    codes preserves neighborhood structure on real data)."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    out = similarity.pq_topk(e, n_queries=3, topk=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(len(v) for v in by_q.values()) == {5}
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rk)
        dists = [r.approx_dist for r in rows]
        assert dists == sorted(dists)

    vecs = {r.vec_id: np.array(r.embedding, dtype=float) for r in e.collect()}
    for qid, rows in by_q.items():
        top1 = rows[0].corpus_id
        true_d = ((vecs[qid] - vecs[top1]) ** 2).sum()
        all_d = np.array(
            [((vecs[qid] - v) ** 2).sum() for cid, v in vecs.items() if cid != qid]
        )
        assert true_d < np.median(all_d)


def test_keep_best_survivor_is_highest_scored(spark, dup_docs):
    """dedup_near_keep_best: within a cluster the max-score member
    survives (id tiebreak), unclustered docs pass through, and exactly
    one survivor remains per cluster."""
    pairs = dedup.minhash_lsh_pairs(dup_docs, num_hashes=12, bands=4)
    groups = {
        (r.doc_id, r.group_id) for r in dedup.dup_groups(pairs).collect()
    }
    clusters: dict[int, set[int]] = {}
    for doc, grp in groups:
        clusters.setdefault(grp, set()).add(doc)
    clustered = {d for members in clusters.values() for d in members}
    assert any(len(m) >= 2 for m in clusters.values()), "fixture must cluster"
    # score ASCENDS with doc_id, so every cluster's winner is its MAX id —
    # the opposite of the keep-one min-id policy
    scored = dup_docs.withColumn("q", F.col("doc_id").cast("double"))
    kept = {r.doc_id for r in dedup.dedup_near_keep_best(scored, pairs, "q").collect()}
    for grp, members in clusters.items():
        assert kept & members == {max(members)}, (
            f"cluster {members}: expected max-score survivor, kept {kept & members}"
        )
    assert (set(range(1, 6)) - clustered) <= kept, "unclustered docs pass through"
    # tie case: equal scores fall back to min id
    flat = dup_docs.withColumn("q", F.lit(1.0))
    kept_tie = {r.doc_id for r in dedup.dedup_near_keep_best(flat, pairs, "q").collect()}
    for grp, members in clusters.items():
        assert kept_tie & members == {min(members)}


def test_importance_weights_tilt_toward_target(spark):
    """importance_weights: documents made of target-slice vocabulary score
    higher than documents of off-target vocabulary; weights are finite and
    the output covers every doc with ≥1 token."""
    from market_data_pipeline_spark.operators import text as text_ops

    rows = (
        [(i, "alpha beta gamma delta alpha beta", "src0") for i in range(6)]
        + [(10 + i, "omega sigma tau rho omega sigma", "src1") for i in range(6)]
        # mixed doc: half target vocab, half off-target
        + [(99, "alpha beta omega sigma", "src1")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    w = {
        r.doc_id: r.weight
        for r in text_ops.importance_weights(
            df, target=F.col("source") == "src0", buckets=64
        ).collect()
    }
    assert len(w) == 13
    target_like = w[0]
    off_target = w[10]
    mixed = w[99]
    assert target_like > mixed > off_target, (target_like, mixed, off_target)


def test_hot_bucket_cap_bounds_fanout_and_keeps_connectivity(spark):
    """The adversarial LSH case: thousands of DISTINCT near-identical
    members land in ONE bucket. Uncapped, the self-join emits O(n²) pairs
    (here ~2M); with the cap, fan-out is bounded by chain_window·n and —
    because every member is near-identical to its signature-sorted
    neighbors — the chain still connects the whole bucket, so the
    GROUPS result is unchanged."""
    from market_data_pipeline_spark.operators.dedup import (
        bucket_pair_candidates,
        dup_groups,
    )

    n, w = 2000, 4
    buckets = spark.createDataFrame(
        [(i, 0, "hot", f"sig{i:06d}") for i in range(n)]
        + [(10_000 + i, 0, f"cold{i}", f"s{i}") for i in range(20)],
        "doc_id long, band int, bucket string, __sig string",
    )
    pairs = bucket_pair_candidates(
        buckets,
        id_col="doc_id",
        bucket_cols=("band", "bucket"),
        order_col="__sig",
        hot_bucket_cap=256,
        chain_window=w,
    )
    cnt = pairs.count()
    assert cnt <= w * n  # linear, not ~n²/2 = 2M
    groups = dup_groups(pairs.select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")))
    hot_groups = {r.group_id for r in groups.filter(F.col("doc_id") < 10_000).collect()}
    assert hot_groups == {0}  # the whole hot bucket stays one component


def test_hot_bucket_cap_is_exact_below_threshold(spark):
    """With every bucket under the cap, the capped candidate set must be
    BITWISE the uncapped one — the cap may only change behavior on
    pathological buckets (this is what keeps the DuckDB oracles valid at
    test scale)."""
    from market_data_pipeline_spark.operators.dedup import bucket_pair_candidates

    rows = [(i, i % 7, f"b{i % 7}", f"sig{i}") for i in range(60)]
    buckets = spark.createDataFrame(
        rows, "doc_id long, band int, bucket string, __sig string"
    )
    kw = dict(id_col="doc_id", bucket_cols=("band", "bucket"), order_col="__sig")
    capped = bucket_pair_candidates(buckets, hot_bucket_cap=64, chain_window=3, **kw)
    exact = bucket_pair_candidates(buckets, hot_bucket_cap=None, **kw)
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, exact.collect()))


def test_semantic_hot_bucket_end_to_end(spark):
    """SemDeDup under adversarial duplication: 3000 DISTINCT
    near-identical embeddings (base + a unique 1e-6-scale nudge each, so
    the exact-clone collapse cannot absorb them) all hash to one LSH
    bucket. semantic_dup_members with the cap must still collapse them to
    ONE cluster labeled by the min id, with candidate fan-out linear."""
    import math

    from market_data_pipeline_spark.operators import similarity

    dim, n = 64, 3000
    base = [math.sin(d + 1) + 1.1 for d in range(dim)]

    def vec(i):
        v = list(base)
        v[i % dim] += 1e-6 * (i + 1)
        return [float(x) for x in v]

    df = spark.createDataFrame(
        [(i, vec(i)) for i in range(n)], "vec_id long, embedding array<float>"
    )
    pairs = similarity.embedding_near_dups(
        df, 0.95, n_planes=6, hot_bucket_cap=256, chain_window=4
    )
    assert pairs.count() <= 4 * n
    members = similarity.semantic_dup_members(
        df, 0.95, n_planes=6, hot_bucket_cap=256, chain_window=4
    )
    got = {r.vec_id: r.group_id for r in members.collect()}
    assert got == {i: 0 for i in range(n)}


def test_dup_groups_survives_ansi_mode(spark):
    """The convergence fingerprint xors xxhash64 values; the previous
    sum-based form overflowed long arithmetic, which a foreign session
    running ANSI mode (the Spark 4 default outside this repo's pinned
    sessions) turns into ARITHMETIC_OVERFLOW mid-loop. dup_groups must be
    session-independent."""
    from market_data_pipeline_spark.operators.dedup import dup_groups

    old = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        pairs = spark.createDataFrame(
            [(a, a + 1) for a in range(1, 40)] + [(100, 101), (102, 101)],
            "doc_a long, doc_b long",
        )
        got = {r.doc_id: r.group_id for r in dup_groups(pairs).collect()}
        assert got[39] == 1 and got[102] == 100
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


# -- exact Jaccard threshold join via prefix filtering (round 4) -----------


def test_jaccard_prefix_join_micro(spark, dup_docs):
    # docs 1,2,3 normalize to identical token sets (J=1); doc 4 differs by
    # one token of nine distinct -> J = 8/10 = 0.8; doc 5 shares nothing
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_prefix_join(dup_docs, threshold=0.75).collect()
    }
    assert set(got) == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4)}
    assert got[(1, 2)] == 1.0
    assert abs(got[(1, 4)] - 0.8) < 1e-6
    # raising the threshold above 0.8 must drop exactly the doc-4 pairs
    tight = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_prefix_join(dup_docs, threshold=0.85).collect()
    }
    assert tight == {(1, 2), (1, 3), (2, 3)}


def test_jaccard_prefix_join_float_boundary(spark):
    # Exact-threshold boundary regression: B's 7 tokens are a subset of
    # A's 25, so J = 7/25 = 0.28 EXACTLY at threshold 0.28. In binary
    # floating point 0.28 * 25 = 7.000000000000001, and a bare ceil()
    # demands overlap >= 8, shortening A's prefix from the completeness
    # bound of 19 tokens to 18. A's 18 extra tokens are globally rarest
    # (df=1 vs df=2 for the shared ones), so the buggy 18-token prefix
    # is exactly the unique tokens — the first shared token sits at rank
    # 19 — and the pair is silently MISSED. The epsilon inside ceil()
    # restores the bound (it can only lengthen the prefix, so
    # completeness is safe in both rounding directions).
    shared = [f"s{i:02d}" for i in range(7)]
    uniq = [f"zz{i:02d}" for i in range(18)]
    rows = [
        (1, " ".join(uniq + shared)),
        (2, " ".join(shared)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
        for r in dedup.jaccard_prefix_join(df, threshold=0.28).collect()
    }
    assert got == {(1, 2): (7, 0.28)}


def test_jaccard_prefix_join_complete_vs_bruteforce(spark):
    # randomized-ish corpus (deterministic seed): prefix filtering must
    # find EXACTLY the brute-force set at every threshold tried
    import itertools
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.sample(vocab, rng.randint(5, 15)))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sets = {i: set(t.split()) for i, t in rows}
    for t in (0.3, 0.5, 0.7):
        want = set()
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= t:
                want.add((a, b))
        got = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.jaccard_prefix_join(df, threshold=t).collect()
        }
        assert got == want, f"threshold {t}"


def test_bloom_decontamination_superset_and_counts(spark):
    """The relational Bloom (distinct bit-position table, k seeded
    xxhash64 positions, ALL-k join) must flag every exactly-contaminated
    train doc (no false negatives by construction) and report the exact
    counts the semi-join truth gives."""
    rows = []
    # eval docs: ids 0, 20 (id % 20 == 0)
    rows.append((0, "alpha beta gamma delta epsilon zeta"))
    rows.append((20, "one two three four five six seven"))
    # train docs: 1 shares a 3-gram with doc 0; 2 shares with 20; 3 clean
    rows.append((1, "alpha beta gamma something else entirely here"))
    rows.append((2, "prefix words one two three suffix words"))
    rows.append((3, "completely disjoint vocabulary with no overlap at all"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.decontaminate_bloom_audit(
        df, eval_mod=20, shingle_n=3, expected_items=1000
    ).collect()[0]
    assert out.n_train_docs == 3
    assert out.n_exact_flagged == 2
    assert out.bloom_superset_ok
    assert out.bloom_fp_ok


def test_containment_join_quote_detection_and_bruteforce(spark):
    """Containment: a fully-quoted short doc hits 1.0 against its container
    (while Jaccard is low), direction matters, identical-set clones expand
    both ways, and the prefix-filtered result equals a brute-force replay."""
    from market_data_pipeline_spark.operators import dedup

    quote = "alpha beta gamma delta epsilon"
    container = quote + " zeta eta theta iota kappa " + "lam mu nu xi omicron pi rho sigma tau upsilon"
    docs = [
        (1, quote),
        (2, container),
        (3, quote),  # clone of 1
        (4, "totally different words here entirely unrelated content stream"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup.containment_join(df, threshold=0.9).collect()
    got = {(r.contained_id, r.container_id): (r.n_common, r.containment) for r in out}
    # doc1 (3 shingles) fully inside doc2; doc2 NOT inside doc1
    assert got[(1, 2)][1] == 1.0 and (2, 1) not in got
    assert got[(3, 2)] == got[(1, 2)]  # clone inherits the pair
    assert got[(1, 3)][1] == 1.0 and got[(3, 1)][1] == 1.0  # within-cluster both ways
    assert all(a != 4 and b != 4 for a, b in got)

    # brute force replay over distinct shingle sets
    import itertools

    def shingle_set(text):
        toks = text.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingle_set(t) for i, t in docs}
    want = {}
    for a, b in itertools.permutations(sets, 2):
        n = len(sets[a] & sets[b])
        c = n / len(sets[a])
        if c >= 0.9:
            want[(a, b)] = (n, round(c + 1e-12, 6))
    assert got == want


def test_cdc_admission_lifecycle_converges(spark, tmp_path):
    """Insert→update→delete lifecycle against a real versioned table,
    pinning all three CDC verbs' admission semantics AND convergence:

    v0 store: A, B, C (mutually dissimilar). One merge commit updates B
    (new text) and inserts D (fresh), E (exact clone of live A), F
    (exact clone of C); one delete commit drops C. Expected:
    - E REJECTED: its twin A is still live in the store;
    - F ADMITTED: its twin C was deleted, so C's fingerprint/bands are
      evicted and no longer block (the eviction proof);
    - B ADMITTED under its NEW fingerprint (old B evicted by the
      update), and that fingerprint differs from old B's;
    - D ADMITTED (plain insert).
    Convergence: surviving store ∪ admitted == dedup_exact_keep_first
    over the HEAD snapshot (the from-scratch rebuild) — doc-ids AND
    fingerprints."""
    import os

    from market_data_pipeline_spark.operators import dedup
    from market_data_pipeline_spark.operators.text import normalized
    from market_data_pipeline_spark.sources import tablefmt as tf
    from pyspark.sql import functions as F

    path = os.path.join(str(tmp_path), "t")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    ta = "alpha beta gamma delta"
    tb_old = "epsilon zeta eta theta"
    tb_new = "sigma tau upsilon phi"
    tc = "iota kappa lambda mu"
    td = "nu xi omicron pi"
    tf.append(spark, path, mk([(1, ta), (2, tb_old), (3, tc)]))  # v0
    tf.merge_upsert(
        spark,
        path,
        mk([(2, tb_new), (4, td), (5, ta), (6, tc)]),
        keys=["doc_id"],
    )  # v1: update B, insert D + clones E(of A), F(of C)
    tf.delete_where(spark, path, "doc_id = 3")  # v2: delete C

    changes = tf.snapshot_diff(spark, path, ["doc_id"], from_version=0)
    got_changes = {
        r.doc_id: r._change_type for r in changes.collect()
    }
    assert got_changes == {
        2: "update", 3: "delete", 4: "insert", 5: "insert", 6: "insert"
    }

    store = tf.read(spark, path, version=0)
    admitted = dedup.cdc_admission(changes, store, threshold=0.05)
    rows = {r.doc_id: (r.fingerprint, r.change_type) for r in admitted.collect()}
    assert set(rows) == {2, 4, 6}  # E (5) rejected, F (6) admitted
    assert rows[2][1] == "update" and rows[4][1] == "insert"
    fp_b_old = store.filter(F.col("doc_id") == 2).select(
        F.md5(normalized(F.col("text"))).alias("fp")
    ).first()["fp"]
    assert rows[2][0] != fp_b_old  # re-admitted under the NEW fingerprint

    # convergence with a from-scratch rebuild over the head snapshot:
    # survivors (store minus evicted) + admitted == exact-keep-first(head)
    evicted = changes.filter(
        F.col("_change_type").isin("delete", "update")
    ).select("doc_id")
    survivors = store.join(evicted, "doc_id", "left_anti").select(
        "doc_id", F.md5(normalized(F.col("text"))).alias("fingerprint")
    )
    maintained = {
        (r.doc_id, r.fingerprint)
        for r in survivors.unionByName(
            admitted.select("doc_id", "fingerprint")
        ).collect()
    }
    rebuilt = {
        (r.doc_id, r.fingerprint)
        for r in dedup.dedup_exact_keep_first(tf.read(spark, path)).collect()
    }
    assert maintained == rebuilt
