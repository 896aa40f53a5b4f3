"""Contracts for the behavior-analytics (funnel/retention) and TF-IDF
operators. Value-level parity is the DuckDB oracle's job; these pin the
structural invariants that survive any data."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_data_pipeline_spark.operators import behavior, text
from market_data_pipeline_spark.sources.tables import load_table


def test_funnel_counts_monotone_nonincreasing(spark, sf_dir):
    rows = behavior.conversion_funnel(spark, sf_dir).orderBy("stage").collect()
    counts = [r.n_users for r in rows]
    assert len(counts) == 3
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > 0


def test_funnel_respects_event_order(spark, sf_dir):
    """A user whose only purchase precedes every click must not convert."""
    ev = load_table(spark, sf_dir, "events")
    # stage counts can never exceed the distinct users holding that event type
    per_type = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    rows = {r.stage: r.n_users for r in behavior.conversion_funnel(spark, sf_dir).collect()}
    assert rows["2_click"] <= per_type["click"]
    assert rows["3_purchase"] <= per_type["purchase"]


def test_retention_day_zero_covers_all_users(spark, sf_dir):
    ret = behavior.retention_cohorts(spark, sf_dir)
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    day0 = ret.filter(F.col("day_offset") == 0).agg(F.sum("active_users")).collect()[0][0]
    # every user is active on their own cohort day
    assert day0 == n_users
    assert ret.filter(F.col("day_offset") < 0).count() == 0


def test_tfidf_rank_and_bounds(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = text.tfidf_top_terms(d, k=3)
    assert out.filter((F.col("rk") < 1) | (F.col("rk") > 3)).count() == 0
    # a term present in every doc gets idf==1 -> tfidf == tf
    assert out.filter(F.col("tfidf") < 0).count() == 0
    per_doc = out.groupBy("doc_id").count()
    assert per_doc.filter(F.col("count") > 3).count() == 0


def test_chunking_covers_every_token_with_correct_overlap(spark, sf_dir):
    """Chunking invariants: reconstructing token positions from (chunk_id,
    n_tokens) covers [1, n] with no gaps; short docs yield exactly 1 chunk."""
    d = load_table(spark, sf_dir, "documents")
    size, stride = 64, 32
    chunks = text.chunk_documents(d, size=size, stride=stride)
    stats = (
        chunks.groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_id") * stride + F.col("n_tokens")).alias("max_covered"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.min("n_tokens").alias("min_chunk"),
        )
        .join(
            d.select("doc_id", F.size(text.tokens(F.col("text"))).alias("n_toks")), "doc_id"
        )
    )
    # the furthest-covered position is exactly the token count
    assert stats.filter(F.col("max_covered") != F.col("n_toks")).count() == 0
    # stride < size -> consecutive chunks overlap; every chunk non-empty
    assert stats.filter(F.col("min_chunk") <= 0).count() == 0
    short = stats.filter(F.col("n_toks") <= size)
    assert short.filter(F.col("n_chunks") != 1).count() == 0


def test_redaction_leaves_no_pii_shapes(spark):
    rows = spark.createDataFrame(
        [
            (1, "mail me at john.doe+x@corp.example.org today"),
            (2, "call +84 90 555 123 4567 now"),
            (3, "acct 1234567 and short 12345 stays"),
            (4, "clean text with no pii at all"),
        ],
        "id int, text string",
    )
    out = {r["id"]: r["redacted"] for r in text.redact_pii(rows).collect()}
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "call <PHONE> now"
    assert out[3] == "acct <NUM> and short 12345 stays"  # 7 digits: too short for phone, long enough for NUM
    assert out[4] == "clean text with no pii at all"


def test_quantization_roundtrip_error_bounded(spark, sf_dir):
    """|x - q*scale| <= scale/2 per element -> the reconstructed sum is
    within n*scale/2; q values fit int8."""
    from market_data_pipeline_spark.operators import similarity

    e = load_table(spark, sf_dir, "embeddings")
    q = similarity.quantize_vectors(e)
    assert q.filter((F.col("q_max") > 127) | (F.col("q_min") < -127)).count() == 0
    joined = q.join(e, "vec_id").select(
        "vec_id",
        "scale",
        F.abs(
            F.col("q_sum") * F.col("scale")
            - F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, v: a + v.cast("double"))
        ).alias("err"),
        F.size("embedding").alias("dim"),
    )
    assert joined.filter(F.col("err") > F.col("dim") * F.col("scale") / 2 + 1e-9).count() == 0


def test_sessionize_gap_splits_and_rollup(spark):
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1, 9, 0, 0)
    rows = [
        # user 1: two events 10 min apart (one session), then a 31-min gap
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(minutes=10), 2.0),
        (1, t0 + dt.timedelta(minutes=41), 4.0),
        # user 2: single event
        (2, t0, 8.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.session_seq): r
        for r in behavior.sessionize(df, gap_minutes=30).collect()
    }
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    s11 = got[(1, 1)]
    assert s11.n_events == 2 and s11.duration_s == 600
    assert abs(s11.total_value - 3.0) < 1e-9
    s12 = got[(1, 2)]
    assert s12.n_events == 1 and s12.duration_s == 0
    assert got[(2, 1)].n_events == 1


def test_boilerplate_ngrams_doc_frequency_not_term_frequency(spark):
    # "x y z" appears 3× inside doc 1 (repetition, DF=1) but the footer
    # "all rights reserved" appears once in each of 3 docs (DF=3)
    rows = [
        (1, "x y z x y z x y z all rights reserved"),
        (2, "some other content here all rights reserved"),
        (3, "unrelated body text too all rights reserved"),
        (4, "clean document with no shared chrome at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.ngram: r for r in text.boilerplate_ngrams(df, n=3, min_doc_frac=0.75).collect()}
    assert "all rights reserved" in out
    assert out["all rights reserved"].df_docs == 3
    assert abs(out["all rights reserved"].doc_frac - 0.75) < 1e-9
    assert "x y z" not in out  # repetition within one doc is NOT boilerplate


def test_bigram_lm_scores_hand_computed(spark):
    import math

    rows = [(1, "a b a b"), (2, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.bigram_lm_scores(df).collect()}
    # unigrams: a=3 b=2 c=1, V=3; bigrams: (a,b)=2 (b,a)=1 (a,c)=1
    # P(b|a)=(2+1)/(3+3)=.5  P(a|b)=(1+1)/(2+3)=.4  P(c|a)=(1+1)/(3+3)=1/3
    d1 = (math.log(0.5) + math.log(0.4) + math.log(0.5)) / 3
    d2 = math.log(1 / 3)
    assert out[1].n_bigrams == 3 and abs(out[1].avg_logprob - round(d1, 6)) < 1e-9
    assert out[2].n_bigrams == 1 and abs(out[2].avg_logprob - round(d2, 6)) < 1e-9


def test_mixture_plan_rates_and_epochs(spark):
    from market_data_pipeline_spark.operators import features

    rows = [(1, "s1", 100), (2, "s1", 100), (3, "s2", 1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = {
        r.source: r
        for r in features.mixture_plan(
            df, {"s1": 0.5, "s2": 0.5}, target_total_tokens=1000
        ).collect()
    }
    # s1: 200 tokens available, 500 target → rate 2.5 → 3 epochs
    assert out["s1"].target_tokens == 500
    assert abs(out["s1"].sample_rate - 2.5) < 1e-9 and out["s1"].epochs == 3
    # s2: 1000 available, 500 target → rate 0.5 → 1 epoch
    assert abs(out["s2"].sample_rate - 0.5) < 1e-9 and out["s2"].epochs == 1


def test_pack_sequences_invariants(spark, sf_dir):
    from market_data_pipeline_spark.operators import features

    d = text.add_token_stats(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens"
    )
    packed = features.pack_sequences(d, budget=256).collect()
    n_items = d.count()
    assert len(packed) == n_items  # every item exactly once
    assert len({r.doc_id for r in packed}) == n_items
    fills = {}
    for r in packed:
        if not r.oversize:
            fills[r.bin_id] = fills.get(r.bin_id, 0) + r.n_tokens
        else:
            assert r.n_tokens > 256
    assert all(f <= 256 for f in fills.values())
    # FFD within buckets keeps fill healthy: mean fill of closed bins ≥ 50%
    sizes = sorted(fills.values(), reverse=True)
    if len(sizes) > 2:
        assert sum(sizes[:-1]) / (256 * (len(sizes) - 1)) >= 0.5


def test_sessionize_without_value_column(spark):
    """ADVICE r1: behavior.sessionize on an input WITHOUT a value column
    must work (total_value omitted), instead of throwing on F.sum('value')."""
    import datetime as dt

    from market_data_pipeline_spark.operators import behavior

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t),
        (1, t + dt.timedelta(minutes=5)),
        (1, t + dt.timedelta(hours=2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = behavior.sessionize(df, gap_minutes=30).collect()
    assert "total_value" not in out[0].asDict()
    assert sorted((r.session_seq, r.n_events) for r in out) == [(1, 2), (2, 1)]
    # custom value column name flows into total_value
    df2 = spark.createDataFrame(
        [(1, t, 2.5), (1, t + dt.timedelta(minutes=1), 3.0)],
        "user_id long, ts timestamp, amount double",
    )
    out2 = behavior.sessionize(df2, gap_minutes=30, value_col="amount").collect()
    assert abs(out2[0].total_value - 5.5) < 1e-9


def test_pack_sequences_negative_ids(spark):
    """ADVICE r1: negative ids must hash to NON-negative buckets/bin ids
    (pmod, not signed %)."""
    from market_data_pipeline_spark.operators import features

    rows = [(-5, 100), (-4, 200), (-3, 250), (7, 60)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = features.pack_sequences(df, budget=256).collect()
    assert len(packed) == 4
    assert all(r.bin_id >= 0 for r in packed), "negative bin ids leaked"
    # per-bin fill never exceeds budget
    fills = {}
    for r in packed:
        fills[r.bin_id] = fills.get(r.bin_id, 0) + r.n_tokens
    assert all(f <= 256 for f in fills.values())


def test_mixture_plan_surfaces_missing_source(spark):
    """ADVICE r1: a source named in weights but absent from the data must
    produce an explicit zero-available row, not vanish."""
    from market_data_pipeline_spark.operators import features

    rows = [(1, "s1", 100), (2, "s1", 300)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = {
        r.source: r
        for r in features.mixture_plan(
            df, {"s1": 0.5, "s2_typo": 0.5}, target_total_tokens=1000
        ).collect()
    }
    assert set(out) == {"s1", "s2_typo"}
    ghost = out["s2_typo"]
    assert ghost.n_docs == 0 and ghost.available_tokens == 0
    assert ghost.target_tokens == 500 and ghost.sample_rate is None


def test_threshold_sweep_monotone_and_exact(spark):
    """Acceptance curves must be monotone non-increasing in the threshold,
    and exact on a hand-built frame."""
    rows = [(1, 10, 0.25), (2, 20, 0.55), (3, 30, 0.75), (4, 40, 0.95)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, quality_score double")
    out = {
        r.threshold: r
        for r in text.threshold_sweep(df, thresholds=(0.2, 0.5, 0.8)).collect()
    }
    assert out[0.2].n_docs_kept == 4 and out[0.2].tokens_kept == 100
    assert out[0.5].n_docs_kept == 3 and out[0.5].tokens_kept == 90
    assert out[0.8].n_docs_kept == 1 and out[0.8].tokens_kept == 40
    assert out[0.5].doc_keep_rate == 0.75 and out[0.8].token_keep_rate == 0.4
    kept = [out[t].n_docs_kept for t in (0.2, 0.5, 0.8)]
    assert kept == sorted(kept, reverse=True)


def test_line_dedup_drops_hot_lines_keeps_order(spark):
    """Lines in > max_doc_freq docs vanish (normalized matching: case and
    runs of spaces don't protect a line); unique lines survive in original
    order; a doc made ENTIRELY of boilerplate comes back empty, not
    missing."""
    from market_data_pipeline_spark.operators.text import line_dedup

    header = "SITE NAV | home | about"
    rows = [
        (1, f"{header}\nalpha body one\nbeta body two"),
        (2, f"{header}\ngamma body"),
        (3, f"site  nav | HOME | about\ndelta body"),  # normalizes to header
        (4, header),  # all-boilerplate doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in line_dedup(df, max_doc_freq=2).collect()}
    assert out[1].clean_text == "alpha body one\nbeta body two"
    assert (out[1].n_lines_kept, out[1].n_lines_dropped) == (2, 1)
    assert out[2].clean_text == "gamma body"
    assert out[3].clean_text == "delta body"
    assert out[4].clean_text == "" and out[4].n_lines_kept == 0
    assert out[4].n_lines_dropped == 1


def test_domain_stats_distinct_docs_vs_total_urls(spark):
    """domain_stats separates distinct-doc reach from raw URL frequency and
    handles docs with no URLs / repeated domains."""
    from market_data_pipeline_spark.operators.text import domain_stats

    rows = [
        (1, "see https://a.com/x and https://a.com/y plus http://b.org/z"),
        (2, "only https://a.com/other here"),
        (3, "no urls at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.domain: (r.n_docs, r.n_urls) for r in domain_stats(df).collect()}
    assert out == {"a.com": (2, 3), "b.org": (1, 1)}


def test_structural_rules_values(spark):
    """Hand-checked structural fractions on a crafted doc: 2 of 4 lines
    bulleted, 1 of 4 ends with ellipsis, symbol density from #/…"""
    from market_data_pipeline_spark.operators.text import add_structural_rules

    txt = "alpha beta 42\n- first item\n* second item\nwrapping up..."
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    r = add_structural_rules(df).collect()[0]
    # tokens: alpha beta 42 - first item * second item wrapping up... (11;
    # '42', '-', '*' carry no letter -> 8 alpha words)
    assert r.alpha_word_frac == round(8 / 11, 6)
    assert r.bullet_line_frac == 0.5
    assert r.ellipsis_line_frac == 0.25
    assert r.symbol_frac == 0.0
    empty = add_structural_rules(
        spark.createDataFrame([(2, "")], "doc_id long, text string")
    ).collect()[0]
    assert empty.mean_word_len == 0.0 and empty.bullet_line_frac == 0.0
    # CRLF text: Java's '$' would match before the trailing \r while RE2's
    # would not — the operator strips \r so both engines agree (r3 review)
    crlf = add_structural_rules(
        spark.createDataFrame(
            [(3, "first line...\r\nsecond line\r\n- third...")],
            "doc_id long, text string",
        )
    ).collect()[0]
    assert crlf.ellipsis_line_frac == round(2 / 3, 6)
    assert crlf.bullet_line_frac == round(1 / 3, 6)


def test_repeated_span_stats_micro(spark):
    """Hand-computed span dedup: docs 1 and 2 share one 8-token run
    ('a..h'); doc 3 is unique. Each sharer gets one island of 8 covered
    tokens; adjacent flagged windows would merge (gaps-and-islands)."""
    from market_data_pipeline_spark.operators.text import repeated_span_stats

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),          # shared run at pos 0
            (2, "x y a b c d e f g h z"),        # shared run at pos 2
            (3, "p q r s t u v w aa bb cc"),     # no cross-doc 8-gram
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repeated_span_stats(df, n=8, min_docs=2).collect()}
    assert rows[1].n_tokens == 10
    assert rows[1].dup_positions == 1 and rows[1].dup_islands == 1
    assert rows[1].covered_tokens == 8 and rows[1].coverage_pct == 0.8
    assert rows[2].covered_tokens == 8 and rows[2].coverage_pct == round(8 / 11, 4)
    assert rows[3].dup_positions == 0 and rows[3].coverage_pct == 0.0


def test_repeated_span_stats_island_merge(spark):
    """Overlapping flagged windows tile into ONE island: doc 4 and 5 share
    a 10-token run -> 3 flagged window starts (n=8) but a single merged
    interval covering all 10 tokens."""
    from market_data_pipeline_spark.operators.text import repeated_span_stats

    shared = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"
    df = spark.createDataFrame(
        [(4, shared + " tail4"), (5, "head5 " + shared)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repeated_span_stats(df, n=8, min_docs=2).collect()}
    # shared run gives window starts at 3 positions in each doc; the
    # cross-doc flagged set also includes runs shifted by the local
    # context only where the 8-gram is identical in BOTH docs
    assert rows[4].dup_islands == 1
    assert rows[4].covered_tokens == 10
    assert rows[5].dup_islands == 1
    assert rows[5].covered_tokens == 10


def test_excise_repeated_spans_micro(spark):
    """The excision policy cuts exactly the merged island and keeps the
    surroundings; untouched docs pass through verbatim (normalized)."""
    from market_data_pipeline_spark.operators.text import excise_repeated_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "x y a b c d e f g h z"),
            (3, "p q r s t u v w aa bb cc"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in excise_repeated_spans(df, n=8, min_docs=2).collect()}
    # doc 1: island [0, 8) removed -> "i j" remains
    assert rows[1].clean_text == "i j"
    assert rows[1].removed_tokens == 8 and rows[1].kept_tokens == 2
    # doc 2: island [2, 10) removed -> "x y" + trailing "z"
    assert rows[2].clean_text == "x y z"
    assert rows[2].removed_tokens == 8 and rows[2].kept_tokens == 3
    # doc 3: untouched
    assert rows[3].clean_text == "p q r s t u v w aa bb cc"
    assert rows[3].removed_tokens == 0


def test_bpe_train_sennrich_micro_case(spark):
    """Hand-computed merges for the classic Sennrich et al. 2016 vocabulary
    {low:5, lower:2, newest:6, widest:3} with </w> end-of-word symbols.
    Round 1 has a 3-way tie at count 9 ((e,s), (s,t), (t,</w>)) broken
    lexicographically; rounds 4-5 exercise a second tie and a merged
    symbol ('lo') pairing onwards."""
    wc = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, cnt long",
    )
    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in text.bpe_train(wc, num_merges=5).orderBy("step").collect()
    ]
    assert got == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "est", "</w>", "est</w>", 9),
        (4, "l", "o", "lo", 7),
        (5, "lo", "w", "low", 7),
    ]


def test_bpe_train_exhausted_vocabulary_stops_short(spark):
    """A vocabulary whose words fully merge before num_merges rounds just
    yields a shorter merge list — later rounds emit nothing."""
    wc = spark.createDataFrame([("ab", 4)], "word string, cnt long")
    got = [
        (r.step, r.merged)
        for r in text.bpe_train(wc, num_merges=6).orderBy("step").collect()
    ]
    # ab</w> needs exactly 2 merges: (a,b) then (ab,</w>)
    assert got == [(1, "ab"), (2, "ab</w>")]


def test_nb_confusion_separable_micro(spark):
    """On a vocabulary-separable corpus the add-1 NB classifier must
    recover the true labels on the held-out split exactly. Under the
    Knuth split ((id*2654435761) % 100 >= 80 holds out), ids 3 (bucket
    83, class B) and 8 (bucket 88, class A) are the test docs — one per
    class, asserted below rather than assumed — and the test docs reuse
    their class's training vocabulary."""
    from market_data_pipeline_spark.operators.text import nb_confusion

    knuth = 2654435761
    rows = []
    # class A speaks {apple banana}, class B speaks {stone iron}
    for i in range(10):
        bucket = (i * knuth) % 100
        label = "A" if i % 2 == 0 else "B"
        words = "apple banana apple" if label == "A" else "stone iron stone"
        rows.append((i, label, words, bucket))
    # sanity: both classes appear in train AND test under the shared split
    train = {r[1] for r in rows if r[3] < 80}
    test = {r[1] for r in rows if r[3] >= 80}
    assert train == {"A", "B"} and test == {"A", "B"}

    df = spark.createDataFrame(
        [(i, l, w) for i, l, w, _ in rows], "doc_id long, lang string, text string"
    )
    got = {
        (r.true_label, r.pred_label): r.n_docs
        for r in nb_confusion(df).collect()
    }
    # perfect diagonal: every held-out doc classified as its own class
    assert all(t == p for (t, p) in got), got
    n_test = sum(1 for r in rows if r[3] >= 80)
    assert sum(got.values()) == n_test


def test_unigram_train_viterbi_em_micro_case(spark):
    """Hand-computed Viterbi-EM: words {abab:3, ab:2, cab:1}. Seed counts
    (occurrence-weighted substrings ≤3): a=9 b=9 ab=9 ba=3 aba=3 bab=3
    c=1 ca=1 cab=1 (total 39). Round-1 best segmentations: abab→[ab,ab]
    (2·ln(9/39) beats aba+b / a+bab), ab→[ab], cab→[cab] (single piece
    beats c+ab / ca+b). E-step: ab = 3·2+2 = 8, cab = 1 → probs 8/9, 1/9;
    round 2 is a fixpoint."""
    w = spark.createDataFrame(
        [("abab", 3), ("ab", 2), ("cab", 1)], "word string, cnt long"
    )
    p = text.unigram_train(w, em_iters=2)
    got = {r["piece"]: (r["prob"], r["lp"]) for r in p.collect()}
    assert set(got) == {"ab", "cab"}
    assert got["ab"][0] == round(8 / 9 + 1e-13, 10)
    assert got["cab"][0] == round(1 / 9 + 1e-13, 10)
    import math

    assert got["ab"][1] == round(math.log(round(8 / 9 + 1e-13, 10)) + 1e-13, 10)

    wt = {r["word"]: r["__ntok"] for r in text.unigram_word_tokens(w, p).collect()}
    assert wt == {"abab": 2, "ab": 1, "cab": 1}


def test_unigram_apply_counts_admitted_words_only(spark):
    """Encode counts only pattern-admitted, length-capped, in-vocab words;
    docs with none still emit a zero row."""
    docs = spark.createDataFrame(
        [
            (1, "ab abab cab"),
            (2, "ab zz9 ab"),          # zz9 fails ^[a-z]+$
            (3, "XYZ 123 !!"),          # nothing admitted
            (4, "abcdefghijklmnop ab"),  # 16-char word exceeds the cap
        ],
        "doc_id long, text string",
    )
    w = spark.createDataFrame(
        [("abab", 3), ("ab", 2), ("cab", 1)], "word string, cnt long"
    )
    p = text.unigram_train(w, em_iters=2)
    got = {
        r["doc_id"]: (r["n_words"], r["n_unigram_tokens"])
        for r in text.unigram_apply(docs, w, p).collect()
    }
    assert got == {1: (3, 4), 2: (2, 2), 3: (0, 0), 4: (1, 1)}


def test_unigram_viterbi_prefers_longer_piece_on_ties(spark):
    """When a single piece and a split score identically, the backtrace
    must take the longer piece (the j=3,2,1 CASE order) on any engine."""
    # craft pieces where lp(ab) == lp(a) + lp(b) exactly: quantized lps
    pieces = spark.createDataFrame(
        [("a", 0.25, -2.0), ("b", 0.25, -2.0), ("ab", 0.0183, -4.0)],
        "piece string, prob double, lp double",
    )
    w = spark.createDataFrame([("ab", 1)], "word string, cnt long")
    wt = text.unigram_word_tokens(w, pieces).collect()
    assert wt[0]["__ntok"] == 1  # [ab], not [a, b]


def test_host_quota_caps_per_host_by_quality(spark):
    """Per-host cap keeps the quality-best docs; unparseable URLs share
    the empty-host quota rather than passing uncapped."""
    from market_data_pipeline_spark.operators import features

    rows = [
        (1, "https://a.com/x", 0.9),
        (2, "https://a.com/y", 0.8),
        (3, "https://a.com/z", 0.7),
        (4, "https://b.com/x", 0.1),
        (5, "not a url", 0.5),
        (6, "also-not-a-url", 0.4),
        (7, "ftp://c.com/f", 0.2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, q double")
    kept = features.host_quota(df, "url", "q", cap=2).collect()
    got = {r.doc_id: r.host for r in kept}
    # a.com keeps its 2 best (1, 2), drops 3; b.com keeps its only doc;
    # the two unparseable URLs share the '' host quota; ftp host parses
    assert got == {1: "a.com", 2: "a.com", 4: "b.com", 5: "", 6: "", 7: "c.com"}


def test_bm25_topk_hand_computed_micro_case(spark):
    """Three docs, one query — scores match the Okapi formula computed by
    hand, ranks tie-break on doc_id."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),      # tf(apple)=2, dl=3
            (2, "apple cherry"),            # tf(apple)=1, dl=2
            (3, "cherry cherry banana"),    # no apple
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(100, "apple")], "query_id long, qtext string"
    )
    got = {
        r.doc_id: (r.score, r.rk)
        for r in text.bm25_topk(docs, queries, k=10).collect()
    }
    # df(apple)=2, N=3, avgdl=(3+2+3)/3
    avgdl = round((3 + 2 + 3) / 3 + 1e-9, 6)
    idf = round(math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5)) + 1e-9, 6)

    def s(tf, dl):
        return round(
            idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) + 1e-9, 6
        )

    assert set(got) == {1, 2}  # doc 3 has no query term
    assert got[1] == (s(2, 3), 1)
    assert got[2] == (s(1, 2), 2)


def test_bm25_topk_caps_k_and_breaks_ties_by_doc_id(spark):
    """k limits per query; equal scores rank by ascending doc_id."""
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(5)], "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(1, "same"), (2, "absent")], "query_id long, qtext string"
    )
    rows = text.bm25_topk(docs, queries, k=3).collect()
    q1 = sorted([(r.rk, r.doc_id) for r in rows if r.query_id == 1])
    assert q1 == [(1, 0), (2, 1), (3, 2)]  # identical docs tie → id order, capped at 3
    assert not [r for r in rows if r.query_id == 2]  # no posting list, no rows


def test_maxmatch_greedy_segmentation_and_unk(spark):
    """Greedy longest-match: 'abab' over vocab {ab, aba, b, a} takes
    'aba'+'b' (longest-first, even though 'ab'+'ab' exists); a word with
    an uncovered position is UNK."""
    pieces = spark.createDataFrame(
        [("ab",), ("aba",), ("b",), ("a",)], "piece string"
    )
    w = spark.createDataFrame(
        [("abab", 1), ("abz", 1), ("b", 1)], "word string, cnt long"
    )
    got = {
        r.word: (r.ntok, r.unk)
        for r in text.maxmatch_word_tokens(w, pieces).collect()
    }
    assert got["abab"] == (2, False)  # aba + b
    assert got["b"] == (1, False)
    assert got["abz"][1] is True  # 'z' uncovered -> UNK (ab consumed first)
    assert got["abz"][0] == 1


def test_maxmatch_apply_per_doc_counts(spark):
    from market_data_pipeline_spark.operators import text as t

    docs = spark.createDataFrame(
        [(1, "abab b abz"), (2, "nope123 !!")], "doc_id long, text string"
    )
    w = spark.createDataFrame(
        [("abab", 1), ("abz", 1), ("b", 1)], "word string, cnt long"
    )
    pieces = spark.createDataFrame([("ab",), ("aba",), ("b",), ("a",)], "piece string")
    got = {
        r.doc_id: (r.n_words, r.n_wp_tokens, r.n_unk_words)
        for r in t.maxmatch_apply(docs, w, pieces).collect()
    }
    # doc 1: 3 admitted words; abab=2 + b=1 tokens, abz is UNK
    assert got[1] == (3, 3, 1)
    assert got[2] == (0, 0, 0)


def test_retrieval_ndcg_hand_computed(spark):
    """nDCG@k by hand: a perfect ranking scores 1.0, a swapped ranking
    the exact DCG ratio, and a query with no positive judgments 0."""
    import math

    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 10, 1), (3, 10, 1)],
        "query_id long, doc_id long, rk int",
    )
    relevance = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 1), (2, 11, 2)],
        "query_id long, doc_id long, rel long",
    )
    got = {
        r.query_id: r.ndcg
        for r in __import__(
            "market_data_pipeline_spark.operators.text", fromlist=["text"]
        ).retrieval_ndcg(results, relevance, k=10).collect()
    }

    def g(rel, rk):
        return round(rel / math.log2(rk + 1.0) + 1e-12, 9)

    # q1: ranking (3,1) IS ideal -> exactly 1.0 (same quantized sums)
    assert got[1] == round((g(3, 1) + g(1, 2)) / (g(3, 1) + g(1, 2)) + 1e-9, 6)
    assert abs(got[1] - 1.0) < 1e-5
    # q2: retrieved doc 10 (rel 0); ideal = doc 11 at rank 1 -> 0
    assert got[2] == round(0.0 / g(2, 1) + 1e-9, 6)
    # q3: no judgments at all -> 0 (idcg null -> coalesce)
    assert got[3] == round(0.0 + 1e-9, 6)


def test_pmi_collocations_hand_computed(spark):
    """PMI micro-case: 'new york new york' + 'new deal' — unigrams
    new=3 york=2 deal=1 (Nu=6), bigrams (new,york)=2 (york,new)=1
    (new,deal)=1 (Nb=4); PMI(new,york)=PMI(new,deal)=ln 3,
    PMI(york,new)=ln 1.5; ties break lexicographically."""
    import math

    df = spark.createDataFrame(
        [(1, "new york new york"), (2, "new deal")], "doc_id long, text string"
    )
    rows = text.pmi_collocations(df, min_count=1, k=10).collect()
    got = [(r.w1, r.w2, r.n_pair, r.pmi) for r in rows]
    ln3 = round(math.log(3.0) + 1e-9, 6)
    ln15 = round(math.log(1.5) + 1e-9, 6)
    assert got == [
        ("new", "deal", 1, ln3),
        ("new", "york", 2, ln3),
        ("york", "new", 1, ln15),
    ]


def test_textrank_hub_word_outranks_leaves(spark):
    """TextRank: a word adjacent to many distinct words (hub) outranks
    words seen only once; stopwords never appear as nodes."""
    docs = [
        (1, "spark joins tables"),
        (2, "spark shuffles data"),
        (3, "spark scales clusters"),
        (4, "the spark of the engine"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = text.textrank_keywords(df, k=50, iterations=10).collect()
    words = [r.word for r in rows]
    assert words[0] == "spark"  # highest-degree hub
    assert "the" not in words and "of" not in words  # stopwords dropped
    assert all(rows[i].pr >= rows[i + 1].pr for i in range(len(rows) - 1))


def test_touch_attribution_hand_computed(spark):
    """Attribution micro-case: user 1 path view→click→purchase(10) gives
    first-touch=view, last-touch=click; user 2's opening purchase is
    unattributable; a second purchase re-credits the SAME earlier touches."""
    rows = [
        (1, "view", 1.0, 100, 1),
        (1, "click", 1.0, 200, 2),
        (1, "purchase", 10.0, 300, 3),
        (1, "purchase", 7.0, 400, 4),  # still ft=view, lt=click
        (2, "purchase", 99.0, 100, 5),  # no preceding touch
        (2, "signup", 1.0, 200, 6),
        (2, "purchase", 5.0, 300, 7),  # ft=lt=signup
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, value double, ts long, event_id long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    from market_data_pipeline_spark.operators.behavior import touch_attribution

    got = {
        (r.model, r.event_type): (r.conversions, r.attributed_value)
        for r in touch_attribution(df).collect()
    }
    assert got == {
        ("first_touch", "view"): (2, round(17.0 + 1e-9, 4)),
        ("first_touch", "signup"): (1, round(5.0 + 1e-9, 4)),
        ("last_touch", "click"): (2, round(17.0 + 1e-9, 4)),
        ("last_touch", "signup"): (1, round(5.0 + 1e-9, 4)),
    }


def test_cohort_ltv_hand_computed(spark, tmp_path):
    """Cohort LTV micro-case: user 1 joins day 0 (purchases 10 on day 0,
    20 on day 2), user 2 joins day 0 (no purchases), user 3 joins day 1
    (purchase 5 same day). Cohort day0 has 2 users -> LTV halves."""
    import datetime as dt

    rows = [
        (1, "2024-01-01 10:00:00", "purchase", 10.0),
        (1, "2024-01-03 10:00:00", "purchase", 20.0),
        (2, "2024-01-01 11:00:00", "view", 1.0),
        (2, "2024-01-03 11:00:00", "click", 1.0),
        (3, "2024-01-02 09:00:00", "purchase", 5.0),
    ]
    df = spark.createDataFrame(
        [(u, dt.datetime.fromisoformat(t), e, v, i) for i, (u, t, e, v) in enumerate(rows)],
        "user_id long, ts timestamp, event_type string, value double, event_id long",
    )
    out = str(tmp_path / "ev.parquet")
    df.write.parquet(out)

    import os

    from market_data_pipeline_spark.operators import behavior

    # cohort_ltv loads via load_table(spark, sf_dir, 'events') — point it
    # at a directory whose events.parquet is our fixture
    evdir = str(tmp_path)
    os.rename(out, os.path.join(evdir, "events.parquet"))
    got = {
        (str(r.cohort_day), r.day_offset): (
            r.day_revenue,
            r.cum_revenue,
            r.cohort_users,
            r.ltv_per_user,
        )
        for r in behavior.cohort_ltv(spark, evdir).collect()
    }
    r4 = lambda x: round(x + 1e-9, 4)
    assert got[("2024-01-01", 0)] == (r4(10.0), r4(10.0), 2, round(10.0 / 2 + 1e-9, 6))
    assert got[("2024-01-01", 2)] == (r4(20.0), r4(30.0), 2, round(30.0 / 2 + 1e-9, 6))
    assert got[("2024-01-02", 0)] == (r4(5.0), r4(5.0), 1, round(5.0 + 1e-9, 6))


def test_activity_burstiness_hand_computed(spark, tmp_path):
    """Steady user (2,2,2,2 daily) -> fano 0; bursty user (1,7) ->
    var_pop=9, mean=4, fano=2.25 and flagged."""
    import datetime as dt
    import os

    rows = []
    eid = 0
    for day in range(4):  # user 1: 2 events/day
        for _ in range(2):
            rows.append((1, dt.datetime(2024, 1, 1 + day, 9 + _), eid)); eid += 1
    for day, cnt in ((0, 1), (1, 7)):  # user 2: 1 then 7
        for j in range(cnt):
            rows.append((2, dt.datetime(2024, 1, 1 + day, 8 + j), eid)); eid += 1
    df = spark.createDataFrame(
        [(u, t, "view", 1.0, i) for u, t, i in rows],
        "user_id long, ts timestamp, event_type string, value double, event_id long",
    )
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))

    from market_data_pipeline_spark.operators.behavior import activity_burstiness

    got = {r.user_id: r for r in activity_burstiness(spark, str(tmp_path)).collect()}
    assert (got[1].n_days, got[1].n_events, got[1].fano, got[1].is_bursty) == (
        4, 8, round(0.0 + 1e-9, 6), False,
    )
    assert (got[2].n_days, got[2].n_events) == (2, 8)
    assert got[2].fano == round(2.25 + 1e-9, 6) and got[2].is_bursty


def test_top_paths_hand_computed(spark, tmp_path):
    """Two users walking view→click→purchase and one walking
    view→click→view: trigram counts are 2 and 1, order deterministic."""
    import datetime as dt
    import os

    seqs = {
        1: ["view", "click", "purchase"],
        2: ["view", "click", "purchase"],
        3: ["view", "click", "view"],
    }
    rows, eid = [], 0
    for u, seq in seqs.items():
        for j, t in enumerate(seq):
            rows.append((u, dt.datetime(2024, 1, 1, 9, j), t, 1.0, eid)); eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double, event_id long"
    )
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))

    from market_data_pipeline_spark.operators.behavior import top_paths

    got = [(r.step1, r.step2, r.step3, r.n) for r in top_paths(spark, str(tmp_path)).collect()]
    assert got == [
        ("view", "click", "purchase", 2),
        ("view", "click", "view", 1),
    ]


def test_rrf_fuse_hand_computed(spark):
    """RRF of two tiny rankings, every fused score hand-derived:
    d2 appears in both legs (1/62 + 1/61 = 0.032522), d1 only lexical at
    rank 1 (1/61 = 0.016393), d3 only semantic at rank 2 (1/62 =
    0.016129) — fused order d2, d1, d3. Equal scores break by doc_id:
    d4 (sem rank 1) and d5 (lex rank 1) both score 1/61, d4 first."""
    from market_data_pipeline_spark.operators.text import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (2, 50, 1)],
        "query_id long, doc_id long, rk int",
    )
    sem = spark.createDataFrame(
        [(1, 20, 1), (1, 30, 2), (2, 40, 1)],
        "query_id long, doc_id long, rk int",
    )
    got = [
        (r.query_id, r.doc_id, r.rrf_score, r.rk)
        for r in rrf_fuse(lex, sem, k_const=60, topk=10)
        .orderBy("query_id", "rk")
        .collect()
    ]
    s61 = round(1.0 / 61.0 + 1e-9, 6)
    s62 = round(1.0 / 62.0 + 1e-9, 6)
    s_both = round(1.0 / 62.0 + 1.0 / 61.0 + 1e-9, 6)
    assert got == [
        (1, 20, s_both, 1),
        (1, 10, s61, 2),
        (1, 30, s62, 3),
        (2, 40, s61, 1),  # tie with doc 50: doc_id ascending
        (2, 50, s61, 2),
    ]


def test_hybrid_rrf_mixture_properties(spark):
    """Corpus-independent RRF properties pinned at sf0.001: the fused
    top-10 contains members of BOTH legs, and the fused nDCG is at least
    the WEAKER leg's for every query (the mixture bound). The stronger
    'fusion beats the best leg' claim is knowably false on this corpus —
    its embeddings are generated independently of the text (see the
    q_t_hybrid_ndcg docstring) — so it is deliberately NOT asserted."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    _, _, _, _, lex, sem, _ = entrymod._hybrid_legs(spark, sf)
    from market_data_pipeline_spark.operators.text import rrf_fuse

    fused = rrf_fuse(lex, sem, k_const=60, topk=10)
    lex_set = {(r.query_id, r.doc_id) for r in lex.collect()}
    sem_set = {(r.query_id, r.doc_id) for r in sem.collect()}
    fus_set = {(r.query_id, r.doc_id) for r in fused.collect()}
    assert fus_set & lex_set and fus_set & sem_set
    rows = entrymod.queries()["inv_t_hybrid_ndcg"](spark, sf).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.ndcg_rrf <= 1.0
        assert r.ndcg_rrf >= min(r.ndcg_lex, r.ndcg_sem) - 1e-9


def test_unigram_apply_pre_aggregate_equals_default(spark):
    """The (doc, word, cnt) pre-aggregation knob is a pure plan-shape
    trade (see unigram_apply's measured A/B note): both shapes must emit
    identical counts."""
    import __spark_entry__ as entrymod
    from market_data_pipeline_spark.operators import text

    sf = "/root/testdata/sf0.001"
    d = entrymod._docs(spark, sf)
    train = entrymod._uni_words(spark, sf)
    p = text.unigram_train(train, em_iters=entrymod._UNI_EM_ITERS)
    base = {
        r.doc_id: (r.n_words, r.n_unigram_tokens)
        for r in text.unigram_apply(d, train, p).collect()
    }
    pre = {
        r.doc_id: (r.n_words, r.n_unigram_tokens)
        for r in text.unigram_apply(d, train, p, pre_aggregate=True).collect()
    }
    assert base == pre and len(base) > 0


def test_bm25_prf_zero_expansion_is_identity(spark):
    """expand_m=0 must reduce PRF to plain BM25 exactly (the two share
    one index and one scoring helper — the degenerate identity pins the
    refactor), and with expansion the term set only GROWS, so every
    original query term still contributes."""
    import __spark_entry__ as entrymod
    from market_data_pipeline_spark.operators import text

    sf = "/root/testdata/sf0.001"
    d = entrymod._docs(spark, sf)
    queries = d.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(text.tokens(F.col("text")), 1, 4)).alias("qtext"),
    )
    plain = {
        (r.query_id, r.doc_id): (r.score, r.rk)
        for r in text.bm25_topk(d, queries, k=10).collect()
    }
    prf0 = {
        (r.query_id, r.doc_id): (r.score, r.rk)
        for r in text.bm25_prf_topk(d, queries, k=10, fb_k=3, expand_m=0).collect()
    }
    assert plain == prf0 and len(plain) > 0
    # with expansion, pass-2 scores dominate pass-1 for docs that match
    # expansion terms; the result must still carry 10 rows per query
    prf = text.bm25_prf_topk(d, queries, k=10, fb_k=3, expand_m=3)
    per_q = {r.query_id for r in prf.collect()}
    assert per_q == {0, 1, 2, 3, 4}


def test_char_entropy_hand_computed(spark):
    """Closed-form entropies: 'aabb' = 1 bit, 'abcd' = 2 bits, 'aaaa' = 0;
    case folds ('AaBb' ≡ 'aabb'); empty text scores 0 over 0 chars."""
    from market_data_pipeline_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aabb"), (2, "abcd"), (3, "aaaa"), (4, "AaBb"), (5, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in char_entropy(df).collect()}
    assert (got[1].n_chars, got[1].n_distinct_chars, got[1].char_entropy) == (4, 2, 1.0)
    assert (got[2].n_chars, got[2].char_entropy) == (4, 2.0)
    assert (got[3].n_distinct_chars, got[3].char_entropy) == (1, 0.0)
    assert got[4].char_entropy == 1.0  # lower-cased first
    assert (got[5].n_chars, got[5].char_entropy) == (0, 0.0)


def test_domain_kl_matches_python_replica_and_zero_for_identical(spark):
    """KL of each source against the corpus matches an add-1-smoothed
    pure-Python replica exactly, and every slice that differs from the
    corpus mixture scores strictly positive. (No ordering claim between
    the slices: each source pulls the corpus distribution toward itself,
    so a heavily-weighted 'divergent' slice can sit CLOSER to the mixture
    than a balanced one — that asymmetry is the point of measuring
    against the corpus rather than against the other slice.)"""
    import math
    from collections import Counter

    from market_data_pipeline_spark.operators.text import domain_kl

    rows = [
        (1, "balanced", "alpha beta gamma delta"),
        (2, "balanced", "alpha beta gamma delta"),
        (3, "skewed", "alpha alpha alpha alpha"),
        (4, "skewed", "epsilon epsilon epsilon epsilon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.source: r for r in domain_kl(df).collect()}

    toks = [(s, w) for _, s, t in rows for w in t.split()]
    c_all = Counter(w for _, w in toks)
    v, n = len(c_all), len(toks)
    for src in ("balanced", "skewed"):
        c_s = Counter(w for s, w in toks if s == src)
        n_s = sum(c_s.values())
        kl = sum(
            ((c_s.get(w, 0) + 1) / (n_s + v))
            * math.log2(
                ((c_s.get(w, 0) + 1) / (n_s + v)) / ((c_all[w] + 1) / (n + v))
            )
            for w in c_all
        )
        assert got[src].kl_bits == round(kl + 1e-9, 6)
        assert got[src].n_tokens == n_s
    assert got["skewed"].kl_bits > 0 and got["balanced"].kl_bits > 0


def test_ql_dirichlet_hand_computed(spark):
    """Dirichlet QL on a two-doc corpus, every score hand-derived with
    the operator's own quantization steps (mu=10 keeps numbers visible):
    corpus 'apple banana apple' / 'banana cherry' -> T=5, cf(apple)=2,
    cf(banana)=2; query 'apple banana' matches both docs, nq=2."""
    import math

    from market_data_pipeline_spark.operators.text import ql_dirichlet_topk

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(100, "apple banana")], "query_id long, qtext string"
    )
    mu = 10.0
    c = lambda tf, cf: round(math.log(1.0 + tf * 5 / (mu * cf)) + 1e-9, 6)
    dlt = lambda dl: round(math.log(mu / (dl + mu)) + 1e-9, 6)
    want_d1 = round(c(2, 2) + c(1, 2) + 2 * dlt(3) + 1e-9, 6)
    want_d2 = round(c(1, 2) + 2 * dlt(2) + 1e-9, 6)
    got = [
        (r.query_id, r.doc_id, r.score, r.rk)
        for r in ql_dirichlet_topk(docs, queries, k=10, mu=mu)
        .orderBy("rk")
        .collect()
    ]
    assert got == [(100, 1, want_d1, 1), (100, 2, want_d2, 2)]
    # the matched-gain term dominates the shorter-doc prior here: the doc
    # with both query terms (and the higher tf) outranks the shorter one
    assert want_d1 > want_d2


def test_ql_dirichlet_oov_terms_drop_from_nq(spark):
    """A query term absent from the corpus (cf=0) contributes -inf to
    every document in the full formula, so it is excluded from both the
    candidate join and the |q_V| count: 'apple zzz' scores exactly like
    'apple' alone."""
    from market_data_pipeline_spark.operators.text import ql_dirichlet_topk

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry")],
        "doc_id long, text string",
    )
    q_oov = spark.createDataFrame(
        [(100, "apple zzz")], "query_id long, qtext string"
    )
    q_clean = spark.createDataFrame(
        [(100, "apple")], "query_id long, qtext string"
    )
    got_oov = [
        (r.doc_id, r.score, r.rk)
        for r in ql_dirichlet_topk(docs, q_oov, k=10, mu=10.0).orderBy("rk").collect()
    ]
    got_clean = [
        (r.doc_id, r.score, r.rk)
        for r in ql_dirichlet_topk(docs, q_clean, k=10, mu=10.0).orderBy("rk").collect()
    ]
    assert got_oov == got_clean


def test_rrf_fuse_many_two_legs_equals_rrf_fuse(spark):
    """The N-leg generalization must reproduce the two-leg entry
    verbatim on the same inputs (same joins, same sum order)."""
    from market_data_pipeline_spark.operators.text import rrf_fuse, rrf_fuse_many

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (2, 50, 1)],
        "query_id long, doc_id long, rk int",
    )
    sem = spark.createDataFrame(
        [(1, 20, 1), (1, 30, 2), (2, 40, 1)],
        "query_id long, doc_id long, rk int",
    )
    two = sorted(
        (r.query_id, r.doc_id, r.rrf_score, r.rk)
        for r in rrf_fuse(lex, sem, k_const=60, topk=10).collect()
    )
    many = sorted(
        (r.query_id, r.doc_id, r.rrf_score, r.rk)
        for r in rrf_fuse_many([lex, sem], k_const=60, topk=10).collect()
    )
    assert two == many


def test_rrf_fuse_many_three_legs_hand_computed(spark):
    """Three tiny rankings: d1 in all three legs (1/61+1/62+1/61), d2 in
    legs 1+3 only, d3 in leg 2 only — fused order and scores exact."""
    from market_data_pipeline_spark.operators.text import rrf_fuse_many

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2)], "query_id long, doc_id long, rk int"
    )
    b = spark.createDataFrame(
        [(1, 10, 2), (1, 30, 1)], "query_id long, doc_id long, rk int"
    )
    c = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2)], "query_id long, doc_id long, rk int"
    )
    got = [
        (r.doc_id, r.rrf_score, r.rk)
        for r in rrf_fuse_many([a, b, c], k_const=60, topk=10)
        .orderBy("rk")
        .collect()
    ]
    s_all = round(1.0 / 61.0 + 1.0 / 62.0 + 1.0 / 61.0 + 1e-9, 6)
    s_13 = round(1.0 / 62.0 + 0.0 + 1.0 / 62.0 + 1e-9, 6)
    s_2 = round(1.0 / 61.0 + 1e-9, 6)
    assert got == [(10, s_all, 1), (20, s_13, 2), (30, s_2, 3)]


def test_hybrid_rrf3_mixture_properties(spark):
    """Three-leg RRF at sf0.001: the fused top-10 carries members of all
    three legs, and the fused nDCG is at least the WEAKEST leg's for
    every query (the mixture bound — the only bound this corpus's
    independent embeddings support, see test_hybrid_rrf_mixture_
    properties)."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    _, _, _, _, lex, sem, ql, _ = entrymod._hybrid_legs3(spark, sf)
    from market_data_pipeline_spark.operators.text import rrf_fuse_many

    fused = rrf_fuse_many([lex, sem, ql], k_const=60, topk=10)
    lex_set = {(r.query_id, r.doc_id) for r in lex.collect()}
    sem_set = {(r.query_id, r.doc_id) for r in sem.collect()}
    ql_set = {(r.query_id, r.doc_id) for r in ql.collect()}
    fus_set = {(r.query_id, r.doc_id) for r in fused.collect()}
    assert fus_set & lex_set and fus_set & sem_set and fus_set & ql_set
    rows = entrymod.queries()["inv_t_hybrid_ndcg3"](spark, sf).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.ndcg_rrf3 <= 1.0
        assert 0.0 <= r.ndcg_ql <= 1.0
        assert r.ndcg_rrf3 >= min(r.ndcg_lex, r.ndcg_sem, r.ndcg_ql) - 1e-9


def test_unigram_doc_nll_hand_computed(spark):
    """Cross-entropy under a hand-built piece table: 'ab' segments as the
    single piece [ab] (ln .25 beats ln .5 + ln .25), 'a' as [a]; 'zq'
    has no vocab pieces so it counts as admitted but NOT scored (the
    OOV floor is excluded from the mean, not averaged in)."""
    import math

    from market_data_pipeline_spark.operators.text import unigram_doc_nll, word_counts

    docs = spark.createDataFrame(
        [(1, "ab a"), (2, "ab zq")], "doc_id long, text string"
    )
    q10 = lambda x: round(x + 1e-13, 10)
    pieces = spark.createDataFrame(
        [("a", q10(math.log(0.5))), ("b", q10(math.log(0.25))),
         ("ab", q10(math.log(0.25)))],
        "piece string, lp double",
    )
    words = word_counts(docs)
    got = {
        r.doc_id: (r.n_words, r.n_scored, r.n_tokens, r.nll_per_token)
        for r in unigram_doc_nll(docs, words, pieces).collect()
    }
    lp_ab = round(q10(math.log(0.25)) + 1e-13, 8)
    lp_a = round(q10(math.log(0.5)) + 1e-13, 8)
    want1 = round(-(lp_ab + lp_a) / 2 + 1e-9, 6)
    want2 = round(-lp_ab / 1 + 1e-9, 6)
    assert got == {1: (2, 2, 2, want1), 2: (2, 1, 1, want2)}
    # the OOV-heavy doc is MORE surprising per scored token here, and a
    # doc with zero scored words would report 0.0 by convention
    assert want2 > want1


def test_rake_keywords_hand_computed(spark):
    """RAKE on two tiny docs, every score hand-derived: phrases split on
    the stopword 'the'; word score = degree/frequency (degree = summed
    length of containing phrases); phrase score = member sum. 'data'
    appears in two phrases of lengths 4 and 2 -> 6/2 = 3.0."""
    from market_data_pipeline_spark.operators.text import rake_keywords

    docs = spark.createDataFrame(
        [(1, "good data pipelines need the best data"), (2, "alpha beta")],
        "doc_id long, text string",
    )
    got = [
        (r.phrase, r.n_occurrences, r.score)
        for r in rake_keywords(docs, k=30, max_len=4).collect()
    ]
    assert got == [
        # good 4/1 + data 6/2 + pipelines 4/1 + need 4/1 = 15
        ("good data pipelines need", 1, 15.0),
        ("best data", 1, 5.0),   # best 2/1 + data 3
        ("alpha beta", 1, 4.0),  # 2 + 2
    ]


def test_rake_keywords_max_len_cap(spark):
    """A stopword-free run longer than max_len is dropped entirely (the
    classic junk guard), not truncated."""
    from market_data_pipeline_spark.operators.text import rake_keywords

    docs = spark.createDataFrame(
        [(1, "one two three four five"), (2, "six seven")],
        "doc_id long, text string",
    )
    got = [(r.phrase, r.score) for r in rake_keywords(docs, k=30, max_len=4).collect()]
    assert got == [("six seven", 4.0)]


def test_markov_stationary_hand_computed(spark, tmp_path):
    """Two-state chain with asymmetric transitions, expected values from
    a pure-python replay of the SAME quantized update: counts A->A 1,
    A->B 2, B->A 1 give P(A->A)=1/3, P(A->B)=2/3, P(B->A)=1."""
    import datetime as dt
    import os

    rows, eid = [], 0
    for u, seq in {1: ["A", "A", "B", "A"], 2: ["A", "B"]}.items():
        for j, t in enumerate(seq):
            rows.append((u, dt.datetime(2024, 1, 1, 9, j), t, 1.0, eid))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double, event_id long"
    )
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))

    from market_data_pipeline_spark.operators.behavior import markov_stationary

    p = {
        ("A", "A"): round(1.0 / 3 + 1e-13, 10),
        ("A", "B"): round(2.0 / 3 + 1e-13, 10),
        ("B", "A"): round(1.0 / 1 + 1e-13, 10),
    }
    states = ["A", "B"]
    pi = {s: round(0.5 + 1e-13, 10) for s in states}
    for _ in range(8):
        pi = {
            b: round(sum(pi[a] * p.get((a, b), 0.0) for a in states) + 1e-13, 10)
            for b in states
        }
    got = {
        r.event_type: (r.stationary_prob, r.n_out)
        for r in markov_stationary(spark, str(tmp_path), iterations=8).collect()
    }
    assert got == {"A": (pi["A"], 3), "B": (pi["B"], 1)}
    # the chain spends more long-run time in A (it receives all of B's
    # mass plus a third of its own)
    assert got["A"][0] > got["B"][0]


def test_markov_stationary_terminal_only_type_excluded(spark, tmp_path):
    """A type that only ever ENDS streams (never a source) is excluded
    from the chain, and the surviving rows renormalize: u: A,B,END —
    END has no outgoing edge, so the kept chain is A<->B only."""
    import datetime as dt
    import os

    rows = [
        (1, dt.datetime(2024, 1, 1, 9, 0), "A", 1.0, 0),
        (1, dt.datetime(2024, 1, 1, 9, 1), "B", 1.0, 1),
        (1, dt.datetime(2024, 1, 1, 9, 2), "END", 1.0, 2),
        (2, dt.datetime(2024, 1, 1, 9, 0), "B", 1.0, 3),
        (2, dt.datetime(2024, 1, 1, 9, 1), "A", 1.0, 4),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double, event_id long"
    )
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))

    from market_data_pipeline_spark.operators.behavior import markov_stationary

    got = {r.event_type for r in markov_stationary(spark, str(tmp_path)).collect()}
    assert got == {"A", "B"}


def test_repetition_signals_hand_computed(spark):
    """Three hand-graded docs: a looping template ('spam ham' * 4) pins
    top_bigram_share at its slot ceiling, a no-repeat doc scores the
    uniform floor, and a 2-token doc has trigram stats 0 by convention."""
    from market_data_pipeline_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "spam ham spam ham spam ham spam ham"),
            (2, "one two three four five"),
            (3, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (
            r.n_tokens, r.top_bigram_share, r.top_trigram_share, r.dup_trigram_frac
        )
        for r in repetition_signals(docs).collect()
    }
    # doc 1: 8 tokens, 7 bigram slots: 'spam ham' x4 -> 4/7; 6 trigram
    # slots: 'spam ham spam' x3 -> 3/6; distinct trigrams 2 -> dup 4/6
    assert got[1] == (
        8,
        round(4 / 7 + 1e-9, 6),
        round(3 / 6 + 1e-9, 6),
        round(1 - 2 / 6 + 1e-9, 6),
    )
    # doc 2: every n-gram unique -> shares are 1/slots, dup 0
    assert got[2] == (
        5,
        round(1 / 4 + 1e-9, 6),
        round(1 / 3 + 1e-9, 6),
        0.0,
    )
    # doc 3: one bigram slot, zero trigram slots
    assert got[3] == (2, 1.0, 0.0, 0.0)
