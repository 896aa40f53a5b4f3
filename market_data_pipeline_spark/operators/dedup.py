"""Deduplication operators over ``documents``: exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

North-star operators (BASELINE.json). Scale design:
- exact dedup = one hash-groupBy on the md5 fingerprint (shuffle on a short
  key, map-side partial counts).
- MinHash/LSH avoids the O(n²) pairwise explosion: shingle → K salted min
  hashes → band → bucket-join; only same-bucket pairs are compared. The hash
  is the *lexicographic min of md5(salt‖shingle)* — numerically identical to
  a 128-bit integer MinHash and reproducible in any engine (the oracle runs
  the same construction in SQL).
- n-gram Jaccard is the verification step on candidate pairs only.
- SimHash gives a single 64-bit signature whose Hamming distance bounds
  cosine similarity of the token sets — here via pandas UDF (bit math), with
  a pytest oracle.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from market_data_pipeline_spark.operators.text import normalized


def shingles(df: DataFrame, text_col: str = "text", n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per document: split → sliding join.

    Narrow ops only (explode is per-row); the dedup pipeline's single shuffle
    happens later at the band/bucket groupBy.
    """
    toks = F.split(normalized(F.col(text_col)), " ")
    # shingle i = tokens[i..i+n-1], for i in 0..size-n; sequence() DESCENDS
    # when start > stop, so short docs need an explicit empty-array guard
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by md5(normalized text); emit groups with >1 doc,
    keeping min doc_id as the canonical survivor."""
    h = F.md5(normalized(F.col(text_col)))
    return (
        df.withColumn("fingerprint", h)
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact_keep_first(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The applied form: one surviving row per distinct normalized text
    (min doc_id wins — deterministic, unlike dropDuplicates)."""
    h = F.md5(normalized(F.col(text_col)))
    keep = (
        df.withColumn("fingerprint", h)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
    )
    return keep.join(df, id_col, "inner").select(id_col, "fingerprint")


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", num_hashes: int = 12, shingle_n: int = 3) -> DataFrame:
    """MinHash signature per doc: for seed k, sig_k = min(md5(k‖shingle)).

    Lexicographic min over md5 hex == numeric min over the 128-bit hash —
    a true MinHash family, engine-portable. One explode + one groupBy(doc).
    """
    sh = shingles(df, text_col, shingle_n, id_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{k}|"), F.col("shingle")))).alias(f"mh_{k}")
        for k in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def bucket_pair_candidates(
    buckets: DataFrame,
    id_col: str,
    bucket_cols: tuple[str, ...],
    order_col: str,
    hot_bucket_cap: int | None = None,
    chain_window: int = 8,
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Candidate (id_a, id_b) pairs (id_a < id_b always) from an LSH bucket
    self-join, with an optional HOT-BUCKET CAP.

    Without a cap, the self-join emits O(n²) pairs inside every bucket of
    n members — fine for the hash-random buckets LSH produces on organic
    text, degenerate at 100 TB when boilerplate-heavy web text lands one
    pathological bucket with millions of members: that single bucket's
    quadratic pair dump then dominates the stage. With a cap B, buckets
    of n ≤ B members keep the exact all-pairs join, and hot buckets
    (n > B) switch to CHAIN pairing: members are ordered by a
    fine-grained similarity key (``order_col`` — the full minhash
    signature, or a finer LSH signature — so near-identical members sort
    adjacent) and each member pairs only with its next ``chain_window``
    followers, bounding fan-out to W·n (linear).

    Recall contract: group-forming consumers (connected components) lose
    nothing in the adversarial all-near-identical hot bucket — the chain
    connects the whole bucket transitively (pinned in
    tests/test_dedup_similarity.py). A true pair separated by more than
    ``chain_window`` dissimilar members in sort order, within every band
    it collides in, is missed — the documented recall bound. Consumers
    of the raw PAIR LIST leave the cap off (``None``, the default):
    capping changes the emitted pair set.

    Scale note: ranking a hot bucket is a row_number window over that
    bucket — one task scans the bucket LINEARLY, versus the quadratic
    blowup it replaces; the cold path's per-bucket work is capped at B².

    ``payload_cols`` are carried through to the output as ``<c>_a`` /
    ``<c>_b``, swapped consistently with the id ordering (so e.g. vector
    columns line up with their ids for a downstream cosine verify).
    """
    from pyspark.sql import Window

    def _allpairs(frame: DataFrame) -> DataFrame:
        fa, fb = frame.alias("a"), frame.alias("b")
        cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        for c in bucket_cols:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        return fa.join(fb, cond).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[F.col(f"a.{c}").alias(f"{c}_a") for c in payload_cols],
            *[F.col(f"b.{c}").alias(f"{c}_b") for c in payload_cols],
        )

    if hot_bucket_cap is None:
        return _allpairs(buckets)

    # The capped plan references ``buckets`` four times (count agg, its
    # join-back, and both sides of the cold self-join). Bucket keys are
    # typically literal-heavy expressions (minhash bands, hyperplane
    # signatures: hundreds of plan nodes), so replicating them 4× costs
    # seconds of driver-side analysis and re-executes the hashing per
    # reference. One lazy localCheckpoint truncates the expression out of
    # every downstream copy for O(buckets) executor-local storage — the
    # capped path feeds group-forming consumers that materialize their
    # edge set immediately anyway (dup_groups), so the storage is
    # transient and the recompute-on-executor-loss risk window is short.
    buckets = buckets.localCheckpoint(eager=False)
    counts = buckets.groupBy(*bucket_cols).agg(F.count("*").alias("__n"))
    tagged = buckets.join(counts, list(bucket_cols))
    cold = tagged.filter(F.col("__n") <= hot_bucket_cap).drop("__n")
    hot = tagged.filter(F.col("__n") > hot_bucket_cap).drop("__n")
    w = Window.partitionBy(*[F.col(c) for c in bucket_cols]).orderBy(
        F.col(order_col), F.col(id_col)
    )
    ranked = hot.withColumn("__r", F.row_number().over(w))
    right = ranked.select(
        *bucket_cols,
        F.col(id_col).alias("__rid"),
        F.col("__r").alias("__rr"),
        *[F.col(c).alias(f"__rp_{c}") for c in payload_cols],
    )
    swap = F.col(id_col) > F.col("__rid")
    hot_pairs = (
        ranked.select(
            *bucket_cols,
            F.col(id_col),
            *payload_cols,
            F.explode(
                F.sequence(F.col("__r") + 1, F.col("__r") + chain_window)
            ).alias("__rr"),
        )
        .join(right, [*bucket_cols, "__rr"])
        .select(
            F.least(F.col(id_col), F.col("__rid")).alias("id_a"),
            F.greatest(F.col(id_col), F.col("__rid")).alias("id_b"),
            *[
                F.when(swap, F.col(f"__rp_{c}")).otherwise(F.col(c)).alias(f"{c}_a")
                for c in payload_cols
            ],
            *[
                F.when(swap, F.col(c)).otherwise(F.col(f"__rp_{c}")).alias(f"{c}_b")
                for c in payload_cols
            ],
        )
    )
    return _allpairs(cold).unionByName(hot_pairs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    hot_bucket_cap: int | None = None,
    chain_window: int = 8,
    sig: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: band the signature (rows = num_hashes/bands),
    bucket on md5(band contents), self-join buckets, emit ordered pairs.

    The banding turns near-dup search from O(n²) into a groupBy on bucket
    keys — the 100 TB path. Bucket skew (a viral shingle set) is handled by
    AQE skew-join splitting; a degenerate hot bucket can additionally be
    capped via ``hot_bucket_cap`` (see ``bucket_pair_candidates`` for the
    recall contract — the default None keeps the exact pair list, which is
    what consumers of the raw pairs want).
    """
    rows = num_hashes // bands
    if sig is None:
        sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    else:
        # callers sweeping several band configs pass a prebuilt (ideally
        # checkpointed) signature frame so the corpus shingle+hash pass
        # runs once, not once per config. Validate its shape against
        # num_hashes: a frame built with fewer hashes would silently band
        # wrong columns (a late AnalysisException at best). A SUPERSET is
        # fine and supported on purpose: mh_k's seed depends only on k
        # (minhash_signatures above), so a wide frame's mh_0..mh_{n-1}
        # prefix is bit-identical to a narrow build — callers sweep many
        # num_hashes values off ONE wide checkpointed frame. NOTE
        # shingle_n is NOT checkable from the frame — it must match the
        # value the sig was built with (a mismatch yields plausible but
        # wrong buckets).
        have = {c for c in sig.columns if c.startswith("mh_")}
        want = {f"mh_{k}" for k in range(num_hashes)}
        if not want <= have:
            raise ValueError(
                f"prebuilt sig frame has minhash columns {sorted(have)} but "
                f"num_hashes={num_hashes} requires at least {sorted(want)}; "
                "rebuild the signatures with matching parameters"
            )
        if id_col not in sig.columns:
            raise ValueError(f"prebuilt sig frame lacks id column {id_col!r}")
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("bucket"))
        )
    full_sig = F.concat_ws("|", *[F.col(f"mh_{k}") for k in range(num_hashes)])
    buckets = sig.select(
        F.col(id_col), full_sig.alias("__sig"), F.explode(F.array(*band_cols)).alias("bb")
    ).select(
        id_col, "__sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    return (
        bucket_pair_candidates(
            buckets,
            id_col=id_col,
            bucket_cols=("band", "bucket"),
            order_col="__sig",
            hot_bucket_cap=hot_bucket_cap,
            chain_window=chain_window,
        )
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """n-gram Jaccard similarity: jaccard = |A∩B| / (|A|+|B|−|A∩B|) over
    distinct shingle sets. Pairs sharing zero shingles are never emitted.

    With ``candidates`` (doc_a, doc_b) — the scale path — each candidate
    pair is verified by joining the two docs' shingle SETS (collected
    per-doc arrays, ~tens of elements) and intersecting: linear in
    |candidates|, no shingle self-join anywhere. Without candidates it
    computes all same-shingle pairs — only for small corpora / oracles.
    """
    sh = shingles(df, text_col, shingle_n, id_col)
    if candidates is not None:
        sets = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("shset"))
        a = sets.select(F.col(id_col).alias("doc_a"), F.col("shset").alias("__set_a"))
        b = sets.select(F.col(id_col).alias("doc_b"), F.col("shset").alias("__set_b"))
        out = (
            candidates.select("doc_a", "doc_b")
            .distinct()
            .join(a, "doc_a")
            .join(b, "doc_b")
            .withColumn(
                "n_common",
                F.size(F.array_intersect(F.col("__set_a"), F.col("__set_b"))).cast("long"),
            )
            .filter(F.col("n_common") >= 1)
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_common")
                    / (
                        F.size("__set_a") + F.size("__set_b") - F.col("n_common")
                    ).cast("double"),
                    6,
                ),
            )
            .select("doc_a", "doc_b", "n_common", "jaccard")
        )
    else:
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
        a = sh.alias("sa")
        b = sh.alias("sb")
        common = (
            a.join(
                b,
                (F.col("sa.shingle") == F.col("sb.shingle"))
                & (F.col(f"sa.{id_col}") < F.col(f"sb.{id_col}")),
            )
            .groupBy(
                F.col(f"sa.{id_col}").alias("doc_a"), F.col(f"sb.{id_col}").alias("doc_b")
            )
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        sz_a = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
        sz_b = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
        out = (
            common.join(sz_a, "doc_a")
            .join(sz_b, "doc_b")
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_common")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")).cast("double"),
                    6,
                ),
            )
            .select("doc_a", "doc_b", "n_common", "jaccard")
        )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def jaccard_prefix_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT token-Jaccard threshold self-join via prefix filtering
    (AllPairs / PPJoin family, Bayardo et al. WWW'07): every pair with
    Jaccard ≥ threshold over distinct whitespace-token sets, with NO
    probabilistic recall loss — the deterministic complement to the
    MinHash-LSH path when the SLA says "find ALL near-duplicates".

    Completeness: order the vocabulary globally by (document frequency,
    token) — rarest first — and keep each doc's first
    |T| − ceil(t·|T|) + 1 tokens in that order. J(A,B) ≥ t implies
    |A∩B| ≥ t·max(|A|,|B|), and two sets sharing ≥ c elements under a
    COMMON total order must intersect within their (size − c + 1)-
    prefixes (pigeonhole) — so the prefix equi-join yields a candidate
    superset, and the exact set-intersection verify keeps truth only.

    Scale shape: candidate generation joins PREFIX tokens only — by
    construction the globally rarest per doc, so per-token bucket sizes
    in the self-join stay small exactly where a naive token self-join
    explodes (stopwords are never anyone's prefix at t ≥ ~0.3). Verify
    is linear in candidates over per-doc token ARRAYS (array_intersect,
    no second shuffle per pair). Docs with an IDENTICAL DISTINCT-TOKEN
    SET are collapsed to one representative BEFORE any pairwise work
    (Jaccard depends only on the set, so this is exact — and strictly
    coarser than an identical-normalized-text collapse: token-order and
    repetition variants of one set share a representative too): the
    prefix join and the per-pair verify run over representatives only,
    then cluster members are expanded back into pairs afterward —
    cross-cluster values depend only on the representatives, and
    within-cluster pairs are Jaccard 1.0 BY CONSTRUCTION. A
    clone-saturated corpus thus pays quadratic cost only in the final
    row EXPANSION (the output's own size — a join that just
    materializes rows), never in hashing, shuffling, or array
    intersection. The whole plan scans `df` ONCE: the set frame below
    carries every downstream need (fingerprints, sizes, prefix tokens,
    verify arrays).
    """
    # --- token-set collapse: one representative per distinct token SET.
    # `docsets` is O(docs) rows (id, sorted set array, set fingerprint) —
    # the single scan of df, checkpointed once and feeding everything.
    toks_all = (
        df.select(
            F.col(id_col),
            F.explode(F.split(normalized(F.col(text_col)), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    docsets = (
        toks_all.groupBy(id_col)
        .agg(F.array_sort(F.collect_set("tok")).alias("__set"))
        .withColumn("__fp", F.md5(F.to_json("__set")))
        .localCheckpoint(eager=True)
    )
    reps = docsets.groupBy("__fp").agg(F.min(id_col).alias("__rep"))
    # docs with an empty token set never reach docsets (explode emits no
    # rows) — by contract they pair with nothing, so membership skips them
    members = docsets.select(id_col, "__fp").join(reps, "__fp")
    # representative set frame: verify side of the candidate joins (twice)
    # + the within-cluster n_common source. Checkpointing it (a) stops the
    # groupBy+semi chain re-running per consumer and (b) gives AQE a real
    # O(reps) size so the verify joins broadcast the set side instead of
    # sort-merging the multi-million-row candidate stream (measured
    # 106 s → ~35 s at sf0.1 on the clone-saturated corpus)
    rep_sets = (
        docsets.join(reps.select(F.col("__rep").alias(id_col)), id_col, "semi")
        .withColumn("__sz", F.size("__set"))
        .localCheckpoint(eager=True)
    )
    # prefix tokens re-derive from the checkpointed arrays — no second
    # scan of df, and the set size rides the explode (no sizes join)
    toks = rep_sets.select(id_col, "__sz", F.explode("__set").alias("tok"))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__df"))
    from pyspark.sql import Window as _W

    rarity = _W.partitionBy(id_col).orderBy("__df", "tok")
    # the 1e-9 inside ceil() guards the float boundary: 0.9 * 20 is
    # 18.000000000000004 in binary, and a bare ceil would demand overlap
    # ≥ 19 where the exact bound is 18 — shortening the prefix BELOW the
    # completeness guarantee. Subtracting epsilon can only lengthen the
    # prefix (more candidates, never fewer), so completeness is safe in
    # both rounding directions.
    # TWO prefix lengths per doc (Xiao et al., PPJoin/ED-Join family):
    # the PROBE prefix is the classic |T| − ceil(t·|T|) + 1; the INDEX
    # prefix is the shorter |T| − ceil(2t/(1+t)·|T|) + 1, valid for the
    # SMALLER set of a pair: with |A| ≤ |B| and J ≥ t, the equivalent
    # overlap bound o ≥ t/(1+t)(|A|+|B|) ≥ 2t/(1+t)·|A|, so the pair's
    # first common token (global rarity order) sits within A's first
    # |A| − o + 1 ≤ index-prefix positions — and within B's probe prefix
    # (o ≥ t/(1+t)(1+t)|B|·t/... ≥ t·|B| via |A| ≥ t·|B|). Joining
    # index-side(A) × probe-side(B) under the (size, id) total order
    # therefore still reaches every true pair, with ~((1−2t/(1+t))/(1−t))
    # of the raw join volume of the symmetric join (2/3 at t = 0.5).
    t_over = float(threshold) / (1.0 + float(threshold))
    prefix = (
        toks.join(dfreq, "tok")
        .withColumn("__rn", F.row_number().over(rarity))
        .filter(
            F.col("__rn")
            <= F.col("__sz")
            - F.ceil(F.lit(threshold) * F.col("__sz") - F.lit(1e-9))
            + 1
        )
        .withColumn(
            "__idx",
            F.col("__rn")
            <= F.col("__sz")
            - F.ceil(F.lit(2.0 * t_over) * F.col("__sz") - F.lit(1e-9))
            + 1,
        )
        .select(id_col, "tok", "__rn", "__sz", "__idx")
        .localCheckpoint(eager=True)
    )
    # Two classic AllPairs/PPJoin prunes applied ROW-LEVEL on the joined
    # prefix stream, BEFORE the distinct shuffle and the per-pair verify:
    # (a) length filter — J ≥ t forces min(|A|,|B|) ≥ t·max(|A|,|B|);
    # (b) positional filter — at the pair's FIRST common token (ranks
    #     i, j in the global rarity order) every other common token is
    #     ranked after it in BOTH docs, so |A∩B| ≤ 1 + min(|A|−i, |B|−j),
    #     which must reach the equivalent overlap bound t/(1+t)·(|A|+|B|).
    # The positional bound is only valid at the first common token, but
    # that token is always in both effective prefixes whenever the pair
    # is true (the asymmetric-prefix argument above), so each true pair
    # survives via that row and the post-filter distinct keeps it —
    # completeness intact, candidate volume cut before it is ever
    # shuffled. Epsilons keep both prunes conservative at float
    # boundaries. doc_a is always the (size, id)-smaller side here; the
    # expansion's least/greatest normalizes ids for the output.
    cand = (
        prefix.filter(F.col("__idx"))
        .select(
            F.col(id_col).alias("doc_a"),
            "tok",
            F.col("__rn").alias("__rna"),
            F.col("__sz").alias("__sa"),
        )
        .join(
            prefix.select(
                F.col(id_col).alias("doc_b"),
                "tok",
                F.col("__rn").alias("__rnb"),
                F.col("__sz").alias("__sb"),
            ),
            "tok",
        )
        .filter(
            (F.col("__sa") < F.col("__sb"))
            | ((F.col("__sa") == F.col("__sb")) & (F.col("doc_a") < F.col("doc_b")))
        )
        .filter(
            F.col("__sa") >= F.lit(threshold) * F.col("__sb") - F.lit(1e-9)
        )
        .filter(
            (
                F.lit(1)
                + F.least(
                    F.col("__sa") - F.col("__rna"),
                    F.col("__sb") - F.col("__rnb"),
                )
            )
            >= F.lit(t_over) * (F.col("__sa") + F.col("__sb")) - F.lit(1e-9)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    verified = (
        cand.join(rep_sets.select(F.col(id_col).alias("doc_a"), F.col("__set").alias("__sa")), "doc_a")
        .join(rep_sets.select(F.col(id_col).alias("doc_b"), F.col("__set").alias("__sb")), "doc_b")
        .withColumn(
            "n_common",
            F.size(F.array_intersect("__sa", "__sb")).cast("long"),
        )
        .withColumn(
            "jaccard_raw",
            F.col("n_common")
            / (F.size("__sa") + F.size("__sb") - F.col("n_common")).cast("double"),
        )
        # threshold on the UNROUNDED ratio (integer inputs + one division:
        # bit-identical on any engine); round only the reported value
        .filter(F.col("jaccard_raw") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.round(F.col("jaccard_raw") + 1e-12, 6).alias("jaccard"),
        )
    )
    # --- expansion back to document-level pairs. Cross-cluster: every
    # (member of A) × (member of B) pair inherits the representatives'
    # n_common/jaccard verbatim (identical token sets); clusters are
    # disjoint so least/greatest emits each unordered pair exactly once.
    cross = (
        verified.join(
            members.select(
                F.col("__rep").alias("doc_a"), F.col(id_col).alias("__ida")
            ),
            "doc_a",
        )
        .join(
            members.select(
                F.col("__rep").alias("doc_b"), F.col(id_col).alias("__idb")
            ),
            "doc_b",
        )
        .select(
            F.least("__ida", "__idb").alias("doc_a"),
            F.greatest("__ida", "__idb").alias("doc_b"),
            "n_common",
            "jaccard",
        )
    )
    if threshold > 1.0:
        return cross
    # Within-cluster: identical token sets ⇒ n_common = |set|, J = 1.0.
    # (Empty-token docs never entered membership, so no exclusion join
    # is needed here.)
    within = (
        members.select("__fp", F.col(id_col).alias("__wa"), "__rep")
        .join(
            members.select("__fp", F.col(id_col).alias("__wb")), "__fp"
        )
        .filter(F.col("__wa") < F.col("__wb"))
        .join(
            rep_sets.select(
                F.col(id_col).alias("__rep"),
                F.col("__sz").cast("long").alias("n_common"),
            ),
            "__rep",
        )
        .select(
            F.col("__wa").alias("doc_a"),
            F.col("__wb").alias("doc_b"),
            "n_common",
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(within)


def containment_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT shingle-containment join (Broder's asymmetric resemblance):
    every ORDERED pair where |S(A) ∩ S(B)| / |S(A)| ≥ threshold over
    distinct word n-gram shingles — the quote/subset detector Jaccard
    misses (a paragraph fully quoted inside a much longer doc has high
    containment but low Jaccard, since the union is dominated by B).

    Completeness (prefix filtering, one-sided): containment ≥ t needs
    c = ⌈t·|A|⌉ common shingles, so under a global (rarity, shingle)
    total order the pair's first common shingle sits within A's first
    |A| − c + 1 positions (pigeonhole) — candidates come from A's
    rarity-ordered PROBE PREFIX joined against B's FULL ranked list
    (containment puts no lower bound on |B|'s overlap share, so the
    container side cannot be prefix-shortened). The positional prune
    (overlap ≤ 1 + min(|A|−rnA, |B|−rnB) at that first common shingle,
    valid because every other common shingle ranks after it in BOTH
    lists) cuts the stream before the distinct shuffle.

    Scale shape: identical-shingle-set docs collapse to one
    representative first (containment depends only on the sets), so a
    clone-saturated corpus pays pairwise cost once per distinct set and
    quadratic cost only in the output expansion; candidate volume is
    Σ_{prefix shingles} df(shingle), and probe prefixes hold each doc's
    globally RAREST shingles. Verify is one array_intersect per
    candidate — integer counts and a single double division, so the
    oracle's brute-force all-pairs result matches exactly.
    """
    sh = shingles(df, text_col=text_col, n=shingle_n, id_col=id_col)
    docsets = (
        sh.groupBy(id_col)
        .agg(F.array_sort(F.collect_set("shingle")).alias("__set"))
        .withColumn("__fp", F.md5(F.to_json("__set")))
        .localCheckpoint(eager=True)
    )
    reps = docsets.groupBy("__fp").agg(F.min(id_col).alias("__rep"))
    members = docsets.select(id_col, "__fp").join(reps, "__fp")
    rep_sets = (
        docsets.join(reps.select(F.col("__rep").alias(id_col)), id_col, "semi")
        .withColumn("__sz", F.size("__set"))
        .localCheckpoint(eager=True)
    )
    toks = rep_sets.select(id_col, "__sz", F.explode("__set").alias("tok"))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__df"))
    from pyspark.sql import Window as _W

    rarity = _W.partitionBy(id_col).orderBy("__df", "tok")
    ranked = (
        toks.join(dfreq, "tok")
        .withColumn("__rn", F.row_number().over(rarity))
        .select(id_col, "tok", "__rn", "__sz")
        .localCheckpoint(eager=True)
    )
    # probe prefix: |A| − ceil(t·|A|) + 1 (the 1e-9 guards the float
    # boundary conservatively — see jaccard_prefix_join)
    probe = ranked.filter(
        F.col("__rn")
        <= F.col("__sz") - F.ceil(F.lit(threshold) * F.col("__sz") - F.lit(1e-9)) + 1
    )
    cand = (
        probe.select(
            F.col(id_col).alias("__a"),
            "tok",
            F.col("__rn").alias("__rna"),
            F.col("__sz").alias("__sa"),
        )
        .join(
            ranked.select(
                F.col(id_col).alias("__b"),
                "tok",
                F.col("__rn").alias("__rnb"),
                F.col("__sz").alias("__sb"),
            ),
            "tok",
        )
        .filter(F.col("__a") != F.col("__b"))
        .filter(
            (
                F.lit(1)
                + F.least(
                    F.col("__sa") - F.col("__rna"),
                    F.col("__sb") - F.col("__rnb"),
                )
            )
            >= F.lit(threshold) * F.col("__sa") - F.lit(1e-9)
        )
        .select("__a", "__b")
        .distinct()
    )
    verified = (
        cand.join(
            rep_sets.select(F.col(id_col).alias("__a"), F.col("__set").alias("__seta")),
            "__a",
        )
        .join(
            rep_sets.select(F.col(id_col).alias("__b"), F.col("__set").alias("__setb")),
            "__b",
        )
        .withColumn(
            "n_common", F.size(F.array_intersect("__seta", "__setb")).cast("long")
        )
        .withColumn(
            "cont_raw",
            F.col("n_common").cast("double") / F.size("__seta").cast("double"),
        )
        .filter(F.col("cont_raw") >= threshold)
        .select(
            "__a",
            "__b",
            "n_common",
            F.round(F.col("cont_raw") + 1e-12, 6).alias("containment"),
        )
    )
    # expansion: ORDERED pairs (contained → container), clusters disjoint
    cross = (
        verified.join(
            members.select(F.col("__rep").alias("__a"), F.col(id_col).alias("__ida")),
            "__a",
        )
        .join(
            members.select(F.col("__rep").alias("__b"), F.col(id_col).alias("__idb")),
            "__b",
        )
        .select(
            F.col("__ida").alias("contained_id"),
            F.col("__idb").alias("container_id"),
            "n_common",
            "containment",
        )
    )
    # within-cluster: identical sets ⇒ containment 1.0 BOTH directions
    within = (
        members.select("__fp", F.col(id_col).alias("__wa"), "__rep")
        .join(members.select("__fp", F.col(id_col).alias("__wb")), "__fp")
        .filter(F.col("__wa") != F.col("__wb"))
        .join(
            rep_sets.select(
                F.col(id_col).alias("__rep"), F.col("__sz").cast("long").alias("n_common")
            ),
            "__rep",
        )
        .select(
            F.col("__wa").alias("contained_id"),
            F.col("__wb").alias("container_id"),
            "n_common",
            F.lit(1.0).alias("containment"),
        )
    )
    return cross.unionByName(within)


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """SimHash 64-bit signature per document, fully NATIVE (no UDF).

    Classic Charikar construction: token hashes from stable md5, each bit
    position accumulates ±weight where weight = term frequency (frequency
    weighting separates documents that share a vocabulary but differ in
    composition — an unweighted set-based simhash degenerates on low-entropy
    corpora). The per-token Counter of the textbook formulation is
    algebraically unnecessary: the contribution is linear in the weight, so
    summing ±1 per token INSTANCE equals summing ±tf per distinct token.
    That collapses the plan to explode → ONE partial-aggregable
    groupBy(doc) with 64 conditional sums (map-side combine does most of
    the work; no (doc, token) shuffle, no Arrow hop) → sign bits folded
    into a signed 64-bit value JVM-side.

    The token hash is the first 8 bytes of md5 big-endian, taken as two
    32-bit halves via conv(hex, 16, 10) so every bit test stays in
    non-negative long arithmetic (portable to any SQL engine — the DuckDB
    oracle mirrors it literally).
    """
    if bits != 64:
        raise ValueError("native simhash is fixed at 64 bits")
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("__tok"),
    ).filter(F.col("__tok") != "")
    md5 = F.md5(F.col("__tok"))
    hashed = toks.select(
        F.col(id_col),
        F.conv(F.substring(md5, 1, 8), 16, 10).cast("long").alias("__hi"),
        F.conv(F.substring(md5, 9, 8), 16, 10).cast("long").alias("__lo"),
    )
    aggs = []
    for i in range(64):
        src = F.col("__lo") if i < 32 else F.col("__hi")
        bit = F.shiftright(src, i % 32).bitwiseAND(F.lit(1))
        aggs.append(
            F.sum(F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))).alias(f"__a{i}")
        )
    acc = hashed.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for i in range(64):
        weight = (1 << i) if i < 63 else -(1 << 63)  # sign bit = long wrap
        sig = sig + F.when(F.col(f"__a{i}") > 0, F.lit(weight)).otherwise(
            F.lit(0)
        ).cast("long")
    # empty/whitespace-only/null text yields no tokens: signature 0
    return (
        df.select(id_col)
        .join(acc.select(F.col(id_col), sig.alias("simhash")), id_col, "left")
        .select(
            F.col(id_col), F.coalesce(F.col("simhash"), F.lit(0).cast("long")).alias("simhash")
        )
    )


def simhash_near_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, join-based rather than
    all-pairs: candidates must share one exact 16-bit signature chunk.

    Recall guarantee (pigeonhole over 4 chunks): exact for max_hamming <= 3;
    above that the chunk-join is best-effort (a pair differing in all 4
    chunks is missed) — the standard SimHash banding trade-off. Keep
    max_hamming small: the candidate count grows quadratically with radius
    on low-entropy corpora."""
    sig = simhash_signatures(df, text_col, id_col)
    chunks = [
        F.struct(
            F.lit(i).alias("chunk"),
            F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("v"),
        )
        for i in range(4)
    ]
    keyed = sig.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*chunks)).alias("c")
    ).select(id_col, "simhash", F.col("c.chunk").alias("chunk"), F.col("c.v").alias("v"))
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "doc_a", "doc_b", "hamming"
    )


def dup_groups(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
    local_finish_edges: int = 100_000,
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, group_id), where
    group_id is the minimum doc_id in the component.

    Pair emitters (LSH/SimHash/Jaccard) produce edges; dedup policy needs
    GROUPS ("keep one doc per duplicate cluster"), which is transitive
    closure. Algorithm: alternating large-star / small-star contraction
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond"),
    chosen over hash-min label propagation because label propagation needs
    rounds = component DIAMETER — fine for shallow near-dup cliques, but a
    low-threshold semantic-similarity graph already measured diameter ~11
    at sf0.1, and a chain of borderline near-dups at 100 TB has no
    diameter bound at all. Star contraction REWIRES the edge set toward
    the component minimum every round and converges in O(log² n) rounds
    regardless of shape (a path collapses exponentially, see the round
    log in SCALECHECK.md), with every round a node-keyed groupBy-min +
    equi-join + distinct — no unbounded driver-side state, so 100 TB
    edge sets stream through the same shuffles (the ONLY collect is the
    ``local_finish_edges``-gated finish below, bounded by a measured
    count).

    Invariant: edges are kept CANONICAL, (hi, lo) with hi > lo. One round =
      large-star: every node u computes m = min(closed neighborhood);
        each neighbor v > u is re-linked to m (emitted as (v, m), canonical
        because m ≤ u < v);
      small-star: over canonical edges grouped by hi, m = min(lo); every
        smaller neighbor and hi itself re-link to m.
    Both steps preserve connectivity and only ever link a node to a
    SMALLER node of its own component, so the fixpoint — a set of disjoint
    stars — has every component's nodes linked directly to the component
    min, which is exactly the (doc_id, group_id) contract. Convergence is
    set-stability (same count and no new edge), checked per round on the
    materialized frames; lineage is truncated per round (localCheckpoint)
    so the plan does not grow with iterations.

    ``local_finish_edges``: after each round's materializing agg (whose
    count is already in hand, so the gate costs nothing), an edge set
    measured at or below this bound finishes by exact union-find on the
    driver — a bounded model-artifact-sized collect, same class as the
    BPE merge table or broadcast k-means centroids — replacing O(log n)
    further rounds of fixed-cost multi-stage jobs. At corpus scale the
    contracted edge set is O(duplicate docs) and stays over the bound, so
    the distributed loop carries it; the gate is a measured count, never
    a guess. 0 disables.
    """
    def _materialize(frame: DataFrame) -> tuple[DataFrame, int, int]:
        """LAZY localCheckpoint, then one agg action that both materializes
        the checkpoint blocks and returns (count, xor-of-edge-hashes) —
        one Spark job where eager-checkpoint-then-count was two. The hash
        xor only GATES the exact convergence probe below (a changed edge
        set almost surely changes it, so the probe is skipped for free);
        convergence itself is never decided by the hash."""
        frame = frame.localCheckpoint(eager=False)
        # bit_xor, not sum: summing signed 64-bit hashes overflows, which
        # ANSI mode (the Spark 4 default in foreign sessions) turns into
        # ARITHMETIC_OVERFLOW; xor is wrap-free, order-insensitive, and an
        # equally good set fingerprint over the round's distinct edges
        row = frame.agg(
            F.count(F.lit(1)), F.expr("bit_xor(xxhash64(hi, lo))")
        ).first()
        return frame, int(row[0]), (0 if row[1] is None else int(row[1]))

    # The emitters produce distinct a<b pairs, so no distinct here; callers
    # passing duplicated pairs only cost round-1 join rows — the per-round
    # distinct absorbs them, correctness is unchanged. The input IS
    # materialized by its own (count, hash) agg — the blocks would be
    # computed by round 1 regardless, so the extra cost is one tiny agg
    # over persisted partitions — because that measured count lets a
    # small input take the local finish BEFORE paying a full contraction
    # round (the common case for verified near-dup graphs at test scale),
    # and it seeds the convergence fingerprint so an input that is
    # already a fixpoint converges after ONE round instead of two.
    raw = pairs.select(
        F.greatest(F.col(id_a), F.col(id_b)).alias("hi"),
        F.least(F.col(id_a), F.col(id_b)).alias("lo"),
    ).filter(F.col("hi") != F.col("lo"))
    edges, in_count, in_check = _materialize(raw)
    if local_finish_edges and in_count <= local_finish_edges:
        return _local_components(edges)
    prev_count: int | None = in_count
    prev_check = in_check
    for _ in range(max_iter):
        sym = edges.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).union(edges.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("__mn"))
            .select("u", F.least("u", "__mn").alias("m"))
        )
        # no distinct here: each sym edge with v > u joins exactly ONE mins
        # row, so |large| = |edges| — bounded without it; duplicate (hi, lo)
        # rows (same target reached via different u) are harmless to the
        # min-aggregation below and collapsed by the round's final
        # distinct, so skipping this exchange saves one full shuffle per
        # round at identical output.
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
        )
        small_min = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(small_min, "hi")
            .select(F.col("lo").alias("w"), F.col("m"))
            .union(small_min.select(F.col("hi").alias("w"), F.col("m")))
            .filter(F.col("w") != F.col("m"))
            .select(F.col("w").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # one action per round: both stars materialize as a single fused
        # plan whose terminal agg doubles as the convergence fingerprint.
        # The EXACT probe (counts equal ⇒ one-direction exceptAll empty ⇔
        # sets equal) only runs when count AND hash-sum both match, which
        # outside a hash collision happens exactly once, at the fixpoint —
        # a collision merely runs the probe a round early and the probe
        # answers exactly, so convergence is never probabilistic.
        new_edges, new_count, new_check = _materialize(small)
        converged = (
            prev_count is not None
            and new_count == prev_count
            and new_check == prev_check
            and new_edges.exceptAll(edges).limit(1).count() == 0
        )
        # the previous round's checkpointed blocks are dead once the new
        # round is materialized — drop them so a long session (bench loop,
        # streaming foreachBatch reuse) doesn't accrete block-manager state
        try:
            edges.unpersist()
        except Exception:
            pass
        edges = new_edges
        prev_count, prev_check = new_count, new_check
        if converged:
            break
        if local_finish_edges and new_count <= local_finish_edges:
            # the count is already in hand from the materializing agg, so
            # this gate costs zero extra jobs; below the bound an exact
            # driver union-find replaces every remaining round
            return _local_components(edges)
    # fixpoint is disjoint stars: hi values are the non-root members (one
    # row each, pointing at their component min), lo values the roots
    roots = (
        edges.select(F.col("lo").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("group_id"))
    )
    return edges.select(
        F.col("hi").alias("doc_id"), F.col("lo").alias("group_id")
    ).union(roots)


def _local_components(edges: DataFrame) -> DataFrame:
    """Exact union-find over a MEASURED-small canonical (hi, lo) edge set
    — the driver-side finish for dup_groups once contraction has shrunk
    the graph under its bound. Roots stay at the component minimum (every
    union links the larger root under the smaller), so the output is the
    same (doc_id, group_id) rows the distributed fixpoint produces."""
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for row in edges.collect():  # bounded by local_finish_edges
        hi, lo = row[0], row[1]
        for v in (hi, lo):
            if v not in parent:
                parent[v] = v
        a, b = find(hi), find(lo)
        if a != b:
            if b < a:
                a, b = b, a
            parent[b] = a
    schema = T.StructType(
        [
            T.StructField("doc_id", edges.schema.fields[0].dataType),
            T.StructField("group_id", edges.schema.fields[1].dataType),
        ]
    )
    rows = [(n, find(n)) for n in parent]
    return edges.sparkSession.createDataFrame(rows, schema)


def dedup_near_keep_one(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """The dedup pipeline's end product: the corpus with near-duplicate
    CLUSTERS collapsed to one canonical document each (the min-id member),
    while documents in no cluster pass through untouched.

    The loser set is O(docs in any candidate pair) — at web-corpus dup
    rates (30-50%) that is O(corpus), so the anti join must NOT force a
    broadcast (a forced hint would OOM the driver at 100 TB). Left
    unhinted, AQE promotes it to a broadcast join whenever the runtime
    size is actually small and falls back to a shuffled hash anti join
    on the id column otherwise — both scale-safe.
    """
    groups = dup_groups(pairs, id_a=id_a, id_b=id_b)
    losers = groups.filter(F.col("doc_id") != F.col("group_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def near_dup_members(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    hot_bucket_cap: int | None = 1024,
    chain_window: int = 8,
) -> DataFrame:
    """(doc_id, group_id) for EVERY document, group_id = its near-dup
    cluster's min id (a singleton labels itself, so survivors are exactly
    the rows with doc_id == group_id) — the clustering layer the curation
    capstones consume, built to survive heavy EXACT duplication.

    Signatures are keyed by the normalized-text FINGERPRINT, not the doc:
    the shingle explode + salted-min hashing runs map-side over the raw
    scan (fully parallel at any size, duplicates cost linear CPU) and the
    signature agg collapses exact clones into one row per distinct text —
    so the LSH bucket self-join sees each text once and a duplication
    factor K can never inflate the candidate set quadratically (the 10×
    replica stress measured that super-linear before the collapse).
    Components are unchanged: an exact clone set is a clique through its
    fingerprint (Jaccard = 1 shares every band), so cluster membership
    and min ids are identical to pairing over all documents.

    A rep-docs-THEN-shingle formulation (aggregate texts first, hash the
    representatives) is equivalent but an AQE trap: the tiny agg output
    coalesces to few partitions and the expensive hashing chain goes
    serial. Keying the one signature agg by fingerprint keeps the heavy
    work before the shuffle.

    The clone collapse kills the COMMON quadratic (exact duplicates); the
    residual one — many DISTINCT near-identical texts hashing to one hot
    bucket — is bounded by ``hot_bucket_cap``: since this function's
    output is GROUPS (connected components), hot buckets only need a
    connected chain of candidate pairs, not the full clique, so members
    over the cap pair with their ``chain_window`` nearest signature-sorted
    neighbors (see ``bucket_pair_candidates``). The default cap (1024) is
    ~15× the largest organic bucket observed at sf0.1, so results are
    bitwise-unchanged at oracle scale and bounded on adversarial corpora.
    """
    keyed = df.select(
        F.col(id_col), F.col(text_col),
        F.md5(normalized(F.col(text_col))).alias("__fp"),
    )
    sh = shingles(keyed, text_col, shingle_n, id_col="__fp")
    sig = sh.groupBy("__fp").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{k}|"), F.col("shingle")))).alias(f"mh_{k}")
            for k in range(num_hashes)
        ]
    )
    id_map = keyed.select(id_col, "__fp")
    rep_ids = id_map.groupBy("__fp").agg(F.min(id_col).alias("rep_id"))
    rows = num_hashes // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws("|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)])
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    full_sig = F.concat_ws("|", *[F.col(f"mh_{k}") for k in range(num_hashes)])
    buckets = (
        sig.join(rep_ids, "__fp")
        .select(
            F.col("rep_id"),
            full_sig.alias("__sig"),
            F.explode(F.array(*band_cols)).alias("bb"),
        )
        .select(
            "rep_id",
            "__sig",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
    )
    pairs = (
        bucket_pair_candidates(
            buckets,
            id_col="rep_id",
            bucket_cols=("band", "bucket"),
            order_col="__sig",
            hot_bucket_cap=hot_bucket_cap,
            chain_window=chain_window,
        )
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
        .distinct()
    )
    rep_groups = dup_groups(pairs).select(
        F.col("doc_id").alias("rep_id"), F.col("group_id").alias("__rg")
    )
    # rep_groups is O(reps in any candidate pair) — unbounded at high dup
    # rates, so no forced broadcast; AQE promotes it when actually small.
    return (
        id_map.join(rep_ids, "__fp")
        .join(rep_groups, "rep_id", "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__rg"), F.col("rep_id")).alias("group_id"),
        )
    )


def dedup_near_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Cluster dedup keeping the BEST member, not the min id: within every
    near-dup cluster the survivor is the document with the highest
    ``score_col`` (id as the deterministic tiebreak) — the policy real
    curation pipelines want once a quality score exists, since the min-id
    member of a cluster is arbitrary.

    Same join shape as ``dedup_near_keep_one``: clustered docs are
    O(pair members), so their scores join the groups table, max_by picks
    the keeper per cluster, and the loser list anti-joins the corpus.
    None of these joins force a broadcast — the clustered-member tables
    are O(duplicates), unbounded at web-corpus dup rates, so AQE decides
    broadcast-vs-shuffle from the measured runtime size.
    """
    groups = dup_groups(pairs, id_a=id_a, id_b=id_b)
    scored = groups.join(
        df.select(F.col(id_col).alias("doc_id"), F.col(score_col).alias("__s")),
        "doc_id",
    )
    keepers = scored.groupBy("group_id").agg(
        F.max_by(
            "doc_id", F.struct(F.col("__s"), F.col("doc_id").cast("double") * -1)
        ).alias("keep_id")
    )
    losers = (
        scored.join(keepers, "group_id")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism IF its current plan has fewer partitions — the guide §2.5
    remedy for compact inputs (one advisory-sized commit file = one
    parquet row group = one task) that would otherwise serialize the
    explode-heavy shingle/MinHash stages downstream. Data-derived gate:
    a production-scale store (files >= cores) passes through untouched,
    so the store is never shuffled at 100 TB; locally the shuffle moves
    only the few MB that fit in one file. Values are unchanged (every
    consumer here is row-order-insensitive).

    Probe cost (r9 verdict note): ``df.rdd`` forces one analysis +
    physical-planning pass of the input frame to expose its partitioning
    — no Spark job runs and no rows convert (``getNumPartitions`` never
    evaluates the Python-serialization step ``.rdd`` appends). The
    callers here hand in plain table scans or checkpoint reads, where
    that planning is sub-millisecond; don't point this helper at a frame
    carrying a large unexecuted plan tree, whose planning pass would be
    paid twice (once here, once at the real action)."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def incremental_dedup(
    new_df: DataFrame,
    store_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Incremental corpus dedup: admit only the NEW documents that are
    neither exact nor near duplicates of anything already in the store —
    the shape every continuously-crawling training-data pipeline runs
    (dedup new batch AGAINST the corpus, never store×store again).

    Phase 1 (exact): anti join on md5(normalized text) — shuffle bytes are
    16 B per doc regardless of document size.
    Phase 2 (near): MinHash band buckets for BOTH sides, but the bucket
    join is strictly cross-corpus (new ⋈ store), so its cost is
    O(candidates involving the new batch) — the store's own near-dup pairs
    are never recomputed. Candidates are verified with exact shingle-set
    Jaccard before a new doc is rejected.

    Requires globally-unique ids across both frames (true for any store
    with a content-addressed or snowflake id scheme).
    """
    # Re-parallelize compact inputs (guide §2.5 input-skew rule: an
    # unsplittable/few-file source serializes everything downstream —
    # r9 measured the store-side minhash at 4.2-5.8 s from a single
    # advisory-sized commit file vs 0.6-0.8 s at 32 scan partitions,
    # because one parquet row group = one task for the shingle explode).
    # The gate is data-derived: only frames whose scan partitioning is
    # below the session's default parallelism are shuffled, so at
    # production scale (many advisory-sized files) this is a no-op and
    # the store is never re-shuffled.
    new_df = _ensure_parallelism(new_df)
    store_df = _ensure_parallelism(store_df)
    new_h = new_df.withColumn("__fp", F.md5(normalized(F.col(text_col))))
    store_fp = store_df.select(F.md5(normalized(F.col(text_col))).alias("__fp")).distinct()
    fresh = new_h.join(store_fp, "__fp", "left_anti")

    rows = num_hashes // bands

    def _buckets(df: DataFrame) -> DataFrame:
        sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws("|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)])
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
        return sig.select(
            F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
        ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    nb = _buckets(fresh).withColumnRenamed(id_col, "new_id")
    sb = _buckets(store_df).withColumnRenamed(id_col, "store_id")
    cand = (
        nb.join(sb, ["band", "bucket"])
        .select("new_id", "store_id")
        .distinct()
    )

    new_sets = shingles(fresh, text_col, shingle_n, id_col).groupBy(id_col).agg(
        F.collect_set("shingle").alias("__set_n")
    ).withColumnRenamed(id_col, "new_id")
    store_sets = shingles(store_df, text_col, shingle_n, id_col).groupBy(id_col).agg(
        F.collect_set("shingle").alias("__set_s")
    ).withColumnRenamed(id_col, "store_id")
    near_dup_ids = (
        cand.join(new_sets, "new_id")
        .join(store_sets, "store_id")
        .withColumn(
            "__common", F.size(F.array_intersect(F.col("__set_n"), F.col("__set_s")))
        )
        .filter(F.col("__common") >= 1)
        .withColumn(
            "__j",
            F.col("__common")
            / (F.size("__set_n") + F.size("__set_s") - F.col("__common")).cast("double"),
        )
        .filter(F.col("__j") >= threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return (
        fresh.join(near_dup_ids, id_col, "left_anti")
        .select(id_col, F.col("__fp").alias("fingerprint"))
    )


def contamination_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_mod: int = 20,
    shingle_n: int = 3,
) -> DataFrame:
    """Eval-set decontamination audit: for each eval document, the fraction
    of its distinct word n-gram shingles that occur anywhere in the training
    corpus — the membership/contamination check every LLM eval pipeline runs
    before trusting a benchmark number.

    Eval membership is a deterministic id predicate (``id % eval_mod == 0``)
    so the audit is reproducible; in production the eval set is its own
    table and the predicate is a semi-join.

    Scale shape: train shingles are aggregated to ``(shingle,
    n_train_docs)`` BEFORE the join, so the join's build side is the
    distinct-shingle vocabulary, not the corpus; one shuffle on shingle,
    one on eval doc id. The eval side is tiny by construction (5%), so at
    100 TB the per-shingle train stats can also be pre-materialized once
    and reused across eval suites.

    Reference analog: none — the reference has no corpus operators at all;
    this is the BASELINE.json north-star text surface.
    """
    is_eval = F.pmod(F.col(id_col), F.lit(eval_mod)) == 0
    ev_sh = shingles(df.filter(is_eval), text_col, shingle_n, id_col)
    train_stats = (
        shingles(df.filter(~is_eval), text_col, shingle_n, id_col)
        .groupBy("shingle")
        .agg(F.countDistinct(id_col).alias("n_train_docs"))
    )
    hit = F.when(F.col("n_train_docs").isNotNull(), 1).otherwise(0)
    return (
        ev_sh.join(train_stats, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(hit).alias("n_contaminated"),
            F.round(F.sum(hit) / F.count(F.lit(1)).cast("double"), 6).alias(
                "contaminated_frac"
            ),
            F.coalesce(F.max("n_train_docs"), F.lit(0)).alias("max_shingle_train_docs"),
        )
    )


def decontaminate_bloom_audit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_mod: int = 20,
    shingle_n: int = 3,
    expected_items: int = 1_000_000,
    expected_fpp: float = 0.001,
    fpp_bound_factor: float = 10.0,
) -> DataFrame:
    """Broadcast-Bloom decontamination with its accuracy contract IN the
    result (the sketch_accuracy pattern): the 100 TB plan for "drop every
    training doc sharing an n-gram with the eval set" is NOT a corpus-wide
    semi-join — it is eval shingles → ``bloom_filter_agg`` (a compact
    bitset, KBs–MBs) → broadcast → map-side ``might_contain`` riding the
    training scan, zero shuffle of the corpus. This audit runs that plan
    AND the exact semi-join ground truth side by side and emits one row:

      n_train_docs, n_exact_flagged (exact values the oracle pins),
      bloom_superset_ok  — every exactly-contaminated doc is bloom-flagged
                           (Bloom filters have no false negatives; FALSE
                           here means the plan is wrong, not unlucky),
      bloom_fp_ok        — falsely flagged clean docs stay within
                           ``fpp_bound_factor`` × the filter's design FPP
                           (generous: doc-level FPP compounds per shingle).

    The filter is built RELATIONALLY (OSS Spark exposes no
    ``bloom_filter_agg`` SQL function): the bitset is the DISTINCT table of
    set bit positions — ``pmod(xxhash64(shingle, seed_i), m)`` for k seeds
    over the eval shingles — broadcast against the training shingle
    stream; a train shingle "might be contained" iff ALL k of its
    positions join (count-distinct-seed == k). Identical membership
    semantics and FPP math to a packed bitset, every step a native
    expression, and the broadcast artifact is ≤ min(m, n·k) ints.

    At production scale only the bloom side runs, pre-filtering the corpus
    before the exact verify touches the survivors; the ok-flag contract is
    what licenses that swap, regression-guarded by the correctness gate."""
    is_eval = F.pmod(F.col(id_col), F.lit(eval_mod)) == 0
    ev_sh = (
        shingles(df.filter(is_eval), text_col, shingle_n, id_col)
        .select("shingle")
        .distinct()
    )
    k_hashes = max(1, round(-math.log(expected_fpp) / math.log(2)))
    n_bits = max(1024, int(expected_items * k_hashes / math.log(2)))

    def _pos(i: int):
        return F.pmod(F.xxhash64(F.col("shingle"), F.lit(i)), F.lit(n_bits))

    bits = ev_sh.select(
        F.explode(F.array(*[_pos(i) for i in range(k_hashes)])).alias("__bit")
    ).distinct()
    tr_sh = shingles(df.filter(~is_eval), text_col, shingle_n, id_col)
    tr_pos = tr_sh.select(
        F.col(id_col),
        "shingle",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("__i"), _pos(i).alias("__bit"))
                    for i in range(k_hashes)
                ]
            )
        ).alias("__p"),
    ).select(id_col, "shingle", F.col("__p.__i").alias("__i"), F.col("__p.__bit").alias("__bit"))
    # broadcast the bit table: the join evaluates map-side on the training
    # scan; a shingle passes iff every one of its k positions is set
    bloom_flagged = (
        tr_pos.join(F.broadcast(bits), "__bit")
        .groupBy(id_col, "shingle")
        .agg(F.countDistinct("__i").alias("__k"))
        .filter(F.col("__k") == k_hashes)
        .select(id_col)
        .distinct()
    )
    exact_flagged = (
        tr_sh.join(ev_sh, "shingle", "left_semi").select(id_col).distinct()
    )
    train_docs = df.filter(~is_eval).select(id_col).distinct()
    n_train = train_docs.count()
    n_exact = exact_flagged.count()
    missed = exact_flagged.join(bloom_flagged, id_col, "left_anti").count()
    false_pos = bloom_flagged.join(exact_flagged, id_col, "left_anti").count()
    clean = max(1, n_train - n_exact)
    fp_ok = false_pos <= max(5.0, fpp_bound_factor * expected_fpp * clean)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n_train, n_exact, missed == 0, bool(fp_ok))],
        "n_train_docs long, n_exact_flagged long, "
        "bloom_superset_ok boolean, bloom_fp_ok boolean",
    )


def split_leakage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    groups: DataFrame | None = None,
) -> DataFrame:
    """Train/val/test leakage audit: duplicate groups whose members land in
    MORE THAN ONE split — the evaluation-integrity bug class that id-hash
    splitting cannot prevent when the corpus holds the same text under
    different ids.

    Group key: exact (md5 of normalized text) by default; pass ``groups``
    (``dup_groups`` output: doc_id → group_id) to audit NEAR-duplicate
    clusters instead — the stricter gate a dataset release needs. With
    ``groups`` the join is inner: docs in no near-dup cluster are
    singletons and cannot leak, so they are pruned before the shuffle.

    One shuffle on the group key; output is O(leaky groups).
    """
    from market_data_pipeline_spark.operators.features import assign_split

    s = assign_split(df.select(id_col, text_col), id_col, train_pct, val_pct)
    if groups is not None:
        s = s.join(groups.select(F.col(id_col), "group_id"), id_col)
    else:
        s = s.withColumn("group_id", F.md5(normalized(F.col(text_col))))
    return (
        s.groupBy("group_id")
        .agg(
            F.countDistinct("split").alias("n_splits"),
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(F.array_sort(F.collect_set("split")), ",").alias("splits"),
            F.min(id_col).alias("min_doc_id"),
        )
        .filter(F.col("n_splits") > 1)
    )


def cdc_admission(
    changes: DataFrame,
    store_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    change_col: str = "_change_type",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Dedup admission over a FULL CDC batch (insert/update/delete — the
    shape ``tablefmt.snapshot_diff`` emits), closing the lifecycle that
    ``incremental_dedup`` opens with appends:

    - a DELETED doc is EVICTED from the admission reference: its
      fingerprint and LSH bands stop blocking future admissions (an
      incoming doc identical to a deleted one is admitted);
    - an UPDATED doc evicts its OLD fingerprint/signatures and its NEW
      text re-enters admission like an insert (it can be re-admitted
      under the new fingerprint, or rejected if the new text now
      collides with a surviving store doc);
    - an INSERT is checked against the surviving store, as before.

    Plan shape: eviction is ONE anti-join on the store frame BEFORE any
    signature work, so evicted docs' MinHash signatures and LSH bands
    are never even computed — at 100 TB the admission reference shrinks
    at plan time instead of carrying tombstone state. Everything
    downstream is ``incremental_dedup`` verbatim (exact md5 anti-join +
    strictly cross-corpus banded LSH + exact-Jaccard verification), so
    the two entry points cannot drift. Batch-internal duplicates keep
    ``incremental_dedup``'s contract: admission is vs the store; run a
    batch-local dedup pass separately if the feed can self-collide.

    Returns (id, fingerprint, change_type) for every ADMITTED insert /
    update. Store convergence (incremental maintenance ≡ from-scratch
    rebuild over the head snapshot) is pinned by
    test_cdc_admission_lifecycle_converges.
    """
    evicted = changes.filter(
        F.col(change_col).isin("delete", "update")
    ).select(id_col)
    effective = store_df.join(evicted, id_col, "left_anti")
    incoming = changes.filter(F.col(change_col).isin("insert", "update"))
    admitted = incremental_dedup(
        incoming.select(id_col, text_col),
        effective,
        text_col,
        id_col,
        num_hashes,
        bands,
        shingle_n,
        threshold,
    )
    return admitted.join(
        incoming.select(id_col, F.col(change_col).alias("change_type")), id_col
    ).select(id_col, "fingerprint", "change_type")
