"""Record linkage / entity resolution over string attributes: an EXACT
edit-distance threshold self-join (the q-gram count-filtering family —
Gravano et al. VLDB'01, ED-Join) and connected-component entity grouping
on top of it.

Why this belongs in a training-data engine: catalogs, author fields,
product titles, and host names arrive with typo-level variants that
exact dedup cannot see and token-level Jaccard over-merges (two short
names sharing one word are not the same entity; two names one
substitution apart almost always are). Edit distance is the right
metric at attribute granularity, and the reference pipeline's universe
stitching (listing names joined across sources) is exactly this problem
one typo away.

Scale design:

- The join runs over DISTINCT attribute values, never records: value
  cardinality is what the quadratic risk scales with, and real
  attribute domains (names, hosts, titles) are orders of magnitude
  smaller than the fact tables referencing them. Records re-attach by
  one equi-join at the end.
- Candidate generation is the ED-Join prefix scheme (Xiao et al.
  VLDB'08): under a GLOBAL rarity order over (q-gram, occurrence-index)
  elements, each string keeps only its k·q + 1 rarest — ed(a,b) ≤ k
  forces a multiset gram intersection of ≥ max(|a|,|b|) − q + 1 − k·q
  (each edit destroys at most q grams), and two element sets meeting
  that bound must share an element within their (size − bound + 1)-
  prefixes, which is ≤ k·q + 1 on both sides. Joining FULL gram sets
  instead melts down exactly on key-styled domains (every
  "Customer#000…" name shares its prefix grams with every other name —
  measured 179 s at sf0.1 where the rarity prefix takes ~2 s); rarest-
  first prefixes make constant prefixes and dense zero-regions nobody's
  join key. The length filter |len(a) − len(b)| ≤ k is applied
  row-level inside the join, before the pair distinct shuffles
  anything.
- Strings short enough that the count bound degenerates to ≤ 0 (len ≤
  q − 1 + k·q: a pair can reach distance k sharing zero grams) go
  through a dedicated short-string path: an equi-join on an exploded
  length-band key (each short value emits keys len..len+k, matching the
  other side's exact length), so the plan stays free of cartesian and
  non-equi joins. Its fan-out is |short values|² in the worst case —
  bounded by the attribute domain, not the corpus, and short strings
  (≤ ~8 chars at the defaults) have tiny domains in practice.
- Verify is native ``F.levenshtein`` (JVM codegen, no UDF) on the
  candidate stream; the reported distance is the exact one.

The DuckDB oracle runs brute-force ``levenshtein`` over the same
distinct values with only the length filter — completeness of the
q-gram + short-path candidate set is therefore checked value-for-value
by the driver, the same contract as the Jaccard prefix join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from market_data_pipeline_spark.operators.dedup import dup_groups


def edit_distance_join(
    df: DataFrame,
    col: str = "name",
    max_dist: int = 2,
    q: int = 3,
    max_short_pairs: int | None = 25_000_000,
) -> DataFrame:
    """All pairs of DISTINCT non-null values of ``col`` with Levenshtein
    distance ≤ ``max_dist``: (name_a, name_b, dist), name_a < name_b.

    Exact (no probabilistic recall loss): candidates from the ED-Join
    rarity prefix (each value joins on its k·q + 1 globally-rarest
    (gram, occurrence) elements — see the module docstring for the
    pigeonhole argument) plus the short-string length-band path are a
    provable superset of the true pair set; the native levenshtein
    verify keeps truth only. ``q`` trades prefix selectivity (larger q
    = rarer grams but a longer k·q + 1 prefix) against the short-string
    cutoff q − 1 + max_dist·q below which values take the
    quadratic-in-domain short path.

    ``max_short_pairs`` guards that short path: its candidate volume is
    Σ_band |left|·|right| — quadratic in the SHORT-VALUE domain, which is
    normally tiny but unbounded in principle (an attribute that is all
    2-char codes). The exact band-sum is estimated with one O(short
    domain) aggregate before the join; above the cap the call fails loudly
    with the measured estimate rather than melting down — raise ``q``
    (lowers the L0 cutoff), or pass ``None`` to accept the cost.
    """
    k = int(max_dist)
    if k < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    vals = (
        df.select(F.col(col).alias("val"))
        .filter(F.col("val").isNotNull())
        .distinct()
        .withColumn("len", F.length("val"))
        .localCheckpoint(eager=True)  # O(domain); feeds grams, short path, verify
    )
    # --- short path: pairs whose LONGER side is ≤ L0 can legally share
    # zero q-grams, so the gram filter cannot see them. Any such pair has
    # both ends ≤ L0; equi-join on an exploded length-band key keeps the
    # plan cartesian-free.
    l0 = q - 1 + k * q
    short = vals.filter(F.col("len") <= l0)
    if max_short_pairs is not None:
        est_row = (
            short.select(
                F.explode(
                    F.sequence(F.col("len"), F.col("len") + F.lit(k))
                ).alias("__lk")
            )
            .groupBy("__lk")
            .agg(F.count(F.lit(1)).alias("__nl"))
            .join(
                short.groupBy(F.col("len").alias("__lk")).agg(
                    F.count(F.lit(1)).alias("__nr")
                ),
                "__lk",
            )
            .agg(F.sum(F.col("__nl") * F.col("__nr")).alias("est"))
            .first()
        )
        est = est_row["est"] or 0
        if est > max_short_pairs:
            raise ValueError(
                f"short-string path would generate ~{est:,} candidate pairs "
                f"(> max_short_pairs={max_short_pairs:,}) for values of "
                f"length <= {l0}; raise q to shrink the short cutoff, or "
                "pass max_short_pairs=None to accept the quadratic cost"
            )
    short_pairs = (
        short.select(
            "val",
            F.explode(
                F.sequence(F.col("len"), F.col("len") + F.lit(k))
            ).alias("__lk"),
        )
        .join(
            short.select(F.col("val").alias("__vb"), F.col("len").alias("__lk")),
            "__lk",
        )
        .filter(F.col("val") != F.col("__vb"))
        .select(
            F.least("val", "__vb").alias("name_a"),
            F.greatest("val", "__vb").alias("name_b"),
        )
    )
    # --- gram path (ED-Join prefix): grams as (gram, occurrence-index)
    # elements so the multiset intersection is a plain set intersection;
    # global rarity order by (document frequency, gram, occ); each value
    # keeps its k·q + 1 rarest elements, and candidates join ONLY on
    # those. Values shorter than q have no grams — their partners are
    # covered by the short path (length filter forces both ends under L0
    # when one end is under q, since q ≤ L0 − k for k ≥ 1; at k = 0
    # gramless values only pair with themselves, excluded by distinct).
    grams = (
        vals.filter(F.col("len") >= q)
        .select(
            "val",
            "len",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("len") - F.lit(q) + F.lit(1)),
                    lambda i: F.col("val").substr(i, F.lit(q)),
                )
            ).alias("pos", "gram"),
        )
        .withColumn(
            "occ",
            F.row_number().over(
                Window.partitionBy("val", "gram").orderBy("pos")
            ),
        )
        .drop("pos")
    )
    dfreq = grams.groupBy("gram", "occ").agg(F.count(F.lit(1)).alias("__df"))
    rarity = Window.partitionBy("val").orderBy("__df", "gram", "occ")
    # O(domain · (kq+1)) rows; checkpointed so the self-join's two
    # branches don't each recompute the explode + df join + rank chain
    prefix = (
        grams.join(dfreq, ["gram", "occ"])
        .withColumn("__rn", F.row_number().over(rarity))
        .filter(F.col("__rn") <= F.lit(k * q + 1))
        .select("val", "len", "gram", "occ")
        .localCheckpoint(eager=True)
    )
    gram_pairs = (
        prefix.select(
            F.col("val").alias("__va"), F.col("len").alias("__la"), "gram", "occ"
        )
        .join(
            prefix.select(
                F.col("val").alias("__vb"), F.col("len").alias("__lb"), "gram", "occ"
            ),
            ["gram", "occ"],
        )
        .filter(F.col("__va") < F.col("__vb"))
        .filter(F.abs(F.col("__la") - F.col("__lb")) <= F.lit(k))
        .select(
            F.col("__va").alias("name_a"), F.col("__vb").alias("name_b")
        )
    )
    cand = short_pairs.unionByName(gram_pairs).distinct()
    return (
        cand.withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("int")
        )
        .filter(F.col("dist") <= k)
        .select("name_a", "name_b", "dist")
    )


def resolve_entities(
    df: DataFrame,
    col: str = "name",
    id_col: str = "record_id",
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """Entity resolution: every record gets an ``entity_id`` — the
    minimum ``id_col`` among all records whose ``col`` values connect
    through edit-distance-≤-``max_dist`` steps (transitive closure, the
    same contract as dedup.dup_groups).

    Shape: the edit-distance join runs over distinct values; each value
    maps to its min record id (one groupBy), value-pair edges become
    rep-id edges by two broadcast-sized joins, star contraction finds
    components, and records re-attach by one equi-join on the value.
    Everything pairwise happens in the value domain — record volume only
    ever flows through scans and equi-joins.

    NULL attribute values cannot link to anything (no distance is
    defined), so a null-named record is its own singleton entity:
    re-attach is a LEFT join and entity_id falls back to the record's
    own id — never silent record loss.
    """
    reps = df.groupBy(F.col(col).alias("val")).agg(
        F.min(id_col).alias("__rep")
    ).localCheckpoint(eager=True)  # O(domain), feeds edges + re-attach
    pairs = edit_distance_join(df, col=col, max_dist=max_dist, q=q)
    edges = (
        pairs.join(reps.select(F.col("val").alias("name_a"), F.col("__rep").alias("__ra")), "name_a")
        .join(reps.select(F.col("val").alias("name_b"), F.col("__rep").alias("__rb")), "name_b")
        .select("__ra", "__rb")
    )
    groups = dup_groups(edges, id_a="__ra", id_b="__rb")
    rep_entity = reps.join(
        groups.withColumnRenamed("doc_id", "__rep"), "__rep", "left"
    ).select(
        "val",
        F.coalesce("group_id", "__rep").alias("entity_id"),
    )
    return df.join(
        rep_entity.withColumnRenamed("val", col), col, "left"
    ).select(
        F.col(id_col),
        F.col(col),
        F.coalesce("entity_id", id_col).alias("entity_id"),
    )
