"""Record linkage: exact edit-distance join + entity resolution.

The join's contract is EXACT equality with brute-force levenshtein over
the distinct value domain — completeness of the q-gram count filter and
the short-string length-band path is what these tests pin, alongside the
transitive-closure entity contract.
"""

import functools
import itertools
import random

import pytest

from market_data_pipeline_spark.operators import linkage


def _lev(a: str, b: str) -> int:
    @functools.lru_cache(None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(
            d(i - 1, j) + 1,
            d(i, j - 1) + 1,
            d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
        )

    return d(len(a), len(b))


def _brute(names, k):
    return sorted(
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(sorted(set(names)), 2)
        if _lev(a, b) <= k
    )


def test_editdist_join_micro(spark):
    rows = [
        (1, "red widget"),
        (2, "red widgel"),
        (3, "blue bolt"),
        (4, "blue boltt"),
        (5, "bl"),
        (6, "b"),
        (7, "green gear"),
        (8, "red widget"),  # exact clone: distinct-value domain collapses it
        (9, "rd widget"),
    ]
    df = spark.createDataFrame(rows, "record_id long, name string")
    got = sorted(
        (r.name_a, r.name_b, r.dist)
        for r in linkage.edit_distance_join(df, "name", max_dist=2).collect()
    )
    assert got == _brute([n for _, n in rows], 2)


def test_editdist_join_matches_bruteforce_random(spark):
    # randomized-ish domain (deterministic seed), including strings below
    # the q-gram floor and length-k ladders that straddle the short path
    rng = random.Random(11)
    alphabet = "abcdef"
    names = set()
    while len(names) < 60:
        n = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        names.add(n)
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sorted(names))], "record_id long, name string"
    )
    for k in (1, 2):
        got = sorted(
            (r.name_a, r.name_b, r.dist)
            for r in linkage.edit_distance_join(df, "name", max_dist=k).collect()
        )
        assert got == _brute(names, k), f"max_dist {k}"


def test_editdist_join_short_strings_only(spark):
    # every value below the q-gram floor: the whole result must come from
    # the length-band path
    names = ["a", "b", "ab", "ba", "abc", "abd", "xyz"]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "record_id long, name string"
    )
    got = sorted(
        (r.name_a, r.name_b, r.dist)
        for r in linkage.edit_distance_join(df, "name", max_dist=1).collect()
    )
    assert got == _brute(names, 1)


def test_editdist_join_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "record_id long, name string")
    with pytest.raises(ValueError):
        linkage.edit_distance_join(df, "name", max_dist=-1)
    with pytest.raises(ValueError):
        linkage.edit_distance_join(df, "name", q=1)


def test_editdist_short_path_domain_guard(spark):
    """An attribute domain that is all short codes makes the length-band
    path quadratic in the domain; the guard measures the exact band-sum
    and fails loudly above the cap instead of melting down."""
    names = [f"{a}{b}" for a in "abcdefghij" for b in "abcdefghij"]  # 100 2-char codes
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "record_id long, name string"
    )
    # 100 same-length values at k=1: ~100*100 band candidates > 5000 cap
    with pytest.raises(ValueError, match="short-string path"):
        linkage.edit_distance_join(df, "name", max_dist=1, max_short_pairs=5000)
    # cap lifted -> runs and matches brute force
    got = sorted(
        (r.name_a, r.name_b, r.dist)
        for r in linkage.edit_distance_join(
            df, "name", max_dist=1, max_short_pairs=None
        ).collect()
    )
    assert got == _brute(names, 1)


def test_resolve_entities_transitive_chain(spark):
    # aaaa — aaab — aabb connect transitively (each hop dist 1, ends dist
    # 2); entity id must be the min RECORD id across the whole chain even
    # though records carrying the min arrive via different values
    rows = [
        (10, "aaaa"),
        (3, "aaab"),
        (7, "aabb"),
        (5, "zzzz"),
        (8, "aaaa"),  # clone of record 10's value; same entity
    ]
    df = spark.createDataFrame(rows, "record_id long, name string")
    got = {
        r.record_id: r.entity_id
        for r in linkage.resolve_entities(
            df, "name", "record_id", max_dist=1
        ).collect()
    }
    assert got == {10: 3, 3: 3, 7: 3, 5: 5, 8: 3}


def test_resolve_entities_null_name_is_singleton(spark):
    # a NULL attribute cannot link to anything: the record must still
    # appear, as its own singleton entity (left-join fallback)
    rows = [(1, "acme"), (2, None), (3, "acme")]
    df = spark.createDataFrame(rows, "record_id long, name string")
    got = {
        r.record_id: r.entity_id
        for r in linkage.resolve_entities(df, "name", "record_id").collect()
    }
    assert got == {1: 1, 2: 2, 3: 1}
