"""k-means loop vs an independent numpy reference with identical init
(k lowest ids) and tie-breaks (lowest cluster index wins)."""

from __future__ import annotations

import numpy as np

from market_data_pipeline_spark.operators import similarity
from market_data_pipeline_spark.sources.tables import load_table


def _numpy_kmeans(ids, X, k, max_iter):
    """Mirrors kmeans_fit exactly: assign from seeds first, then per
    iteration M-step (means of current assignment) + E-step, stopping when
    the assignment is unchanged."""

    def _argmin_assign(cents):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)  # lowest cluster index wins ties

    order = np.argsort(ids, kind="stable")
    cents = X[order[:k]].copy()
    assign = _argmin_assign(cents)
    for _ in range(max_iter):
        for c in range(k):
            m = assign == c
            if m.any():
                # mirror the operator's in-loop 6dp quantization (HALF_UP,
                # away from zero — not numpy's half-even)
                mu = X[m].mean(axis=0)
                cents[c] = np.sign(mu) * np.floor(np.abs(mu) * 1e6 + 0.5) / 1e6
        new_assign = _argmin_assign(cents)
        if (new_assign == assign).all():
            break
        assign = new_assign
    return assign, cents


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([[float(x) for x in r.embedding] for r in rows])
    k = 5

    sassign, scents, iters = similarity.kmeans_fit(e, k=k, max_iter=8)
    got = {r.vec_id: r.cluster for r in sassign.collect()}

    nassign, _ = _numpy_kmeans(ids, X, k, max_iter=8)
    want = {int(i): int(c) for i, c in zip(ids, nassign)}

    assert got == want
    assert 1 <= iters <= 8
    assert scents.select("cluster").distinct().count() == k


def test_kmeans_assignments_are_deterministic(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    a1, _, _ = similarity.kmeans_fit(e, k=4, max_iter=3)
    a2, _, _ = similarity.kmeans_fit(e, k=4, max_iter=3)
    assert a1.exceptAll(a2).count() == 0 and a2.exceptAll(a1).count() == 0


def test_pca_power_recovers_planted_direction(spark):
    """A cloud stretched along a planted unit direction: the power
    iteration's projections must correlate ~1 (up to the pinned sign)
    with the planted coordinate, and the variance estimate must match
    numpy's top covariance eigenvalue."""
    import numpy as np

    from market_data_pipeline_spark.operators.similarity import pca_power

    rng = np.random.default_rng(7)
    d = rng.normal(size=64)
    d /= np.linalg.norm(d)
    a = rng.normal(scale=5.0, size=300)  # dominant coordinate
    noise = rng.normal(scale=0.3, size=(300, 64))
    x = a[:, None] * d[None, :] + noise
    rows = [(i, [float(v) for v in x[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = pca_power(df, iterations=8).orderBy("vec_id").collect()
    proj = np.array([r.pc1 for r in got])
    corr = abs(np.corrcoef(proj, a)[0, 1])
    assert corr > 0.995

    c = np.cov((x - x.mean(axis=0)).T, bias=True)  # /n covariance
    top = float(np.linalg.eigvalsh(c)[-1])
    var = got[0].pc1_var
    assert all(r.pc1_var == var for r in got)  # constant column
    assert abs(var - top) / top < 0.02  # 8 rounds converge within 2%


def test_embedding_outliers_flags_planted_far_vector(spark):
    """A tight cloud plus one vector 100 units away: only the planted
    vector is flagged, its modified z-score dominates, and an
    over-half-identical (MAD=0) cloud flags nothing by convention."""
    import numpy as np

    from market_data_pipeline_spark.operators.similarity import embedding_outliers

    rng = np.random.default_rng(11)
    cloud = rng.normal(scale=0.5, size=(50, 8))
    far = np.full(8, 100.0 / (8**0.5))
    rows = [(i, [float(x) for x in cloud[i]]) for i in range(50)]
    rows.append((99, [float(x) for x in far]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in embedding_outliers(df).collect()}
    assert got[99].is_outlier and got[99].mod_z > 3.5
    assert sum(1 for r in got.values() if r.is_outlier) == 1
    assert got[99].dist > max(r.dist for i, r in got.items() if i != 99) * 10

    same = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(10)], "vec_id long, embedding array<double>"
    )
    got0 = embedding_outliers(same).collect()
    assert all(not r.is_outlier and r.mod_z == 0.0 for r in got0)  # MAD = 0


def test_pca_top2_recovers_planted_axes(spark):
    """Planted 2-factor cloud in 4-D: variance 5 along axis 0, variance 1
    along axis 1, zero elsewhere. The deflated second component must
    recover the SECOND axis: pc1 tracks x (sign-pinned positive), pc2
    tracks y, and the two projection vectors are uncorrelated over the
    data (empirical orthogonality of the fitted directions)."""
    from market_data_pipeline_spark.operators.similarity import pca_top2

    pts = [(i, [float(x), float(y), 0.0, 0.0]) for i, (x, y) in enumerate(
        [(x, y) for x in (-3, -1, 1, 3) for y in (-1, 1)]
    )]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    rows = {r.vec_id: r for r in pca_top2(df, iterations=8, dim=4).collect()}
    assert len(rows) == 8
    # the sign pin is deterministic but latches whichever component first
    # exceeds its 1e-6 floor (deflation residue can hand pc2 a global
    # flip) — compare up to one global sign per component
    s1 = 1.0 if rows[0].pc1 * -3 > 0 else -1.0
    s2 = 1.0 if rows[0].pc2 * -1 > 0 else -1.0
    for i, (x, y) in enumerate([(x, y) for x in (-3, -1, 1, 3) for y in (-1, 1)]):
        assert abs(s1 * rows[i].pc1 - x) < 1e-3, (i, rows[i].pc1, x)
        assert abs(s2 * rows[i].pc2 - y) < 1e-2, (i, rows[i].pc2, y)
    r0 = next(iter(rows.values()))
    assert r0.pc1_var > r0.pc2_var > 0
    # empirical orthogonality: the two projections are uncorrelated
    dot = sum(r.pc1 * r.pc2 for r in rows.values())
    assert abs(dot) < 1e-4
