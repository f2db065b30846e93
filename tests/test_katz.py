"""Katz centrality vs a numpy matrix-power reference."""

import numpy as np
import pandas as pd

from fog_spark.algorithms.katz import katz


def np_katz(E, n, alpha, beta, k):
    A = np.zeros((n, n))
    for a, b in set(E):
        A[a, b] = 1.0
    x = np.zeros(n)
    for _ in range(k):
        x = alpha * (A.T @ x) + beta
    return x


def test_katz_matches_numpy(spark):
    import random

    rng = random.Random(3)
    E = list({(rng.randrange(25), rng.randrange(25)) for _ in range(120)})
    df = spark.createDataFrame(pd.DataFrame(E, columns=["src", "dst"]))
    got = {r["id"]: r["katz"] for r in katz(df, alpha=0.1, beta=1.0, niters=6).collect()}
    exp = np_katz(E, 25, 0.1, 1.0, 6)
    seen = set(a for a, _ in E) | set(b for _, b in E)
    assert set(got) == seen
    for v in seen:
        assert abs(got[v] - exp[v]) < 1e-9, (v, got[v], exp[v])


def test_katz_star_ordering(spark):
    # hub with many in-links must outrank leaves; deeper chains compound
    E = [(i, 0) for i in range(1, 9)] + [(9, 1), (10, 1)]
    df = spark.createDataFrame(pd.DataFrame(E, columns=["src", "dst"]))
    got = {r["id"]: r["katz"] for r in katz(df, alpha=0.2, niters=4).collect()}
    assert got[0] > got[1] > got[2]
    # vertex 0 collects both direct mass and 2-hop mass through 1
    exp0 = 0.2 * 8 + 1 + 0.2 * 0.2 * 2  # alpha*indeg + beta + alpha^2*(9,10 via 1)
    assert abs(got[0] - exp0) < 1e-9
