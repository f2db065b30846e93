"""SALSA vs a dense numpy reference; mass conservation."""

import numpy as np
import pandas as pd

from fog_spark.algorithms.salsa import salsa


def np_salsa(E, niters):
    verts = sorted({v for e in E for v in e})
    ix = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for s, d in set(E):
        A[ix[s], ix[d]] = 1.0
    ind = A.sum(axis=0)
    od = A.sum(axis=1)
    a = (ind > 0).astype(float)
    a /= a.sum()
    h = np.zeros(n)
    for _ in range(niters):
        # backward: authority mass -> hubs via 1/indeg
        with np.errstate(divide="ignore", invalid="ignore"):
            h = A @ np.where(ind > 0, a / np.where(ind > 0, ind, 1), 0.0)
            a = A.T @ np.where(od > 0, h / np.where(od > 0, od, 1), 0.0)
    return verts, a, h


def test_salsa_matches_numpy(spark):
    E = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4), (4, 3), (5, 0)]
    df = spark.createDataFrame(pd.DataFrame(E, columns=["src", "dst"]))
    got = {r["id"]: (r["authority"], r["hub"]) for r in salsa(df, niters=3).collect()}
    verts, a, h = np_salsa(E, 3)
    assert set(got) == set(verts)
    for v, ae, he in zip(verts, a, h):
        ga, gh = got[v]
        assert abs(ga - ae) < 1e-12, (v, ga, ae)
        assert abs(gh - he) < 1e-12, (v, gh, he)


def test_salsa_conserves_mass(spark):
    import random

    rng = random.Random(3)
    E = list({(rng.randrange(40), rng.randrange(40)) for _ in range(150)})
    E = [(a, b) for a, b in E if a != b]
    df = spark.createDataFrame(pd.DataFrame(E, columns=["src", "dst"]))
    out = salsa(df, niters=4).collect()
    sa = sum(r["authority"] for r in out)
    sh = sum(r["hub"] for r in out)
    assert abs(sa - 1.0) < 1e-9
    assert abs(sh - 1.0) < 1e-9
