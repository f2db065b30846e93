"""Seeded label spreading (semi-supervised community assignment).

Zhu-Ghahramani-style propagation with hard-clamped seeds: each seed
vertex carries a label at full mass; every round, vertices split their
per-label mass equally across their (symmetrized) neighbors, receive
the neighbor sums, and seeds are re-clamped to their own label. After
K rounds every touched vertex reports its argmax label — "which seed's
influence dominates here".

Masses are MICRO-INTEGERS (seed = 1e6) with integer-division splits,
so the whole pipeline is exact 64-bit arithmetic: no float-sum order
sensitivity between engines, and a SQL oracle replays every round to
equality (the ANF/KMV integer-replay discipline). The floor-division
mass leak is part of the operator's defined semantics.

Scale shape: state is SPARSE (id, label, m) — bounded by the K-hop
balls around the seeds, never |V| x |labels| — and each round is one
scatter join + one (id, label) gather, the standard superstep pair.
Reference ingredients: LPA's mode gather (SURVEY §2.8) and BFS frontier
expansion (application/bfs.hpp:38-100); the clamped-mass variant is the
composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fog_spark.engine.superstep import materialize, symmetrize

UNIT = 1_000_000


def label_spreading(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
) -> DataFrame:
    """(id, label, m): the argmax label per touched vertex after
    ``rounds`` clamped spreading rounds. ``seeds`` is (id, label);
    ties break toward the smaller label."""
    sym = materialize(
        symmetrize(edges).distinct()
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    adj = materialize(sym.join(deg, "src"))

    seed_rows = materialize(
        seeds.select("id", "label").distinct().withColumn("m", F.lit(UNIT).cast("long"))
    )
    seed_ids = seed_rows.select("id")
    state = seed_rows
    for _ in range(rounds):
        msgs = adj.join(state, adj["src"] == state["id"]).select(
            adj["dst"].alias("id"),
            "label",
            F.expr("m div outdeg").alias("m"),
        )
        gathered = (
            msgs.groupBy("id", "label")
            .agg(F.sum("m").alias("m"))
            .filter(F.col("m") > 0)
        )
        state = materialize(
            gathered.join(seed_ids, "id", "left_anti").unionByName(seed_rows)
        )
    w = Window.partitionBy("id").orderBy(F.desc("m"), F.asc("label"))
    return (
        state.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("id", "label", "m")
    )
