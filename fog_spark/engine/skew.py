"""Salted-key skew mitigation for hub vertices.

FOG handles stragglers with work stealing (reference:
fogsrc/fog_engine.cpp:560-758, rebalance_sched_tasks :926-1043). In
Spark the residual problem after AQE's skew-join splitting is a single
hub key (the `utils.py` imported by everyone) whose gather lands on one
reducer. The fix is classic two-stage aggregation: fan the hot key out
across ``n_salts`` sub-keys, partially aggregate, then finish.

For the algebraic folds this engine uses (sum/min/max/count — SURVEY
§2.4, all commutative-associative) the re-aggregation function is
mechanical: sum/count -> sum, min -> min, max -> max.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_REAGG = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    msgs: DataFrame,
    key: str,
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage groupBy(key) salting EVERY row over ``n_salts``.

    aggs: list of (fn, col, alias) with fn in {sum, min, max, count}.
    Thin wrapper over ``skewed_gather`` with all rows flagged as hubs —
    use when the whole keyspace is hot; the algorithms use the
    conditional form (only hub-flagged rows salted).
    """
    return skewed_gather(
        msgs.withColumn(HUB_FLAG, F.lit(True)), key, aggs, n_salts=n_salts
    )


def top_degree_keys(edges: DataFrame, key: str = "dst", threshold: int = 1_000_000) -> DataFrame:
    """Keys whose degree exceeds ``threshold`` — candidates for salting /
    broadcast special-casing at 10^12-edge scale."""
    return edges.groupBy(key).count().filter(F.col("count") > threshold).select(key)


# Degree above which a gather key counts as a hub in the live algorithm
# paths. At 10^12 edges a single hub's in-neighborhood would otherwise
# concentrate one reduce partition; below it, plain groupBy is strictly
# cheaper (no second exchange).
HUB_DEGREE_THRESHOLD = 1_000_000

HUB_FLAG = "_hub"


def pick_hub_keys(
    probe: "DataFrame | None" = None, state_keys: "DataFrame | None" = None
) -> "tuple[bool, DataFrame | None]":
    """Resolve the salted-gather hub-key set for a superstep loop.

    Exactly one source is given:
    - ``state_keys``: a candidate frame filtered off the loop's cached
      state (the fused-preamble path). When non-empty it is
      localCheckpoint'ed so the tag join never aliases the state
      subtree into the edge table (ambiguous self-join with the loop's
      state references).
    - ``probe``: a lazy edge-table degree probe (resume / explicit-
      vertices path). It is persisted for the emptiness probe; when
      empty it is unpersisted immediately, otherwise returned persisted.

    Returns (salted, hubs). A non-None hubs is always safe to
    ``unpersist()`` at loop end (a no-op for the checkpointed form).
    """
    if state_keys is not None:
        if state_keys.isEmpty():
            return False, None
        return True, state_keys.localCheckpoint(eager=True)
    probe = probe.persist()
    if probe.isEmpty():
        probe.unpersist()
        return False, None
    return True, probe


def tag_hubs(edges: DataFrame, hub_keys: DataFrame, key: str = "dst", flag: str = HUB_FLAG) -> DataFrame:
    """Mark edges whose ``key`` is a hub with a boolean ``flag`` column.

    The hub set is tiny by construction (≤ |E| / threshold keys), so the
    tag join is a broadcast hash join — no shuffle, evaluated map-side.
    Tag ONCE before the superstep loop so the per-superstep cost is a
    column reference, not a join.
    """
    marked = hub_keys.select(key).withColumn(flag, F.lit(True))
    return edges.join(F.broadcast(marked), key, "left").withColumn(
        flag, F.coalesce(F.col(flag), F.lit(False))
    )


def skewed_gather(
    msgs: DataFrame,
    key: str | list[str],
    aggs: list[tuple[str, "str | Column", str]],
    n_salts: int = 16,
    hub_col: str = HUB_FLAG,
) -> DataFrame:
    """groupBy(key).agg(...) with hub-flagged rows salted over n_salts.

    Non-hub rows get salt 0, so stage 1 is the same exchange volume as a
    plain partial-agg groupBy; stage 2 re-folds at most
    (distinct keys + (n_salts-1)·hubs) rows — a near-free second
    aggregation that removes the single-reducer ceiling on hub keys.
    This is the live wiring of the north_star's salted-key skew
    mitigation (FOG's analogue: work stealing,
    fogsrc/fog_engine.cpp:560-758).
    """
    keys = [key] if isinstance(key, str) else list(key)
    salt = F.when(
        F.col(hub_col), F.pmod(F.spark_partition_id(), F.lit(n_salts))
    ).otherwise(F.lit(0))
    stage1: list[Column] = []
    stage2: list[Column] = []
    for fn, col, alias in aggs:
        if fn == "count":
            stage1.append(F.count(col).alias(alias))
        else:
            stage1.append(getattr(F, fn)(col).alias(alias))
        stage2.append(_REAGG[fn](alias).alias(alias))
    partial = msgs.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*stage1)
    return partial.groupBy(*keys).agg(*stage2)
