"""Per-partition CSR packing for Arrow-vectorized scatter kernels.

The reference streams a disk-resident CSR through a memory budget
(fogsrc/index_vert_array.cpp, headers/config.hpp segment geometry). Our
distributed analogue: hash-partition edges by src into P groups, and
inside each group pack a NumPy CSR (unique sorted src ids + offsets +
dst array) ONCE; every superstep then cogroups the packed block with
the state block for that partition and runs a vectorized kernel —
messages for a whole partition are produced by array ops and
PRE-AGGREGATED by dst before they hit the shuffle (FOG materializes
every per-edge update, cpu_thread.cpp:295-306; we map-side combine).

Pack rows carry whole arrays through Arrow (one row per partition
group), so batch shape = partition shape and there is no per-row
Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("pkey", T.IntegerType(), False),
        T.StructField("srcs", T.ArrayType(T.LongType()), False),     # unique, sorted
        T.StructField("offsets", T.ArrayType(T.LongType()), False),  # len(srcs)+1
        T.StructField("dsts", T.ArrayType(T.LongType()), False),
        T.StructField("weights", T.ArrayType(T.DoubleType()), True),
    ]
)


def partition_key(col, n_parts: int):
    return F.pmod(F.hash(col), F.lit(n_parts))


def pack_csr(edges: DataFrame, n_parts: int, with_weights: bool = False) -> DataFrame:
    """edges(src,dst[,weight]) -> one packed CSR row per hash partition.

    Runs once per graph; the result is persisted by the caller and
    reused across all supersteps (the 1-based-offset quirk of the
    reference's .index files — convert/convert.cpp:21-25 — is
    unnecessary here: zero-degree vertices simply don't appear).
    """
    cols = ["src", "dst"] + (["weight"] if with_weights else [])
    tagged = edges.select(*cols).withColumn("pkey", partition_key(F.col("src"), n_parts))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["src"].to_numpy(), kind="stable")
        src = pdf["src"].to_numpy()[order]
        dst = pdf["dst"].to_numpy()[order]
        srcs, counts = np.unique(src, return_counts=True)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        row = {
            "pkey": [int(pdf["pkey"].iloc[0])],
            "srcs": [srcs.astype(np.int64)],
            "offsets": [offsets.astype(np.int64)],
            "dsts": [dst.astype(np.int64)],
            "weights": [pdf["weight"].to_numpy()[order].astype(np.float64) if "weight" in pdf else None],
        }
        return pd.DataFrame(row)

    return tagged.groupBy("pkey").applyInPandas(pack, schema=PACKED_SCHEMA)


_PARTIAL_SCHEMA = T.StructType(
    [T.StructField("dst", T.LongType()), T.StructField("partial", T.DoubleType())]
)


def csr_scatter_sum(
    packed: DataFrame,
    state: DataFrame,
    n_parts: int,
    value_expr,
) -> DataFrame:
    """One scatter over the packed CSR with a SUM-combinable message.

    state must carry (id, ...cols used by value_expr). ``value_expr`` is
    a vectorized fn(state_block: pd.DataFrame) -> np.ndarray giving each
    state row's per-out-edge message value (constant per edge source,
    e.g. d*rank/outdeg + (1-d) for FOG PageRank). Returns (dst, partial)
    partially aggregated within each partition — the map-side combine.
    """
    st = state.withColumn("pkey", partition_key(F.col("id"), n_parts))

    def kernel(pack_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        if pack_pdf.empty or state_pdf.empty:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"), "partial": pd.Series(dtype="float64")})
        srcs = np.asarray(pack_pdf["srcs"].iloc[0], dtype=np.int64)
        offsets = np.asarray(pack_pdf["offsets"].iloc[0], dtype=np.int64)
        dsts = np.asarray(pack_pdf["dsts"].iloc[0], dtype=np.int64)
        per_vertex = value_expr(state_pdf)  # aligned with state_pdf rows
        sid = state_pdf["id"].to_numpy()
        sorter = np.argsort(sid)
        pos = np.searchsorted(sid, srcs, sorter=sorter)
        per_src = per_vertex[sorter][pos]  # srcs ⊆ state ids (co-partitioned)
        counts = np.diff(offsets)
        msg = np.repeat(per_src, counts)
        udst, inv = np.unique(dsts, return_inverse=True)
        partial = np.bincount(inv, weights=msg)
        return pd.DataFrame({"dst": udst, "partial": partial})

    return (
        packed.groupby("pkey")
        .cogroup(st.groupby("pkey"))
        .applyInPandas(kernel, schema=_PARTIAL_SCHEMA)
    )
