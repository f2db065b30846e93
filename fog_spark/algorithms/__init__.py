from fog_spark.algorithms.pagerank import pagerank_fog, pagerank_personalized, pagerank_standard, pagerank_weighted  # noqa: F401
from fog_spark.algorithms.walks import node2vec_walks, random_walks  # noqa: F401
from fog_spark.algorithms.cc import connected_components  # noqa: F401
from fog_spark.algorithms.bfs import bfs_levels  # noqa: F401
from fog_spark.algorithms.sssp import sssp  # noqa: F401
from fog_spark.algorithms.lpa import label_propagation  # noqa: F401
from fog_spark.algorithms.triangles import triangle_counts  # noqa: F401
from fog_spark.algorithms.spmv import spmv  # noqa: F401
from fog_spark.algorithms.scc import strongly_connected_components  # noqa: F401
from fog_spark.algorithms.kcore import k_core  # noqa: F401
from fog_spark.algorithms.hits import hits  # noqa: F401
from fog_spark.algorithms.linkpred import common_neighbor_scores  # noqa: F401
from fog_spark.algorithms.msbfs import multi_source_bfs  # noqa: F401
from fog_spark.algorithms.walks import weighted_random_walks  # noqa: F401
from fog_spark.algorithms.msf import minimum_spanning_forest  # noqa: F401
from fog_spark.algorithms.community import louvain_local_move, modularity  # noqa: F401
from fog_spark.algorithms.betweenness import betweenness_sampled  # noqa: F401
from fog_spark.algorithms.walks import build_alias_tables, weighted_random_walks_alias  # noqa: F401
from fog_spark.algorithms.ktruss import k_truss  # noqa: F401
from fog_spark.algorithms.coreness import coreness  # noqa: F401
