from fog_spark.sources.edgelist import read_adjlist, read_edgelist, write_graph_meta  # noqa: F401
