from fog_spark.graph.derive import derive_graph, with_content_sha, assign_dense_ids  # noqa: F401
