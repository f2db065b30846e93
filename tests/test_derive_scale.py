"""Full-pipeline derivation on the Spark-generated fixture: the regex
front-end must recover exactly the generator's edge rule."""

from pyspark.sql import functions as F

from fog_spark.fixtures_spark import expected_edges, make_repo_table_spark
from fog_spark.graph.derive import derive_graph


def test_spark_generated_repo_derivation_roundtrip(spark):
    n_repos, fpr = 3, 200
    repos = make_repo_table_spark(spark, n_repos, fpr)
    assert repos.count() == n_repos * fpr

    g = derive_graph(repos)
    got = (
        g.edges.join(
            g.files.select(F.col("id").alias("src"), F.col("repo").alias("repo"), F.col("path").alias("src_path")),
            "src",
        )
        .join(g.files.select(F.col("id").alias("dst"), F.col("path").alias("dst_path")), "dst")
        .select("repo", "src_path", "dst_path")
    )
    want = expected_edges(spark, n_repos, fpr)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert want.count() > 0


def test_generator_is_deterministic(spark):
    a = make_repo_table_spark(spark, 2, 50).orderBy("repo", "path").collect()
    b = make_repo_table_spark(spark, 2, 50).orderBy("repo", "path").collect()
    assert a == b
