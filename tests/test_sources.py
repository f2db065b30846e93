"""SNAP edgelist/adjlist sources + graph meta."""

from fog_spark.sources import read_adjlist, read_edgelist, write_graph_meta


def test_read_edgelist(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("# comment line\n0\t1\n1\t2\n\n2 0\n")
    df = read_edgelist(spark, str(p))
    rows = {(r["src"], r["dst"]) for r in df.collect()}
    assert rows == {(0, 1), (1, 2), (2, 0)}
    w = {(r["src"], r["dst"]): r["weight"] for r in df.collect()}
    assert w[(0, 1)] == ((0 * 31 + 1) % 90 + 10) / 10.0


def test_read_adjlist(spark, tmp_path):
    p = tmp_path / "g.adj"
    p.write_text("# snap adjlist\n0 2 1 2\n1 1 2\n2 0\n")
    df = read_adjlist(spark, str(p))
    rows = {(r["src"], r["dst"]) for r in df.collect()}
    assert rows == {(0, 1), (0, 2), (1, 2)}


def test_read_adjlist_ultra_hub_not_truncated(spark, tmp_path):
    """Regression: the neighbor slice used a 1M literal length, silently
    dropping out-edges of any vertex with more than 1M neighbors. The
    length now comes from the row itself."""
    n = 1_000_001
    p = tmp_path / "hub.adj"
    p.write_text(f"7 {n} " + " ".join(str(i) for i in range(n)) + "\n9 0\n")
    df = read_adjlist(spark, str(p))
    assert df.count() == n
    assert df.agg({"dst": "max"}).collect()[0][0] == n - 1


def test_graph_meta(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("0\t1\n0\t2\n5\t0\n")
    meta = write_graph_meta(read_edgelist(spark, str(p)))
    assert meta == {"min_vertex_id": 0, "max_vertex_id": 5, "num_of_edges": 3, "max_out_edges": 2}
