"""CLI surface (fog's `-g/-a/-p` shape, fogsrc/main.cpp:137-251)."""

from fog_spark.cli import main
from fog_spark.fixtures import named_graphs


def _write_edgelist(tmp_path, g):
    p = tmp_path / "g.txt"
    p.write_text("".join(f"{s}\t{d}\n" for s, d in g.edges))
    return str(p)


def test_cli_pagerank_to_parquet(spark, tmp_path):
    g = named_graphs()["g_er_n100"]
    out = str(tmp_path / "ranks")
    rc = main(
        ["--graph", _write_edgelist(tmp_path, g), "--format", "edgelist",
         "--app", "pagerank", "--niters", "3", "--out", out],
        spark=spark,
    )
    assert rc == 0
    got = {r["id"]: r["rank"] for r in spark.read.parquet(out).collect()}
    from fog_spark.algorithms.pagerank import pagerank_fog
    from fog_spark.sources.edgelist import read_edgelist

    expect = {
        r["id"]: r["rank"]
        for r in pagerank_fog(read_edgelist(spark, _write_edgelist(tmp_path, g)), niters=3).collect()
    }
    assert got == expect


def test_cli_cc_with_resume_dir(spark, tmp_path):
    g = named_graphs()["g_two_comp"]
    out = str(tmp_path / "comps")
    rc = main(
        ["--graph", _write_edgelist(tmp_path, g), "--app", "cc",
         "--out", out, "--run-dir", str(tmp_path / "ckpt")],
        spark=spark,
    )
    assert rc == 0
    comps = {r["id"]: r["component"] for r in spark.read.parquet(out).collect()}
    assert comps[0] == comps[1] == comps[2] == 0
    assert comps[3] == comps[4] == comps[5] == 3
    # the run dir holds committed supersteps (resumable)
    from fog_spark.engine.checkpoint import RunContext

    assert RunContext(spark, str(tmp_path / "ckpt"), "run0").resume_point() is not None


def test_cli_keep_last_vacuums(spark, tmp_path):
    g = named_graphs()["g_er_n100"]
    rc = main(
        ["--graph", _write_edgelist(tmp_path, g), "--app", "pagerank",
         "--niters", "5", "--out", str(tmp_path / "r"),
         "--run-dir", str(tmp_path / "ck"), "--keep-last", "2"],
        spark=spark,
    )
    assert rc == 0
    from fog_spark.engine import fs

    kept = sorted(n for n in fs.list_names(spark, str(tmp_path / "ck" / "run0" / "state"))
                  if n[5:].isdigit())
    assert kept == ["step=00004", "step=00005"]
