"""TableFormat seam: RunContext through explicit/recording formats, and
the IcebergFormat call-shape pinned with session doubles (no Iceberg
jars in this sandbox — the 1:1 mapping claim is executable here)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fog_spark.algorithms.pagerank import pagerank_fog
from fog_spark.engine.checkpoint import RunContext
from fog_spark.engine.table_format import IcebergFormat, ParquetDirFormat
from fog_spark.fixtures import graph_to_spark, named_graphs

GRAPHS = named_graphs()


class RecordingFormat:
    """Delegates to ParquetDirFormat, recording every seam call."""

    def __init__(self, inner):
        self.inner = inner
        self.calls: list[tuple] = []

    def __getattr__(self, op):
        fn = getattr(self.inner, op)

        def wrapped(*a, **kw):
            # (op, table name, step) — df args are not recorded
            key = tuple(x for x in a if isinstance(x, (str, int)))
            self.calls.append((op, *key))
            return fn(*a, **kw)

        return wrapped


def test_runcontext_through_explicit_format_matches_default(spark, tmp_path):
    """Same algorithm, default format vs an explicitly injected one:
    bit-identical results, resumable either way."""
    g = GRAPHS["g_er_n100"]
    edges = graph_to_spark(spark, g)
    vertices = spark.range(g.n).select("id")

    ctx_a = RunContext(spark, str(tmp_path), "runDefault")
    a = {r["id"]: r["rank"] for r in pagerank_fog(edges, vertices, niters=4, ctx=ctx_a).collect()}

    fmt = ParquetDirFormat(spark, f"{tmp_path}/runSeam")
    ctx_b = RunContext(spark, str(tmp_path), "runSeam", table_format=fmt)
    b = {r["id"]: r["rank"] for r in pagerank_fog(edges, vertices, niters=4, ctx=ctx_b).collect()}
    assert a == b
    step, _ = ctx_b.resume_point()
    assert step == 4


def test_recording_format_sees_commit_protocol(spark, tmp_path):
    """Every superstep must flow write_partition(state, step) then
    write_record(metrics, step) through the seam — nothing bypasses it."""
    g = GRAPHS["g_er_n100"]
    edges = graph_to_spark(spark, g)
    vertices = spark.range(g.n).select("id")
    fmt = RecordingFormat(ParquetDirFormat(spark, f"{tmp_path}/runRec"))
    ctx = RunContext(spark, str(tmp_path), "runRec", table_format=fmt)
    got = {r["id"]: r["rank"] for r in pagerank_fog(edges, vertices, niters=3, ctx=ctx).collect()}
    plain = {r["id"]: r["rank"] for r in pagerank_fog(edges, vertices, niters=3).collect()}
    assert np.allclose(
        [got[i] for i in range(g.n)], [plain[i] for i in range(g.n)], rtol=1e-12)
    writes = [c for c in fmt.calls if c[0] == "write_partition"]
    records = [c for c in fmt.calls if c[0] == "write_record"]
    assert [c[2] for c in writes] == [0, 1, 2, 3]  # init + every superstep
    assert [c[2] for c in records] == [1, 2, 3]  # one metric commit per superstep
    assert all(c[1] == "state" for c in writes)


# --- IcebergFormat call shape (session doubles; no jars needed) -----------


class FakeWriter:
    def __init__(self, log, df):
        self.log, self.df = log, df
        self.table = None

    def writeTo(self, table):
        self.table = table
        return self

    def partitionedBy(self, col):
        self.log.append(("partitionedBy", str(col)))
        return self

    def create(self):
        self.log.append(("create", self.table, tuple(self.df.added)))

    def overwritePartitions(self):
        self.log.append(("overwritePartitions", self.table, tuple(self.df.added)))


class FakeDF:
    def __init__(self, log, added=()):
        self.log, self.added = log, tuple(added)

    @property
    def columns(self):
        return list(self.added)

    def withColumn(self, name, col):
        return FakeDF(self.log, self.added + (name,))

    def writeTo(self, table):
        return FakeWriter(self.log, self).writeTo(table)

    def where(self, cond):
        self.log.append(("where", str(cond)))
        return self

    def drop(self, col):
        self.log.append(("drop", col))
        return self


class FakeCatalog:
    def __init__(self, existing):
        self.existing = existing

    def tableExists(self, t):
        return t in self.existing


class FakeSpark:
    def __init__(self, existing=(), conf=None):
        self.log = []
        self.catalog = FakeCatalog(set(existing))
        self._conf = conf or {}

    @property
    def conf(self):
        class C:
            def __init__(s, d):
                s.d = d

            def get(s, k, default=None):
                return s.d.get(k, default)

        return C(self._conf)

    def table(self, t):
        self.log.append(("table", t))
        return FakeDF(self.log)

    def sql(self, q):
        self.log.append(("sql", q))

    def createDataFrame(self, rows, schema):
        self.log.append(("createDataFrame", tuple(map(tuple, rows)), schema))
        return FakeDF(self.log)


ICEBERG_CONF = {"spark.sql.catalog.ice": "org.apache.iceberg.spark.SparkCatalog"}


def test_iceberg_write_partition_overwrites_one_step_partition():
    sp = FakeSpark(existing=("ice.ckpt.fogspark_state",), conf=ICEBERG_CONF)
    fmt = IcebergFormat(sp, "ckpt", catalog="ice")
    fmt.write_partition(FakeDF(sp.log), "state", 7)
    ow = [c for c in sp.log if c[0] == "overwritePartitions"]
    # the step literal column is stamped on and EXACTLY one partition
    # is replaced via Iceberg's dynamic partition overwrite
    assert ow == [("overwritePartitions", "ice.ckpt.fogspark_state", ("step",))]
    # and the re-read prunes to that partition then drops the key
    assert ("table", "ice.ckpt.fogspark_state") in sp.log
    assert any(c[0] == "where" and "step" in c[1] for c in sp.log)
    assert ("drop", "step") in sp.log


def test_iceberg_first_write_creates_partitioned_table():
    sp = FakeSpark(existing=(), conf=ICEBERG_CONF)
    fmt = IcebergFormat(sp, "ckpt", catalog="ice")
    # reads of an absent table never touch it
    assert fmt.partition_exists("state", 1) is False
    assert fmt.list_partitions("state") == []
    fmt.write_record("metrics", 3, '{"superstep": 3}')
    assert ("partitionedBy", "Column<'step'>") in sp.log
    creates = [c for c in sp.log if c[0] == "create"]
    assert creates and creates[0][1] == "ice.ckpt.fogspark_metrics"
    assert ("createDataFrame", ((3, '{"superstep": 3}'),), "step int, payload string") in sp.log


def test_iceberg_delete_partition_is_a_partition_delete():
    sp = FakeSpark(existing=("ice.ckpt.fogspark_state",), conf=ICEBERG_CONF)
    fmt = IcebergFormat(sp, "ckpt", catalog="ice")
    fmt.delete_partition("state", 5)
    assert ("sql", "DELETE FROM ice.ckpt.fogspark_state WHERE step = 5") in sp.log


def test_iceberg_unavailable_fails_fast(spark):
    """On this jar-less session the catalog probe must refuse loudly,
    pointing at ParquetDirFormat."""
    with pytest.raises(RuntimeError, match="ParquetDirFormat"):
        IcebergFormat(spark, "ckpt")
    assert IcebergFormat.available(spark) is False


def test_iceberg_write_partition_rejects_step_column():
    """A state frame that already carries a 'step' column must be
    rejected loudly — stamping the partition key over it would destroy
    the caller's data on checkpoint and drop it again on read."""
    import pytest

    sp = FakeSpark(existing=("ice.ckpt.fogspark_state",), conf=ICEBERG_CONF)
    fmt = IcebergFormat(sp, "ckpt", catalog="ice")
    df = FakeDF(sp.log, added=("id", "step"))
    with pytest.raises(ValueError, match="'step' column"):
        fmt.write_partition(df, "state", 3)
    assert not [c for c in sp.log if c[0] == "overwritePartitions"]
