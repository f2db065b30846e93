"""The north_rule deploy shape, end-to-end: spark-submit --py-files on
a multi-executor (local-cluster) master, importing fog_spark ONLY from
the built zip."""

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_multi_executor(tmp_path):
    from tools.make_pyfiles import build

    zip_path = str(tmp_path / "fog_spark.zip")
    build(zip_path)
    driver = str(tmp_path / "driver.py")
    shutil.copy(os.path.join(REPO, "tools", "pyfiles_smoke_driver.py"), driver)

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env["SPARK_LOCAL_IP"] = "127.0.0.1"
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY fog_spark source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local-cluster[2,2,1536]",
            "--conf", "spark.driver.host=127.0.0.1",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            driver,
        ],
        cwd=str(tmp_path),  # repo not importable from here
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "PYFILES-PASS" in proc.stdout, proc.stdout[-2000:] + proc.stderr[-3000:]
