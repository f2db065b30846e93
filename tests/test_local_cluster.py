"""Multi-JVM lane: run the engine on local-cluster[2,2] in a subprocess
(only one SparkContext per python process, and the suite's session is
local[*]). Closes the 'never ran multi-JVM' residual: broadcasts,
shuffles, and checkpoint commits cross real executor process
boundaries here. See tools/localcluster_smoke.py for what's checked."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_local_cluster_smoke():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "localcluster_smoke.py")],
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    assert "LOCAL-CLUSTER SMOKE PASS" in proc.stdout
