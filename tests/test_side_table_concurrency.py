"""Two concurrent sessions may run the disk-dedup entry simultaneously.

Regression for the round-7 flake: the entry wrote a FIXED managed-table
name (``incr_dedup_band_side``) into the shared warehouse, so pytest and
the correctness gate racing on the same ``_temporary/0/`` staging dir
killed one writer with FileNotFoundException. The fix scopes the table
name per session (``session_scoped_table``); this test reproduces the
exact overlap — a subprocess session and the in-process session both
executing the entry at once — and asserts BOTH succeed.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

_CHILD = """
import sys
sys.path.insert(0, {repo!r})
from arcane_framework_spark.session import get_spark
from arcane_framework_spark.queries import QUERIES

spark = get_spark("side-table-race-child", master="local[2]",
                  extra_conf={{"spark.sql.shuffle.partitions": "4"}})
# handshake: tell the parent we're ready, then wait for the go signal so
# both sessions hit write_bucketed at the same time
open({ready!r}, "w").write("ready")
import time
for _ in range(600):
    import os
    if os.path.exists({go!r}):
        break
    time.sleep(0.05)
n = QUERIES["incremental_dedup_disk_documents"](spark, {sf!r}).count()
print("CHILD_ROWS", n)
"""


def test_session_scoped_table_names_differ(spark):
    from arcane_framework_spark.operators.scale import session_scoped_table

    name = session_scoped_table(spark, "incr_dedup_band_side")
    assert name.startswith("incr_dedup_band_side__")
    # valid SQL identifier: alnum + underscore only
    assert all(c.isalnum() or c == "_" for c in name)


def test_concurrent_sessions_both_write_side_table(spark):
    from arcane_framework_spark.queries import QUERIES

    with tempfile.TemporaryDirectory() as td:
        ready, go = os.path.join(td, "ready"), os.path.join(td, "go")
        proc = subprocess.Popen(
            [sys.executable, "-c",
             _CHILD.format(repo=REPO, ready=ready, go=go, sf=SF_DIR)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        try:
            deadline = time.time() + 120
            while not os.path.exists(ready):
                assert proc.poll() is None, proc.communicate()[0]
                assert time.time() < deadline, "child session never ready"
                time.sleep(0.1)
            open(go, "w").write("go")
            n = QUERIES["incremental_dedup_disk_documents"](
                spark, SF_DIR
            ).count()
            out, _ = proc.communicate(timeout=240)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert proc.returncode == 0, out
        assert "CHILD_ROWS" in out, out
        child_n = int(out.split("CHILD_ROWS")[1].split()[0])
        assert n == child_n
