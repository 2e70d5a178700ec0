"""North-rule deployment clause: the crawl loop runs via
``spark-submit --py-files nutch_spark.zip`` in a cold separate process
(the package importable ONLY from the zip — cwd is a temp dir and
PYTHONPATH is stripped), and a second cold process resumes mid-crawl
from the snapshot warehouse (``--resume``)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(spark_submit, zip_path, driver, wh, tmp_path, extra):
    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
        NUTCH_SPARK_MASTER="local[2]",
    )
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    args = [
        spark_submit, "--master", "local[2]",
        "--driver-memory", "2g",
        "--py-files", str(zip_path), str(driver),
        "--warehouse", str(wh), "--cycles", "1",
        "--top-n", "200", "--n-docs", "1000", "--n-hosts", "20",
        *extra,
    ]
    r = subprocess.run(
        args, cwd=tmp_path, env=env, capture_output=True, text=True, timeout=480
    )
    assert r.returncode == 0, (r.stderr or r.stdout)[-3000:]
    lines = [json.loads(ln) for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no metrics line in stdout: {r.stdout[-1000:]}"
    return lines


def test_spark_submit_pyfiles_run_then_cold_resume(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    zip_path = tmp_path / "nutch_spark.zip"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py"), str(zip_path)],
        check=True, cwd=REPO,
    )
    driver = tmp_path / "driver.py"
    shutil.copy(
        os.path.join(REPO, "nutch_spark", "pipeline", "crawl_loop.py"), driver
    )
    wh = tmp_path / "wh"

    first = _run(spark_submit, zip_path, driver, wh, tmp_path, [])
    assert first[0]["cycle"] == 1
    assert first[0]["fetched"] > 0
    assert first[0]["snapshot_id"]

    # fresh JVM + fresh Python process: resume from the warehouse's
    # current crawldb snapshot and run the NEXT cycle
    second = _run(spark_submit, zip_path, driver, wh, tmp_path, ["--resume"])
    assert second[0]["cycle"] == 2
    assert second[0]["db_size"] >= first[0]["db_size"]
