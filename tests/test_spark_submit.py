"""Executable evidence for the cluster launch path: the suite job runs
via REAL ``spark-submit --py-files chronominer_spark.zip`` (the north
rule's deployment form), with the package importable ONLY from the zip —
the driver script is copied alone into an empty working directory, so a
successful run proves the ship-the-zip packaging works, not just that
the repo happens to be on PYTHONPATH."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(dest_dir: str) -> str:
    zpath = os.path.join(dest_dir, "chronominer_spark.zip")
    pkg = os.path.join(REPO, "chronominer_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files_runs_suite(tmp_path):
    spark_submit = os.path.join(pyspark.__path__[0], "bin", "spark-submit")
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit launcher not shipped with this pyspark")

    zpath = _build_zip(str(tmp_path))
    # driver script alone, outside the repo: imports MUST come from the zip
    driver = tmp_path / "run_suite.py"
    shutil.copyfile(
        os.path.join(REPO, "chronominer_spark", "jobs", "run_suite.py"),
        driver)
    out = tmp_path / "out"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.driver.memory=4g",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zpath, str(driver),
         "--synthetic", "20000", "--output", str(out), "--json"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=540)
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("{")][-1]
    payload = json.loads(line)
    assert payload["status"] == "complete"
    assert payload["failed"] == 0
    assert payload["rows_validated"] >= 20000
    # results landed where a downstream reader expects them
    assert (out / "manifest.json").exists()
