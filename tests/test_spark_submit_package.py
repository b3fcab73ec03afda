"""End-to-end packaging gate for the north rule's deployment shape.

The rule ships the engine as ``spark-submit --py-files
dist/bitextor_spark.zip jobs/crawl_job.py`` (BASELINE.json north_rule;
README "Run"; jobs/crawl_job.py docstring). This test builds the zip with
``jobs/package.sh`` and drives a small synthetic-world crawl through a
REAL ``spark-submit`` subprocess — launched from a cwd outside the repo
with a scrubbed PYTHONPATH, so the zip is the only place
``bitextor_spark`` can come from. A module or data file missing from the
package fails here instead of on the cluster.

Reference parity note: the reference's deployment unit is a Snakemake
workflow invoked by ``bitextor.sh`` (/root/reference/bitextor.sh); the
Spark-native equivalent of "the pipeline is runnable from the shipped
artifact" is exactly this spark-submit contract.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_packaged_crawl(tmp_path):
    build = subprocess.run(
        ["bash", os.path.join(REPO, "jobs", "package.sh")],
        capture_output=True, text=True, timeout=120,
    )
    assert build.returncode == 0, build.stderr[-2000:]
    zip_path = os.path.join(REPO, "dist", "bitextor_spark.zip")
    assert os.path.exists(zip_path)

    # the TRAINED default artifacts must resolve from inside the zip —
    # a __file__-relative os.path probe would silently degrade them to
    # the stand-ins on a cluster (models.py reads via importlib.resources)
    probe = subprocess.run(
        [
            sys.executable, "-c",
            "from bitextor_spark.models import (load_langid_profile, "
            "load_rerank_model, TrainedLogisticRerank);"
            "rows = load_langid_profile();"
            "assert len(rows) > 500, f'fallback profile from zip: {len(rows)}';"
            "m = load_rerank_model();"
            "assert isinstance(m, TrainedLogisticRerank), type(m).__name__;"
            "print('zip artifacts ok', len(rows))",
        ],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": zip_path,
             "BITEXTOR_SPARK_LANGID_PROFILE": "",
             "BITEXTOR_SPARK_RERANK_MODEL": ""},
        timeout=60,
    )
    assert probe.returncode == 0, probe.stderr[-2000:]
    assert "zip artifacts ok" in probe.stdout

    env = {**os.environ, "PYTHONPATH": ""}
    run = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "crawl_job.py"),
            "--catalog-root", str(tmp_path / "state"),
            "--synthetic-world", "3000",
            "--max-epochs", "3",
            "--verify-payloads",
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert run.returncode == 0, (run.stderr or run.stdout)[-4000:]
    stat_lines = [
        ln for ln in run.stdout.strip().splitlines() if ln.startswith("{")
    ]
    assert stat_lines, run.stdout[-2000:]
    stats = json.loads(stat_lines[-1])
    assert stats["epochs"] >= 1
    assert stats["fetched"] > 0
    assert stats["attempts"] >= stats["fetched"]
    # the run committed resumable state under --catalog-root
    assert (tmp_path / "state").is_dir()
