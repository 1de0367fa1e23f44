"""The north rule's submission shape, actually exercised: package the
library into dist/gliner_spark.zip, then spark-submit jobs/run_kg.py
with --py-files in a FRESH process whose cwd is outside the repo — so
imports must come from the zip, exactly as on a cluster executor."""

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def spark():
    from gliner_spark.session import build_session

    s = build_session(app_name="gliner-tests", cores=4)
    yield s
    s.stop()


def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    sys.path.insert(0, REPO)
    from gliner_spark.sources.pages import synthesize_pages
    from tools.package_pyfiles import build

    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "kg_out")
    synthesize_pages(spark, 60).coalesce(2).write.parquet(src)
    zip_path = build(str(tmp_path / "dist"))
    assert os.path.getsize(zip_path) > 10_000

    submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(submit):
        submit = "spark-submit"  # PATH fallback
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "run_kg.py"),
            "--input", src,
            "--output", out,
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    nodes = spark.read.parquet(f"{out}/nodes")
    assert nodes.count() > 0
    assert {"entity_id", "canonical", "label"} <= set(nodes.columns)
    edges = spark.read.parquet(f"{out}/edges")
    assert edges.where(F.col("support") >= 1).count() == edges.count()
    # the job's stdout reports per-table row counts
    assert "nodes:" in res.stdout and "edges:" in res.stdout
