"""The north_rule's deployment shape, driven for real: package the
engine as a zip, launch ``spark-submit --py-files roll_spark.zip`` in a
fresh subprocess FROM A FOREIGN CWD (so the zip — not the repo checkout
— is the only import source), and verify the written retention tiers
against an in-process recompute. A second identical submit exercises
the checkpoint manifests' idempotent re-run path."""

from __future__ import annotations

import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not Path(SPARK_SUBMIT).exists(), reason="no spark-submit")
def test_spark_submit_pyfiles_rollup(spark, tmp_path):
    zpath = tmp_path / "roll_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for f in (REPO / "roll_spark").rglob("*.py"):
            z.write(f, f.relative_to(REPO))
    # job script copied OUTSIDE the repo: its sys.path bootstrap then
    # points at tmp_path (which has no roll_spark/), so the import MUST
    # be served by --py-files
    job = tmp_path / "submit_rollup.py"
    shutil.copy(REPO / "tools" / "submit_rollup.py", job)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    cmd = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", str(zpath), str(job),
        "--input", f"{SF_DIR}/events.parquet",
        "--output", str(out), "--checkpoint", str(ckpt),
        "--value", "value", "--ts", "ts", "--series", "user_id",
        "--tiers", "1m,1h",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                       cwd=tmp_path)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])

    # written 1h tier == in-process cascade, cell for cell
    from pyspark.sql import functions as F

    from roll_spark.plans import tiers as T

    got = (
        spark.read.parquet(f"{out}/tier=1h")
        .select("user_id", "bucket_ts", "n", F.round("mean_x", 9).alias("m"))
        .collect()
    )
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exp = (
        T.finalize(T.cascade(raw, "value", "ts", "user_id", tiers=("1m", "1h"))["1h"])
        .select("user_id", "bucket_ts", "n", F.round("mean_x", 9).alias("m"))
        .collect()
    )
    assert len(got) == len(exp) > 0
    assert {tuple(r) for r in got} == {tuple(r) for r in exp}

    # idempotent re-submit: completed stages served from the lineage
    # manifests; same rows come out
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                        cwd=tmp_path)
    assert r2.returncode == 0, r2.stderr[-4000:]
    again = (
        spark.read.parquet(f"{out}/tier=1h")
        .select("user_id", "bucket_ts", "n", F.round("mean_x", 9).alias("m"))
        .collect()
    )
    assert {tuple(r) for r in again} == {tuple(r) for r in exp}
