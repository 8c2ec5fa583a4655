"""spark-submit --py-files launch path (north rule: the job must run via
spark-submit with the package shipped as a zip)."""

from __future__ import annotations

import json
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit")

pytestmark = pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")


def _zip_package(tmp_path: Path) -> Path:
    zpath = tmp_path / "curies_spark.zip"
    src = REPO / "curies_spark"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(src.rglob("*.py")):
            zf.write(f, f.relative_to(REPO))
    return zpath


def _submit(zpath: Path, out: Path, *extra: str) -> dict:
    cmd = [
        SPARK_SUBMIT,
        "--master",
        "local[4]",
        "--conf",
        "spark.ui.enabled=false",
        "--conf",
        "spark.sql.shuffle.partitions=8",
        "--py-files",
        str(zpath),
        str(REPO / "curies_spark" / "plans" / "submit_job.py"),
        "--synthetic",
        "4000",
        "--output",
        str(out),
        "--shards",
        "2",
        *extra,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_python_dash_m_entrypoint_help():
    """`python -m curies_spark` is the job CLI (reference __main__.py
    parity); --help must work without touching Spark."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "curies_spark", "--help"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 0
    assert "KG construction" in proc.stdout


def test_spark_submit_pyfiles_and_resume(tmp_path):
    zpath = _zip_package(tmp_path)
    out = tmp_path / "kg"

    first = _submit(zpath, out, "--validate-invariant")
    assert first["input_rows"] == 4000
    assert first["triples"] > 0
    assert first["resumed_shards"] == 0
    assert first["content_sha256_invariant"] == "OK"

    # drop one shard manifest → resume recomputes only that shard and
    # reproduces identical totals
    (out / "_manifests" / "shard-1.json").unlink()
    second = _submit(zpath, out)
    assert second["resumed_shards"] == 1
    assert second["triples"] == first["triples"]
    assert second["mentions"] == first["mentions"]
