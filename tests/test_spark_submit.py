"""Cluster launch-mode regression: `spark-submit --py-files engine.zip`
(the north rule's mandated deployment) must build and query an index
with the package resolved ONLY from the zip.

The driver scripts are copied to a directory OUTSIDE the repo and run
with that as cwd, so an accidental cwd-relative import or a module
missing from the package would fail here even though plain
`python build_index.py` from the repo root still works.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _make_zip(path: str) -> None:
    pkg = os.path.join(REPO, "search_engine_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_py_files_launch_builds_and_queries(tmp_path):
    zip_path = tmp_path / "engine.zip"
    _make_zip(str(zip_path))

    stage = tmp_path / "stage"
    stage.mkdir()
    for script in ("build_index.py", "query.py"):
        shutil.copy(os.path.join(REPO, script), stage / script)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY source
    idx = tmp_path / "idx"

    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", str(zip_path),
         str(stage / "build_index.py"),
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--input-format", "documents",
         "--index-dir", str(idx), "--n-buckets", "4"],
        cwd=str(stage), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-3000:])
    assert (idx / "index_meta.json").exists()

    # query through the same launch mode; compare against the repo-
    # local python path — identical ranked rows or the packaging lies
    r_sub = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--py-files", str(zip_path),
         str(stage / "query.py"),
         "--index-dir", str(idx), "spark join filter", "-k", "5"],
        cwd=str(stage), env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert r_sub.returncode == 0, r_sub.stderr[-3000:]
    import sys

    r_py = subprocess.run(
        [sys.executable, "query.py", "--index-dir", str(idx),
         "spark join filter", "-k", "5"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r_py.returncode == 0, r_py.stderr[-3000:]

    def ranked(out: str) -> list[str]:
        return [ln for ln in out.splitlines() if ln.split("\t")[0].isdigit()]

    assert ranked(r_sub.stdout) == ranked(r_py.stdout)
    assert len(ranked(r_py.stdout)) == 5
