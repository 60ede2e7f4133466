"""North-rule deployment path: ``spark-submit --py-files`` (BASELINE.json:14,
reference job-entry parity /root/reference/geoIR/cli.py:21-154).

Every other test imports the package from the repo checkout; a cluster ships
it as a zip on PYTHONPATH. This test proves zip-only deployment end-to-end:
the package is zipped, the repo root is scrubbed from the environment, and
two SEPARATE spark-submit processes run build-index then search from a clean
cwd — so the imports must resolve from the --py-files zip and the index must
round-trip through disk across driver processes (the cluster lifecycle, not
the notebook one)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile
from pathlib import Path

import pyspark

REPO = Path(__file__).resolve().parents[1]
PKG = "geometric_aware_retrieval_v2_spark"
SPARK_SUBMIT = str(Path(pyspark.__file__).parent / "bin" / "spark-submit")

LAUNCHER = (
    "import sys\n"
    f"from {PKG}.cli import main\n"
    "sys.exit(main(sys.argv[1:]))\n"
)


def _make_pkg_zip(dest: Path) -> Path:
    zpath = dest / "gar2.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / PKG).rglob("*.py")):
            if "__pycache__" in p.parts:
                continue
            z.write(p, p.relative_to(REPO))
    return zpath


def _submit(args: list[str], cwd: Path, zip_path: Path) -> str:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(zip_path),
        str(cwd / "launcher.py"),
        *args,
    ]
    out = subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=900
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stderr[-4000:]}"
    return out.stdout


def test_spark_submit_py_files_build_and_search(tmp_path):
    zip_path = _make_pkg_zip(tmp_path)
    (tmp_path / "launcher.py").write_text(LAUNCHER)

    # tiny deterministic docs table written WITHOUT Spark so the submitted
    # jobs are the only Spark processes touched by this test
    import pyarrow as pa
    import pyarrow.parquet as pq

    # doc_id is int64: the engine's canonical docs shape (corpus_to_docs
    # content-addressed id; documents.parquet doc_id) is long throughout
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "content": [
                "def alpha(beta): return beta + gamma",
                "alpha = delta",
                "class Epsilon: pass",
                "zeta eta theta iota kappa",
            ],
        }
    )
    corpus = tmp_path / "corpus.parquet"
    pq.write_table(docs, corpus)
    idx = tmp_path / "idx"

    build_out = _submit(
        [
            "build-index", "--input", str(corpus), "--index", str(idx),
            "--partitions", "2", "--shards", "2", "--tokenizer", "code",
        ],
        tmp_path, zip_path,
    )
    meta_line = [l for l in build_out.splitlines() if l.startswith("{")][-1]
    meta = json.loads(meta_line)
    assert meta["n_docs"] == 4
    assert (idx / "meta.json").exists()

    search_out = _submit(
        ["search", "--index", str(idx), "--query", "alpha", "--k", "5"],
        tmp_path, zip_path,
    )
    hits = json.loads(
        [l for l in search_out.splitlines() if l.startswith("[")][-1]
    )
    assert {h["doc_id"] for h in hits} == {1, 2}
    # same tf=1 for 'alpha' in both; BM25 length normalization (b>0) must
    # rank the shorter doc 2 first
    assert hits[0]["doc_id"] == 2 and hits[0]["rank"] == 1
