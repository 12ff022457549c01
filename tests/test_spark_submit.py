"""North-rule ship path: real ``spark-submit --py-files`` smoke test.

Packages the engine with tools/make_pyfiles.sh, then runs the actual
``spark-submit`` binary from a NEUTRAL working directory (so every
gaia_* import must resolve from the shipped zip, not the repo on
sys.path) over a tiny synthesized corpus, and checks the emitted
triples against the golden oracle (P = R = 1.0).
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit binary not available")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    subprocess.run(["sh", os.path.join(REPO, "tools", "make_pyfiles.sh")],
                   check=True, capture_output=True)
    zip_path = os.path.join(REPO, "dist", "gaia_spark.zip")
    assert os.path.exists(zip_path)

    # corpus synthesis may import from the repo; the SUBMITTED job may not
    import sys
    sys.path.insert(0, REPO)
    from gaia_synth import write_corpus
    corpus = tmp_path / "corpus"
    out = tmp_path / "kg"
    write_corpus(str(corpus), 60)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "2"
    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "run_pipeline.py"),
         "--corpus", str(corpus), "--out", str(out)],
        cwd=str(tmp_path),  # neutral cwd: repo packages NOT importable
        env=env, capture_output=True, text=True, timeout=420)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-4000:]
    stages = json.loads(res.stdout.strip().splitlines()[-1])
    assert stages["triples"]["rows"] > 0, stages

    # read back via the catalog and compare with the golden oracle
    from gaia_ref.oracle import run_oracle
    from gaia_spark.catalog import Catalog
    from gaia_spark.session import get_spark
    from gaia_synth import gen_pages

    spark = get_spark(app_name="gaia_tests", cpus=8, shuffle_partitions=8)
    got = {
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
        for r in Catalog(str(out)).read(spark, "triples").collect()
    }
    want = {
        (t["url"], t["sent_id"], t["subj"], t["pred"], t["obj"])
        for t in run_oracle(gen_pages(60))["triples"]
    }
    assert got == want  # P = R = 1.0
