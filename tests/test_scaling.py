"""North-rule replay: the same build + reference query set executed at two
parallelism levels (local[2] vs local[8] here — the N vs 4N stand-in) must
produce IDENTICAL top-k ids and scores (±1e-9), from both a fresh and a
checkpoint-resumed index. Each level runs in its own subprocess because a
process owns at most one SparkContext."""

import json
import os
import subprocess
import sys

import pytest

SCRIPT = r"""
import json, sys, shutil
from lse.session import get_spark
from lse.build import build_index
from lse.engine import SearchEngine
from lse.fixtures import make_repos_df

cores, index_dir, crash_stage = sys.argv[1], sys.argv[2], sys.argv[3]
spark = get_spark("scale-test", master=f"local[{cores}]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
source = make_repos_df(spark, n_docs=120, partitions=4)
if crash_stage != "none":
    # simulated crash + resume: the queried index is checkpoint-resumed
    build_index(spark, source, index_dir, n_buckets=4, index_partitions=4,
                stop_after_stage=crash_stage)
build_index(spark, source, index_dir, n_buckets=4, index_partitions=4)
eng = SearchEngine(spark, index_dir)
out = {}
for q in ["java", "java AND programming", '"distributed system"', "config*",
          "-draft NOT internal", "lang:md", "size:100..900",
          "java OR python OR spark"]:
    hits, total = eng.search_result(q, 10)
    out[q] = {"hits": [[d, round(s, 10)] for d, s in hits], "total": total}
print(json.dumps(out))
spark.stop()
"""


def run_level(cores: str, tmp_path, crash_stage: str = "none") -> dict:
    idx = str(tmp_path / f"idx_{cores}_{crash_stage}")
    env = dict(os.environ, PYTHONPATH=os.getcwd())
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT, cores, idx, crash_stage],
        capture_output=True, text=True, timeout=500, env=env, cwd=os.getcwd(),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return json.loads(res.stdout.strip().splitlines()[-1])


def test_results_identical_across_parallelism_and_resume(tmp_path):
    low = run_level("2", tmp_path)
    high = run_level("8", tmp_path)
    resumed = run_level("8", tmp_path, crash_stage="stats")
    assert low == high, "results differ between parallelism levels"
    assert high == resumed, "results differ after checkpoint resume"
