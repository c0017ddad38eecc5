"""Commit-level interleaved A/B for the r03→r04 embedding_dups median
drift (0.854 s → 1.733 s with no code change in similarity.py —
VERDICT r04 "What's wrong" #4). Alternates fresh subprocesses running
q_embedding_dups (plus embedding_topk as a co-drifting control) from
the round-3 tree vs HEAD, 5 alternations each, BENCH-style 3-run
medians per process. If the two trees' distributions overlap, the
drift was ambient host load, same failure mode as the r01 headline
saga. Usage: python tools/ab_embedding_dups.py [r03_tree_path]."""

import json
import statistics
import subprocess
import sys

DRIVER = r"""
import sys, time, json
sys.path.insert(0, sys.argv[1])
import os
os.chdir(sys.argv[1])
import __spark_entry__ as e
from feast_spark.session import get_spark
spark = get_spark("ab_embdups", parallelism=32)
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name in ("embedding_dups", "embedding_topk"):
    fn = e.queries()[name]
    fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        runs.append(time.monotonic() - t0)
        spark.catalog.clearCache()
    out[name] = runs
print("ABJSON:" + json.dumps(out))
"""


def run_tree(tree: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", DRIVER, tree],
        capture_output=True,
        text=True,
        timeout=600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABJSON:"):
            return json.loads(line[len("ABJSON:"):])
    raise RuntimeError(f"no result from {tree}: {p.stderr[-400:]}")


def main():
    r03 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r03tree"
    head = "/root/repo"
    acc: dict = {}
    for alt in range(5):
        for label, tree in (("r03", r03), ("head", head)):
            res = run_tree(tree)
            for q, runs in res.items():
                acc.setdefault(q, {}).setdefault(label, []).append(
                    round(statistics.median(runs), 3)
                )
            print(f"alt {alt} {label}: "
                  + " ".join(f"{q}={statistics.median(r):.3f}s" for q, r in res.items()),
                  flush=True)
    print()
    for q, sides in acc.items():
        for label, meds in sides.items():
            print(
                f"{q:16s} {label:4s} median-of-medians="
                f"{statistics.median(meds):.3f}s  all={meds}"
            )


if __name__ == "__main__":
    main()
