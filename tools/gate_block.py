#!/usr/bin/env python3
"""Generate the SURVEY/README gate numbers from fresh run artifacts
instead of hand-typing them (they have drifted twice: r10 said 617
ScalaTest while HEAD ran 621).

Usage:
  sbt -batch test | tee /tmp/sbt_test.log
  sbt -batch "runMain graft.Verify <sfDir> <outDir>"
  python3 tools/check_oracle.py <sfDir> <outDir>   # must be all-PASS
  SPARK_GRAFT_SF_DIR=... sbt -batch "runMain graft.Bench"
  python3 tools/gate_block.py /tmp/sbt_test.log <outDir> /tmp/graft_bench.json

Prints the gate block; paste it into SURVEY.md (gate state) and sync
README.md's counts to the same numbers.
"""
import json
import re
import sys


def main() -> None:
    test_log, verify_dir, bench_json = sys.argv[1], sys.argv[2], sys.argv[3]

    with open(test_log) as f:
        log = f.read()
    # Use the LAST run in the log (a tee -a'd log may hold several),
    # and require ITS summary line to report succeeded == total with
    # zero failures — no fallback that could certify a red log.
    runs = list(re.finditer(r"Total number of tests run: (\d+)", log))
    if not runs:
        sys.exit("test log has no 'Total number of tests run' line")
    tests = int(runs[-1].group(1))
    summary = re.search(
        r"Tests: succeeded (\d+), failed (\d+)", log[runs[-1].end():])
    if not summary or int(summary.group(1)) != tests or \
            int(summary.group(2)) != 0:
        sys.exit(
            f"last test run is not clean: total={tests}, summary="
            f"{summary.group(0) if summary else 'missing'}")

    with open(f"{verify_dir}/_expected.json") as f:
        expected = json.load(f)
    with open(f"{verify_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    with open(f"{verify_dir}/_failed.json") as f:
        failed = json.load(f)
    if failed:
        sys.exit(f"verify run has failures: {sorted(failed)}")
    registry = len(expected)
    oracled = len([k for k in expected if oracles.get(k)])
    rows_only = registry - oracled

    with open(bench_json) as f:
        bench = json.loads(f.read().strip())
    n_bench = len(bench["queries"])
    total = bench["value"]
    if bench.get("failed"):
        sys.exit(f"bench has failures: {bench['failed']}")

    print(
        f"Gate state: {registry} registry entries ({oracled} oracled — "
        f"hash-green, + {rows_only} declared rows-only),\n"
        f"{tests} ScalaTest green. Closing bench ({bench['sf']}): "
        f"{total:.1f} s / {n_bench} = {total / n_bench:.2f} s/query, "
        f"failed:[]."
    )

    # Worst-5 entries straight from the shipped artifact, so the
    # narrative never quotes a number the artifact doesn't carry
    # (r11 lesson: SURVEY said 3.6 s where BENCH_r11 recorded 4.73).
    tail = bench.get("tail", {})
    worst = sorted(tail.items(),
                   key=lambda kv: -kv[1].get("isolated",
                                             kv[1].get("in_suite", 0)))[:5]
    if worst:
        print("Worst 5 (in-suite / isolated s): " + ", ".join(
            f"{name} {v.get('in_suite', float('nan')):.2f}/"
            f"{v.get('isolated', float('nan')):.2f}"
            for name, v in worst) + ".")


if __name__ == "__main__":
    main()
