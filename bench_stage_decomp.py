#!/usr/bin/env python3
"""Per-stage task-metric decomposition of a bench_multijvm event log.

Companion to bench_multijvm.py's whole-run `_tally_eventlog`: run the
children with HSE_MJ_KEEP_EVENTLOG=1 and feed the kept logs here to see
WHERE a K=1 vs K=4 CPU/doc gap lives, stage by stage (exchange map sides
vs compute stages). This is the tool that produced the round-5 finding in
BENCH/MULTIJVM.md §"Round 5 per-stage decomposition": tokenize/agg and
sort/encode scale at +26%/+9% per-doc CPU while the exchange map-side
stages inflate 4-5× — i.e. the residual gap is the single box's memory
controller serializing cross-process shuffle copies, not the engine's
dataflow.

Usage:
  HSE_MJ_SCRATCH=/dev/shm HSE_MJ_EVENTLOG=1 HSE_MJ_KEEP_EVENTLOG=1 \
    taskset -c 0-4  python bench_multijvm.py --child-cluster 1 4 PAGES out1.json
  ...                                        --child-cluster 4 4 PAGES4M out4.json
  python bench_stage_decomp.py /tmp/mjev1_*/app-* /tmp/mjev4_*/app-* [--per-doc N1,N4]
"""

from __future__ import annotations

import collections
import json
import sys


def tally(path: str) -> list[tuple[int, str, dict]]:
    stages: dict[int, str] = {}
    agg: dict[int, dict] = collections.defaultdict(
        lambda: collections.defaultdict(float))
    with open(path, errors="replace") as f:
        for line in f:
            if '"Event":"SparkListenerStageSubmitted"' in line:
                ev = json.loads(line)
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = si["Stage Name"].split("\n")[0][:60]
            elif '"Event":"SparkListenerTaskEnd"' in line:
                ev = json.loads(line)
                tm = ev.get("Task Metrics") or {}
                a = agg[ev["Stage ID"]]
                a["tasks"] += 1
                a["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
                a["run_s"] += tm.get("Executor Run Time", 0) / 1e3
                a["gc_s"] += tm.get("JVM GC Time", 0) / 1e3
                sw = tm.get("Shuffle Write Metrics") or {}
                a["sw_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                a["swt_s"] += sw.get("Shuffle Write Time", 0) / 1e9
                sr = tm.get("Shuffle Read Metrics") or {}
                a["sr_mb"] += (sr.get("Remote Bytes Read", 0)
                               + sr.get("Local Bytes Read", 0)) / 1e6
                a["fw_s"] += sr.get("Fetch Wait Time", 0) / 1e3
    return [(sid, stages.get(sid, "?"), agg[sid]) for sid in sorted(agg)]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    per_doc = None
    for a in sys.argv[1:]:
        if a.startswith("--per-doc"):
            per_doc = [int(x) for x in a.split("=", 1)[1].split(",")]
    for i, path in enumerate(args):
        nd = per_doc[i] if per_doc and i < len(per_doc) else None
        print(f"===== {path}" + (f"  ({nd:,} docs)" if nd else ""))
        for sid, name, a in tally(path):
            if a["cpu_s"] < 1:
                continue
            pd = f" cpu/doc {1e6 * a['cpu_s'] / nd:6.1f}us" if nd else ""
            print(f"stage {sid:3d} {name:48s} tasks {int(a['tasks']):4d} "
                  f"cpu {a['cpu_s']:8.1f}s{pd} run {a['run_s']:8.1f}s "
                  f"gc {a['gc_s']:6.1f}s swMB {a['sw_mb']:8.0f} "
                  f"srMB {a['sr_mb']:8.0f} fw {a['fw_s']:6.1f}s "
                  f"wt {a['swt_s']:6.1f}s")


if __name__ == "__main__":
    main()
