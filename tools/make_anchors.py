#!/usr/bin/env python3
"""Generate ANCHORS.json from a two-pass graft.Bench JSON line.

Usage: python3 tools/make_anchors.py /tmp/bench_two_pass.json [round]

Takes the bench's `queries_p2` map (pass-2 = steady: JIT, codegen, and
file-listing warm), keeps every query with steady > 2 s (the hot set the
r12 verdict asked to anchor) and writes ANCHORS.json with the recording
context. Refresh whenever an anchored query's code changes:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_PASSES=2 \
        sbt -batch "runMain graft.Bench" | grep '"queries_p2"' > /tmp/b.json
    python3 tools/make_anchors.py /tmp/b.json <round>

Adjudicate a driver bench against it with tools/anchors_check.py.
"""
import datetime
import json
import re
import sys


def main() -> int:
    path = sys.argv[1]
    rnd = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    with open(path) as f:
        txt = f.read()
    # sbt prefixes lines with "[info] " — take the JSON braces span
    m = re.search(r"\{.*\}", txt, re.S)
    bench = json.loads(m.group(0))
    p1 = bench["queries"]
    p2 = bench["queries_p2"]
    # Per-query variance notes that survive regeneration: queries whose wall
    # time is driver-scheduling/FS-bound at sf0.1 (many tiny jobs, little
    # data work) swing 2-3x run to run — a single reading above its anchor
    # is only a regression if the run's other anchors held (the shape rule).
    NOTES = {
        "q_cc_stream": ("driver/FS-bound: ~137 jobs over 3 store folds; "
                        "r14 A/B measured 16-39 s spread on one tree — "
                        "judge the shape, not this absolute"),
    }
    anchors = {
        name: {"steady_sec": round(sec, 3), "cold_sec": round(p1[name], 3),
               "round": rnd,
               **({"note": NOTES[name]} if name in NOTES else {})}
        for name, sec in sorted(p2.items()) if sec > 2.0
    }
    out = {
        "recorded": datetime.date.today().isoformat(),
        "method": ("SPARK_GRAFT_PASSES=2 full-set graft.Bench at sf0.1, "
                   "local[32]; steady = pass 2 (same JVM, caches warm)"),
        "box_note": ("shared box — absolute seconds carry the day's load "
                     "factor; adjudicate SHAPE via tools/anchors_check.py "
                     "(uniform ratio = load, single outlier = regression)"),
        "set_size": len(p2),
        "total_cold_sec": round(bench["value"], 1),
        "total_steady_sec": round(bench["total_p2"], 1),
        "anchors": anchors,
    }
    with open("ANCHORS.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"ANCHORS.json: {len(anchors)} anchored of {len(p2)} queries; "
          f"totals cold {out['total_cold_sec']} / steady {out['total_steady_sec']} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
