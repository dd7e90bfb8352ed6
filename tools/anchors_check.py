#!/usr/bin/env python3
"""Mechanical bench adjudication against ANCHORS.json.

Usage: python3 tools/anchors_check.py BENCH_r13.json [ANCHORS.json]

ANCHORS.json holds two-pass isolated steady readings (pass 2) for the
hot set (every query >2 s steady) recorded on this tree. A driver bench
is a single cold pass on a possibly-loaded box, so per-query ratios
above 1 are expected; what matters is the SHAPE:

- a uniform ratio across the anchored set = box load (the r12 verdict's
  adjudication, now one script instead of a judge re-run);
- a single query far above the median ratio = a real regression in that
  query — look at its code/diff first.

Prints per-query ratios (worst first), the median ratio (the "box
factor"), and flags queries whose ratio exceeds 3x the median.
"""
import json
import re
import statistics
import sys


def bench_queries(bench: dict) -> dict:
    """Per-query seconds from any bench artifact shape.

    Four shapes exist in the wild:
    - BENCH_SELF.json: a top-level {"queries": {...}} dict;
    - a driver BENCH_rN.json whose "parsed" field holds the bench JSON;
    - a driver BENCH_rN.json whose truncated "tail" carries the compact
      {"hot": {...}} top-50-by-cost line graft.Bench prints inside the
      tail window (round 15) — PREFERRED over tail fragments: it is the
      full hot set, not whatever the alphabetical suffix happened to keep;
    - an older driver BENCH_rN.json with parsed=null and only a TRUNCATED
      "tail" (2000 chars) — the r13 adjudication gap. The tail still
      preserves the last ~65 '"q_name":secs' pairs of the per-query line,
      so regex them out.
    """
    bq = bench.get("queries")
    if isinstance(bq, dict) and bq:
        return bq
    parsed = bench.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed["queries"]
    tail = bench.get("tail", "")
    m = re.search(r'\{"hot":\{([^}]*)\}\}', tail)
    if m:
        pairs = re.findall(r'"(q\w*)":([0-9]+(?:\.[0-9]+)?)', m.group(1))
        # the hot line is cost-truncated, not tail-truncated: merge in any
        # extra pairs the tail fragment also preserved (hot values win)
        extra = re.findall(r'"(q\w*)":([0-9]+(?:\.[0-9]+)?)', tail[: m.start()])
        out = {name: float(sec) for name, sec in extra}
        out.update({name: float(sec) for name, sec in pairs})
        return out
    pairs = re.findall(r'"(q\w*)":([0-9]+(?:\.[0-9]+)?)', tail)
    return {name: float(sec) for name, sec in pairs}


def main() -> int:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SELF.json"
    anchors_path = sys.argv[2] if len(sys.argv) > 2 else "ANCHORS.json"
    with open(anchors_path) as f:
        anchors = json.load(f)
    with open(bench_path) as f:
        bench = json.load(f)
    bq = bench_queries(bench)
    rows = []
    missing = []
    for name, a in sorted(anchors["anchors"].items()):
        if name not in bq:
            missing.append(name)
            continue
        rows.append((bq[name] / a["steady_sec"], bq[name], a["steady_sec"], name))
    rows.sort(reverse=True)
    ratios = [r[0] for r in rows]
    med = statistics.median(ratios) if ratios else float("nan")
    print(f"anchors: {anchors_path} (recorded {anchors['recorded']}, "
          f"{len(anchors['anchors'])} queries)")
    print(f"bench:   {bench_path} ({len(bq)} queries)")
    print(f"box factor (median bench/steady over {len(rows)} anchored): {med:.2f}x")
    print()
    print(f"{'ratio':>7} {'bench_s':>8} {'steady_s':>9}  query")
    flagged = 0
    for ratio, b, a, name in rows:
        flag = "  <-- REGRESSION?" if ratios and ratio > 3 * med else ""
        if flag:
            flagged += 1
        print(f"{ratio:7.2f} {b:8.2f} {a:9.2f}  {name}{flag}")
    if missing:
        print(f"\nnot in bench: {', '.join(missing)}")
    print(f"\n{flagged} queries above 3x the median ratio "
          f"({'investigate those diffs' if flagged else 'shape is uniform box load'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
