#!/usr/bin/env python3
"""Per-query bench noise bands (round-16, verdict-15 demand #7).

Round after round, 5-10 flag-slots went to "regressions" that were
min-of-2 host noise with byte-identical shuffle (r13: six heads, r14:
dataset_robust_scale, r15: eight). This tool turns that adjudication
into arithmetic:

  build    python3 tools/bench_bands.py build
           Mines every committed version of BENCH_FULL.json (the
           complete per-query artifact; the driver's BENCH_r*.json
           keep only a truncated tail) from git history, keeps sf0.1
           default-rep runs, and reduces to BENCH_BANDS.json:
           per query {n, min, median, bytes} where bytes is the
           shuffle read+write of the most recent sample.

  verdict  python3 tools/bench_bands.py verdict [BENCH_FULL.json]
           Compares a bench artifact against the bands and prints one
           verdict per departing query:
             NOISE    sec > median*1.5 but shuffle bytes byte-identical
                      to the band -> the established min-of-reps noise
                      class, no action
             REGRESS  sec > median*1.5 AND bytes changed -> a real
                      plan/data change, re-measure (REMEASURE protocol)
             NEW      query not in the bands yet (no history)
           Exit code stays 0 - the verdicts are evidence for the
           round log, not a gate (a genuine REGRESS gets adjudicated
           with a reps>=5 REMEASURE artifact, not an rm -rf).
"""
import json
import statistics
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BANDS = os.path.join(REPO, "BENCH_BANDS.json")
FACTOR = 1.5
MIN_SEC = 0.5  # sub-noise-floor queries never flag


def mine():
    shas = subprocess.check_output(
        ["git", "log", "--format=%H", "--", "BENCH_FULL.json"],
        cwd=REPO, text=True).split()
    samples = {}    # query -> [sec, ...] oldest-last
    bytes_of = {}   # query -> most recent (read+write)
    byte_sets = {}  # query -> ALL historical totals (staged families
                    # swap byte attribution with build order - the
                    # graph_resource_alloc REGRESS false positive,
                    # REMEASURE_r16 - so "unchanged" means "seen before")
    kept = 0
    for sha in shas:  # newest first
        try:
            doc = json.loads(subprocess.check_output(
                ["git", "show", f"{sha}:BENCH_FULL.json"],
                cwd=REPO, text=True))
        except Exception:
            continue
        if "sf0.1" not in str(doc.get("sf", "")) or doc.get("reps", 2) != 2:
            continue  # bands are the sf0.1 min-of-2 protocol only
        kept += 1
        for q, sec in doc.get("queries", {}).items():
            samples.setdefault(q, []).append(float(sec))
        for q, b in doc.get("bytes", {}).items():
            tot = int(b.get("shuffle_read", 0)) + int(b.get("shuffle_write", 0))
            if q not in bytes_of:
                bytes_of[q] = tot
            byte_sets.setdefault(q, set()).add(tot)
    return kept, samples, bytes_of, byte_sets


def build():
    kept, samples, bytes_of, byte_sets = mine()
    bands = {q: {
        "n": len(ss),
        "min": round(min(ss), 3),
        "median": round(statistics.median(ss), 3),
        "bytes": bytes_of.get(q),
        "byte_set": sorted(byte_sets.get(q, [])),
    } for q, ss in sorted(samples.items())}
    doc = {
        "what": ("Per-query sf0.1 min-of-2 bench history mined from every "
                 "committed BENCH_FULL.json; verdict mode flags a query "
                 f"only when sec > median*{FACTOR} AND its shuffle bytes "
                 "changed - byte-identical departures are the adjudicated "
                 "min-of-reps host-noise class (REMEASURE_r14/r15)."),
        "factor": FACTOR,
        "n_history_runs": kept,
        "queries": bands,
    }
    with open(BANDS, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"BENCH_BANDS.json: {len(bands)} queries from {kept} runs")


def verdict(path):
    bands = json.load(open(BANDS))["queries"]
    cur = json.load(open(path))
    cur_bytes = {q: int(b.get("shuffle_read", 0)) + int(b.get("shuffle_write", 0))
                 for q, b in cur.get("bytes", {}).items()}
    flags = {"NOISE": [], "REGRESS": [], "NEW": []}
    for q, sec in sorted(cur.get("queries", {}).items()):
        band = bands.get(q)
        if band is None or band["n"] < 2:
            flags["NEW"].append(q)
            continue
        if sec <= max(band["median"] * FACTOR, MIN_SEC):
            continue
        seen = set(band.get("byte_set") or
                   ([band["bytes"]] if band["bytes"] is not None else []))
        same_bytes = cur_bytes.get(q) in seen
        kind = "NOISE" if same_bytes else "REGRESS"
        flags[kind].append(q)
        print(f"{kind:7s} {q}: {sec:.2f}s vs band median {band['median']}s "
              f"(min {band['min']}s, n={band['n']}), bytes "
              f"{cur_bytes.get(q)} vs {band['bytes']}"
              + (" [byte-identical -> min-of-reps noise class]"
                 if same_bytes else " [bytes moved -> re-measure]"))
    print(f"band verdicts: {len(flags['REGRESS'])} REGRESS, "
          f"{len(flags['NOISE'])} noise, {len(flags['NEW'])} new/unbanded "
          f"of {len(cur.get('queries', {}))} queries")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "build"
    if mode == "build":
        build()
    elif mode == "verdict":
        verdict(sys.argv[2] if len(sys.argv) > 2 else
                os.path.join(REPO, "BENCH_FULL.json"))
    else:
        sys.exit(__doc__)
