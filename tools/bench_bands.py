#!/usr/bin/env python3
"""Per-query bench noise bands (round-16, verdict-15 demand #7;
rep-normalized + era-aware in round 17, verdict-16 demand #2).

Round after round, 5-10 flag-slots went to "regressions" that were
min-of-2 host noise with byte-identical shuffle (r13: six heads, r14:
dataset_robust_scale, r15: eight). This tool turns that adjudication
into arithmetic:

  build    python3 tools/bench_bands.py build
           Mines every committed version of BENCH_FULL.json (the
           complete per-query artifact; the driver's BENCH_r*.json
           keep only a truncated tail) from git history, keeps sf0.1
           default-rep runs (EXACT sf-dir basename match - an sf0.15
           run must not pollute the bands), and reduces to
           BENCH_BANDS.json: per query {n, min, median, bytes,
           byte_latest, byte_set}.

           Byte normalization (round-17): the r16 driver run reported
           shuffle bytes at exactly HALF the historical totals on
           309/345 queries - a per-rep vs summed-over-reps accounting
           shift, not 309 plan changes. Every byte total is therefore
           recorded in BOTH accountings, {total, total // reps}, and
           matching happens on the union, so either accounting of the
           same plan compares byte-identical.

  verdict  python3 tools/bench_bands.py verdict [BENCH_FULL.json]
           Compares a bench artifact against the bands and prints one
           verdict per departing query:
             NOISE     sec > median*1.5 but shuffle bytes match the
                       MOST RECENT banded run -> the established
                       min-of-reps noise class, no action
             BYTE_ERA  sec > median*1.5 and bytes match only an OLDER
                       run's bytes -> possibly a plan REVERSION to a
                       pre-optimization era (the basket-staging class)
                       - re-measure and diff the plan; never silently
                       passed as noise (advice r16)
             REGRESS   sec > median*1.5 AND bytes match no banded run
                       -> a real plan/data change, re-measure
                       (REMEASURE protocol)
             NEW       query not in the bands yet (no history)
           Exit code stays 0 - the verdicts are evidence for the
           round log, not a gate (a genuine REGRESS gets adjudicated
           with a reps>=5 REMEASURE artifact, not an rm -rf).
"""
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BANDS = os.path.join(REPO, "BENCH_BANDS.json")
FACTOR = 1.5
MIN_SEC = 0.5  # sub-noise-floor queries never flag
SF = "sf0.1"   # bands are the sf0.1 protocol only


def sf_of(doc):
    """Exact sf-dir basename ('/root/testdata/sf0.1' and 'sf0.1' both
    -> 'sf0.1'; 'sf0.15' stays distinct - advice r16)."""
    return os.path.basename(str(doc.get("sf", "")).rstrip("/"))


def byte_candidates(total, reps):
    """Both byte accountings of one run: the recorded total and its
    per-rep value (when the total divides evenly)."""
    cands = {int(total)}
    if reps and int(total) % int(reps) == 0:
        cands.add(int(total) // int(reps))
    return cands


def mine():
    shas = subprocess.check_output(
        ["git", "log", "--format=%H", "--", "BENCH_FULL.json"],
        cwd=REPO, text=True).split()
    samples = {}     # query -> [sec, ...] NEWEST-first (git log order)
    bytes_of = {}    # query -> most recent recorded total (display)
    byte_latest = {} # query -> candidates from the NEWEST run seen
    byte_sets = {}   # query -> candidates across ALL history (staged
                     # families swap byte attribution with build order
                     # - the graph_resource_alloc false positive,
                     # REMEASURE_r16 - so era membership is a set)
    kept = 0
    for sha in shas:  # newest first
        try:
            doc = json.loads(subprocess.check_output(
                ["git", "show", f"{sha}:BENCH_FULL.json"],
                cwd=REPO, text=True))
        except Exception:
            continue
        reps = doc.get("reps", 2)
        if sf_of(doc) != SF or reps != 2:
            continue  # bands are the sf0.1 min-of-2 protocol only
        kept += 1
        for q, sec in doc.get("queries", {}).items():
            samples.setdefault(q, []).append(float(sec))
        for q, b in doc.get("bytes", {}).items():
            tot = int(b.get("shuffle_read", 0)) + int(b.get("shuffle_write", 0))
            cands = byte_candidates(tot, reps)
            if q not in bytes_of:
                bytes_of[q] = tot
                byte_latest[q] = cands
            byte_sets.setdefault(q, set()).update(cands)
    return kept, samples, bytes_of, byte_latest, byte_sets


def build():
    kept, samples, bytes_of, byte_latest, byte_sets = mine()
    bands = {q: {
        "n": len(ss),
        "min": round(min(ss), 3),
        "median": round(statistics.median(ss), 3),
        "bytes": bytes_of.get(q),
        "byte_latest": sorted(byte_latest.get(q, [])),
        "byte_set": sorted(byte_sets.get(q, [])),
    } for q, ss in sorted(samples.items())}
    doc = {
        "what": ("Per-query sf0.1 min-of-2 bench history mined from every "
                 "committed BENCH_FULL.json. Byte totals carry BOTH rep "
                 "accountings {total, total//reps}. verdict mode flags a "
                 f"query only when sec > median*{FACTOR}: bytes matching "
                 "the most recent run -> NOISE (adjudicated min-of-reps "
                 "host-noise class, REMEASURE_r14/r15/r16); bytes matching "
                 "only an older run -> BYTE_ERA (possible plan reversion, "
                 "re-measure); no match -> REGRESS."),
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
    reps = cur.get("reps", 2)
    cur_bytes = {q: int(b.get("shuffle_read", 0)) + int(b.get("shuffle_write", 0))
                 for q, b in cur.get("bytes", {}).items()}
    flags = {"NOISE": [], "BYTE_ERA": [], "REGRESS": [], "NEW": []}
    for q, sec in sorted(cur.get("queries", {}).items()):
        band = bands.get(q)
        if band is None or band["n"] < 2:
            flags["NEW"].append(q)
            continue
        if sec <= max(band["median"] * FACTOR, MIN_SEC):
            continue
        cands = byte_candidates(cur_bytes.get(q, 0), reps)
        latest = set(band.get("byte_latest") or
                     ([band["bytes"]] if band["bytes"] is not None else []))
        seen = set(band.get("byte_set") or []) | latest
        # convergence-loop queries (label propagation, k-means sweeps)
        # jitter their shuffle bytes sub-1% run-to-run from row order /
        # compression; a real plan change moves bytes by far more (the
        # basket staging moved 98%), so near-latest counts as identical
        near_latest = any(l > 0 and abs(c - l) <= 0.01 * l
                          for c in cands for l in latest)
        if cands & latest or near_latest:
            kind, note = "NOISE", "byte-identical to latest -> min-of-reps noise class"
        elif cands & seen:
            kind, note = "BYTE_ERA", "bytes match an OLDER era only -> possible plan reversion, re-measure"
        else:
            kind, note = "REGRESS", "bytes match no banded run -> re-measure"
        flags[kind].append(q)
        print(f"{kind:8s} {q}: {sec:.2f}s vs band median {band['median']}s "
              f"(min {band['min']}s, n={band['n']}), bytes "
              f"{cur_bytes.get(q)} vs latest {sorted(latest)} [{note}]")
    print(f"band verdicts: {len(flags['REGRESS'])} REGRESS, "
          f"{len(flags['BYTE_ERA'])} byte-era, {len(flags['NOISE'])} noise, "
          f"{len(flags['NEW'])} new/unbanded "
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
