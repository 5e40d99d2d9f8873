#!/usr/bin/env bash
# Round-close gate (SURVEY §7): the hard correctness signal MUST exist
# in the repo at every round close — the driver's CORRECTNESS_r{N}.json
# arrived empty in rounds 9-11, so the round's exactness evidence
# lives in CORRECTNESS_local.json, produced and committed HERE.
#
#   tools/roundclose.sh [sfDir] [verifyOutDir]
#
# Runs graft.Verify over the full registry, compares every query to its
# DuckDB oracle via tools/check.py (writing CORRECTNESS_local.json),
# REFUSES to exit 0 if the artifact is absent / smaller than the live
# registry / non-exact / carrying an UNDECLARED rows-only entry, then
# stages and commits the artifact. Run it as the LAST step of a round.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_roundclose}

rm -rf "$OUT"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 \
  | { grep -E '\[verify\].*failed' || true; } | tee /tmp/roundclose_verify_failures.txt
if [ -s /tmp/roundclose_verify_failures.txt ]; then
  echo "roundclose: queries THREW during Verify (above)" >&2
  exit 1
fi

python3 tools/check.py "$SF" "$OUT" CORRECTNESS_local.json | tail -3

# Dual-layout determinism sweep (round-13 gate): rerun Verify under a
# DIFFERENT partition layout (odd parallelism + round-robin jittered
# table reads) and require every oracled query's result to be
# value-identical across the two Spark runs. A single-host single-layout
# gate cannot see order-dependent rounding (round-12's embed_covariance
# / pipeline_length_buckets flipped only on the driver's host); this
# catches the class locally. tools/test_layout_diff.py proves the gate
# trips on a 1e-6 flip.
OUT2="${OUT}_jitter"
rm -rf "$OUT2"
SPARK_GRAFT_CPUS=3 SPARK_GRAFT_LAYOUT_JITTER=7 \
  sbt -batch "runMain graft.Verify $SF $OUT2" 2>&1 \
  | { grep -E '\[verify\].*failed' || true; } | tee /tmp/roundclose_jitter_failures.txt
if [ -s /tmp/roundclose_jitter_failures.txt ]; then
  echo "roundclose: queries THREW during jittered Verify (above)" >&2
  exit 1
fi
python3 tools/layout_diff.py "$OUT" "$OUT2" | tail -5

# The gate floor is NOT a hand-maintained constant (round-11's 235 vs a
# 242-query registry would have let 7 queries silently unregister): the
# live registry size comes from verify_status.json, which graft.Verify
# writes unconditionally with one entry per registered query.
VERIFY_STATUS="$OUT/verify_status.json" python3 - <<'EOF'
import json, os, sys
try:
    d = json.load(open("CORRECTNESS_local.json"))
except Exception as e:
    sys.exit(f"roundclose: artifact unreadable: {e}")
try:
    status = json.load(open(os.environ["VERIFY_STATUS"]))
except Exception as e:
    sys.exit(f"roundclose: verify_status.json unreadable: {e}")
registry = len(status)
not_ok = {k: v for k, v in status.items() if not v.get("ok")}
if not_ok:
    sys.exit(f"roundclose: queries failed during Verify: {sorted(not_ok)}")
if len(d) != registry:
    sys.exit(f"roundclose: artifact has {len(d)} entries but the live "
             f"registry has {registry} — a query silently dropped out "
             f"of the compare")
bad = {k: v.get("err") for k, v in d.items()
       if v.get("err") not in (None, "no_oracle")}
if bad:
    sys.exit(f"roundclose: non-exact queries: {bad}")
# Rows-only (oracle-free) entries must be EXACTLY the declared §4 set —
# an oracle silently dropping from SparkEntry.oracleSql must fail here.
DECLARED_ROWS_ONLY = {
    "agg_approx_distinct", "events_freq_items", "gka_full",
    "kmeans_metrics", "kmeans_mllib", "multimodal_audio_vad",
    "multimodal_phash_dedup", "multimodal_phash_pairs",
    "multimodal_phash_recall", "multimodal_scene_cuts",
    "percentile_approx_qty", "pso_full",
}
rows_only = {k for k, v in d.items() if v.get("err") == "no_oracle"}
if rows_only != DECLARED_ROWS_ONLY:
    sys.exit(f"roundclose: rows-only set drifted from the declared list: "
             f"undeclared={sorted(rows_only - DECLARED_ROWS_ONLY)} "
             f"missing={sorted(DECLARED_ROWS_ONLY - rows_only)}")
# Freshness handshake (round-14 gate): every compared query dir must
# carry THIS Verify run's stamp — a stale/partial output can otherwise
# masquerade as a clean (or failing) compare, the exact ambiguity that
# cost pipeline_length_buckets two rounds of `weak`.
try:
    meta = json.load(open("CORRECTNESS_local.meta.json"))
except Exception as e:
    sys.exit(f"roundclose: freshness meta unreadable: {e}")
if not meta.get("run_id"):
    sys.exit("roundclose: verify output carries no run_stamp.json — "
             "rebuild (graft.Verify stamps every run)")
if meta.get("stale"):
    sys.exit(f"roundclose: STALE query dirs (not from run "
             f"{meta['run_id']}): {meta['stale']}")
# Canonical-hash gate (round-15): every compared query dir must carry
# graft.Verify's _CANONICAL.sha256 AND the DuckDB+Python recomputation
# must agree — so a checker-vs-checker discrepancy is provable from
# bytes on disk instead of adjudicated (the pipeline_length_buckets
# three-round ambiguity).
if meta.get("canon_mismatch"):
    sys.exit(f"roundclose: canonical-hash mismatches between reader "
             f"stacks: {meta['canon_mismatch']}")
no_canon = sorted(k for k, v in d.items()
                  if v.get("err") != "no_spark_output"
                  and not v.get("canon_stamp_ok"))
if no_canon:
    sys.exit(f"roundclose: query dirs without a verified _CANONICAL."
             f"sha256: {no_canon[:10]} ({len(no_canon)} total)")
oracled = len(d) - len(rows_only)
# Probe retirement (round-17 gate, verdict-16 demand #6): diagnostic
# probe keys (`*_probe` twins, `*_pN` per-column ladders) are ONE-ROUND
# experiments — once a committed driver CORRECTNESS_r*.json carries a
# probe's row, the experiment has been read and the key must leave the
# registry (the r16 twins inflated the registry with duplicate rows).
import re as _re, subprocess as _sp
# scoped to the known probe families — a generic `_p[0-9]+$` would
# flag any future legitimate percentile-style key (text_len_p50)
probe_keys = sorted(
    k for k in status
    if _re.search(r"_probe$", k)
    or _re.match(r"^(orders_mom_growth|pipeline_length_buckets)_p[0-9]+$", k))
if probe_keys:
    tracked = _sp.check_output(
        ["git", "ls-files", "CORRECTNESS_r*.json"], text=True).split()
    stale_probes = set()
    for f in tracked:
        try:
            rows = json.load(open(f))
        except Exception:
            continue
        stale_probes |= {k for k in probe_keys if k in rows}
    if stale_probes:
        sys.exit(f"roundclose: probe keys whose driver CORRECTNESS has "
                 f"been read must be retired from the registry: "
                 f"{sorted(stale_probes)}")
    print(f"roundclose: {len(probe_keys)} live probe keys (no driver "
          f"CORRECTNESS row yet — retire next round): {probe_keys}")
# Registry <-> SURVEY §2 equality (round-15 gate): every registered
# query key must appear backticked in a §2 row — a green query with no
# coverage-contract row is silent inventory drift (round-13
# text_winnowing, round-14 simsearch_ivfpq_residual).
import re
survey = open("SURVEY.md").read()
s2_start = survey.index("## §2 ")
s2 = survey[s2_start:survey.index("\n## ", s2_start + 1)]
s2_keys = set(re.findall(r"`([a-z0-9_]+)`", s2))
unlisted = sorted(k for k in status if k not in s2_keys)
if unlisted:
    sys.exit(f"roundclose: registered queries with no SURVEY §2 row: "
             f"{unlisted}")
# Scale-sweep gate (round-14): a query may not ship scale-unmeasured.
# BENCH_SF1.json must cover the live registry (give or take nothing),
# and any over-bound outlier must carry an adjudicated note.
try:
    sweep = json.load(open("BENCH_SF1.json"))
except Exception as e:
    sys.exit(f"roundclose: BENCH_SF1.json unreadable: {e}")
swept = set(sweep.get("queries", {}))
missing_sweep = set(status) - swept
if missing_sweep:
    sys.exit(f"roundclose: {len(missing_sweep)} registered queries have "
             f"no sf1 sweep row: {sorted(missing_sweep)[:10]} — rerun "
             f"tools/gen_sf1.py + TimeQ ALL + tools/sf1_sweep.py")
unnoted = [q for q in sweep.get("outliers_over_bound", [])
           if q not in sweep.get("outlier_notes", {})]
if unnoted:
    sys.exit(f"roundclose: sf1 outliers without an adjudicated note: "
             f"{unnoted}")
print(f"roundclose OK: {len(d)} entries (= registry), {oracled} "
      f"oracle-exact, {len(rows_only)} declared rows-only, "
      f"all dirs stamped by run {meta['run_id']}, sf1 sweep covers "
      f"{len(swept)} queries")
EOF

# Bench noise-band verdicts (round-16 gate, print-only): departures
# beyond band median x 1.5 classify as NOISE (byte-identical shuffle —
# the adjudicated min-of-reps host-noise class) vs REGRESS (bytes
# moved — re-measure). Turns the per-round regression adjudication
# into arithmetic; a REGRESS verdict is evidence for the round log,
# handled by the REMEASURE protocol, not a commit blocker.
if [ -f BENCH_BANDS.json ] && [ -f BENCH_FULL.json ]; then
  python3 tools/bench_bands.py verdict BENCH_FULL.json || true
fi

git add CORRECTNESS_local.json CORRECTNESS_local.meta.json
if ! git diff --cached --quiet -- CORRECTNESS_local.json CORRECTNESS_local.meta.json; then
  git commit -m "round close: refresh CORRECTNESS_local.json" -- \
    CORRECTNESS_local.json CORRECTNESS_local.meta.json
else
  echo "roundclose: CORRECTNESS_local.json unchanged (already committed)"
fi
