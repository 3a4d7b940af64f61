#!/usr/bin/env bash
# Per-phase-JVM staleness protocol (VERDICT r18 next-4 / SCALE.md §r18):
# the x1000 protocol exceeds any single JVM by measured lifetime walls
# (block-manager state, driver heap, GC-gated shuffle files), so each
# phase runs in its OWN JVM against on-disk state — which is also the
# production ingest shape (one JVM per arrival wave).
#
# Usage: tools/stalerun.sh <src> <mult> <work> <pct> [mode] [tag]
#   e.g. tools/stalerun.sh /root/testdata/sf0.1 1000 /tmp/graft_scale 12 s14stitch x1000
# Phases: fresh build -> base build -> one JVM per append wave (0..3)
#         -> ARI compare. Each writes scale_<mode>_<tag>_p<phase>.json;
#         the ARI file carries the protocol's result rows.
# SPARK_GRAFT_STALE_REUSE=1 is set for every phase, so an existing
# fresh store on disk is reused (re-run after a crash resumes; delete
# the artifact dirs under <work> for a cold start). The base store is
# REBUILT by its phase unconditionally — appends mutate it, so a
# resumed run must not re-append onto an already-appended store.
set -euo pipefail
SRC=$1; MULT=$2; WORK=$3; PCT=$4; MODE=${5:-s14stitch}; TAG=${6:-x$MULT}
MEM="${SPARK_DRIVER_MEM:-96g}"
cd "$(dirname "$0")/.."
phase() { # phase <name> [batches]
  local ph=$1 out="scale_${MODE}_${TAG}_p${1}${2:+b$2}.json"
  echo "[stalerun] phase=$ph batches=${2:-all} -> $out"
  # via env, not prefix assignments: the optional ${2:+...} word is not
  # syntactically an assignment, which would end bash's prefix scan and
  # turn the next VAR=val into a "command not found"
  env SPARK_DRIVER_MEM="$MEM" SPARK_GRAFT_STALE_PHASE="$ph" \
    SPARK_GRAFT_STALE_PCTS="$PCT" SPARK_GRAFT_STALE_REUSE=1 \
    ${2:+SPARK_GRAFT_STALE_BATCHES="$2"} \
    SPARK_GRAFT_SCALE_OUT="$out" \
    tools/scalerun.sh graft.ScaleBench "$SRC" "$MULT" "$WORK" "$MODE"
}
phase fresh
phase base
for b in 0 1 2 3; do phase append "$b"; done
phase ari
echo "[stalerun] done: scale_${MODE}_${TAG}_p*.json"
