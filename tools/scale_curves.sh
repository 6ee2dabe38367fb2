#!/usr/bin/env bash
# Reproducible scale-proof harness (r12 brief item 6): the EXACT
# invocations behind the bench_history scale sidecars, one subcommand
# per curve, so next round's numbers are one command and diffable.
#
#   tools/scale_curves.sh corpora   # generate every corpus + chain fixture (idempotent)
#   tools/scale_curves.sh density   # knob curve -> bench_history/${ROUND}_density_curve.json
#   tools/scale_curves.sh full10    # full suite m=1 vs m=10 -> bench_history/${ROUND}_sf1_true.json
#   tools/scale_curves.sh sf100     # heavy-hitter tier at m=100 -> bench_history/${ROUND}_sf100_true.json
#   tools/scale_curves.sh oracle10x # the THIRD oracle scale: graft.Verify + DuckDB
#                                   # hash gate on the 10x ScaleGen corpus (the
#                                   # r13 one-off that caught the DuckDB cast
#                                   # bug, now a standing one-command gate)
#   tools/scale_curves.sh all       # corpora + all three curves
#
# Knobs (env): ROUND=r12, SCALE_DIR=/tmp/truelaw, SPARK_GRAFT_CPUS=32,
# SPARK_DRIVER_MEM for big runs, SF100_ONLY to override the m=100 query
# list. CI-time check: `density` at m=1 only (SCALE_DIR on sf0.01-sized
# corpora) reproduces the curve SCHEMA in minutes; the committed curves
# use the full multiplier list below.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${ROUND:-r12}"
BASE="${SCALE_DIR:-/tmp/truelaw}"

# ScaleGen corpora: full table set for the m=1/m=10 suite pair, the
# documents+embeddings subset for the density/100x tiers (those queries
# read only these two tables). Deterministic (seeded splitmix64 LCG) =>
# regeneration is byte-identical; dirs are reused when present.
gen() { # gen <dir> <multiplier> [tables]
  if [ ! -d "$1" ]; then
    sbt -batch "runMain graft.tools.ScaleGen $1 $2 ${3:-}"
  else echo "[scale_curves] reusing $1"; fi
}

# Chain corpora ride GenFixtures (the chain distribution law) and are
# resolved per sweep dir through ChainQueries.chainDir by BASENAME:
# fixtures/chain_<basename of sweep dir> -> a GenFixtures corpus.
chainfix() { # chainfix <fixture-dir> <nblocks>
  if [ ! -d "fixtures/$1" ]; then
    sbt -batch "runMain graft.chain.GenFixtures fixtures/$1 $2"
  else echo "[scale_curves] reusing fixtures/$1"; fi
}
# Relative sibling symlink (gitignored — r13: the committed absolute
# links were dangling on any fresh clone; this helper owns their
# creation, nothing else should).
link() { # link <basename of sweep dir> <fixture-dir>
  ln -sfn "$2" "fixtures/chain_$1"
}

corpora() {
  gen "$BASE/sf0.1t" 1
  gen "$BASE/sf1t" 10
  gen "$BASE/m30" 30 documents,embeddings
  gen "$BASE/m100" 100 documents,embeddings
  chainfix chain_sf0.1 6000   # committed; regenerated only if absent
  chainfix chain_sf1 60000    # gitignored (126MB)
  # the 600k-block tier: GenFixtures builds rows driver-side — needs
  # SPARK_DRIVER_MEM=48g (wedges silently at the 8g default) and ~10min
  if [ ! -d fixtures/chain_sf100 ]; then
    SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.chain.GenFixtures fixtures/chain_sf100 600000"
  else echo "[scale_curves] reusing fixtures/chain_sf100"; fi
  link sf0.1t chain_sf0.1
  link sf1t chain_sf1
  link m30 chain_sf1
  link m100 chain_sf100
}

# the FULL-suite second decade: every table at m=100 (~10GB under
# SCALE_DIR), all 179 queries vs the m=1 corpus
sf100full() {
  gen "$BASE/m100full" 100
  link m100full chain_sf100
  sbt -batch "runMain graft.tools.FullScaleCheck $BASE/sf0.1t $BASE/m100full bench_history/${ROUND}_sf100_full.json"
}

density() {
  sbt -batch "runMain graft.tools.DensityScale bench_history/${ROUND}_density_curve.json $BASE/sf0.1t:1 $BASE/sf1t:10 $BASE/m30:30 $BASE/m100:100"
}

full10() {
  sbt -batch "runMain graft.tools.FullScaleCheck $BASE/sf0.1t $BASE/sf1t bench_history/${ROUND}_sf1_true.json"
}

# The m=100 tier: every query the m=10 sidecar read >3x, plus the
# flipped density entries (their bounded forms are the point of the
# measurement). Override with SF100_ONLY=q_a,q_b.
SF100_DEFAULT="q_embed_neardup_cells,q_embed_semdedup,q_embed_dedup_clusters,q_embed_neardup,q_doc_bpe_tokens,q_doc_top_terms,q_doc_sem_decontam,q_doc_index_dedup,q_mm_frame_sample,chain_erc20_transfers,chain_code_reads,chain_logs,chain_logs_hex,chain_traces"
sf100() {
  SPARK_GRAFT_ONLY="${SF100_ONLY:-$SF100_DEFAULT}" \
    sbt -batch "runMain graft.tools.FullScaleCheck $BASE/sf0.1t $BASE/m100 bench_history/${ROUND}_sf100_true.json"
}

# The 10x oracle gate (r14 brief item 5): full 182-query hash
# equivalence at a corpus whose aggregates exceed double precision —
# the scale where r13's widened one-off caught a REAL DuckDB
# DECIMAL->DOUBLE cast bug. One command, reused corpus, exits non-zero
# on any mismatch. ~10-15 min: Verify dumps every query at m=10
# (chain fixture resolves via the chain_sf1t symlink), then
# oracle_check.py replays every oracle in DuckDB and hash-compares.
oracle10x() {
  gen "$BASE/sf1t" 10
  chainfix chain_sf1 60000
  link sf1t chain_sf1
  local out="${ORACLE10X_OUT:-/tmp/graft_oracle10x}"
  rm -rf "$out"
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    sbt -batch "runMain graft.Verify $BASE/sf1t $out"
  python3 tools/oracle_check.py "$BASE/sf1t" "$out"
}

case "${1:-all}" in
  corpora) corpora ;;
  density) density ;;
  full10) full10 ;;
  sf100) sf100 ;;
  sf100full) sf100full ;;
  oracle10x) oracle10x ;;
  all) corpora; density; full10; sf100 ;;
  *) echo "usage: $0 {corpora|density|full10|sf100|sf100full|oracle10x|all}" >&2; exit 2 ;;
esac
