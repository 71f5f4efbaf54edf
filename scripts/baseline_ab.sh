#!/usr/bin/env bash
# Pinned-classes 20-query reference run — the same-day host yardstick
# (BASELINE.md "Self-normalizing gate ratio", VERDICT r15 item #3).
#
# Builds the EXACT classes of a pinned commit in a detached worktree
# and runs its Bench over just the frozen 20-query subset, so a
# closing capture can be read against a same-host, same-hour, pinned-
# code measurement instead of whichever host generation the 74.8 s
# reference landed on. This is the out-of-process twin of the
# `baselineSameDaySec` field Bench itself prints (a warm in-JVM
# re-pass); run this when a capture looks anomalous and an interleaved
# same-classes A/B is needed (the 5c6fb26 recipe, BASELINE.md
# round14ext-close).
#
# Usage: scripts/baseline_ab.sh [commit] [sfdir]
set -euo pipefail
COMMIT="${1:-5c6fb26}"
SFDIR="${2:-/root/testdata/sf0.1}"
WT="/tmp/graft_ab_${COMMIT}"
cd "$(git rev-parse --show-toplevel)"
git worktree add --detach "$WT" "$COMMIT" 2>/dev/null || true
cd "$WT"
sbt -batch compile >/dev/null
SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Bench q01_agg q02_boundaries q03_merge \
q04_cluster q05_complement q06_extend q07_window q08_tile q09_cumsum \
q10_split q11_rle q12_overlap q13_overlap_invert q14_join q15_intersect \
q16_count q17_subtract q18_nearest q19_setint q20_setunion" 2>&1 |
  grep -oE '\{"(q|metric)".*\}'
echo "# cleanup: git worktree remove --force $WT" >&2
