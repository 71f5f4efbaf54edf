#!/usr/bin/env bash
# Pinned-classes 20-query reference run — the same-day host yardstick
# (BASELINE.md "Self-normalizing gate ratio", VERDICT r15 item #3).
#
# Builds the EXACT classes of a pinned commit in a detached worktree,
# runs that commit's FULL Bench suite, and reads the frozen-subset
# subtotal off the total line's baseline20Sec field (a 20-query-only
# run pays all its own JIT and reads ~3x the in-suite number — see
# below), so a closing capture can be read against a same-host,
# same-hour, pinned-code measurement instead of whichever host
# generation the 74.8 s reference landed on. This is the out-of-process twin of the
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
# The add above tolerates an already-registered worktree (reuse is the
# point of keying the path by commit) — but it also masks a stale or
# dirty directory squatting on the path, so ASSERT the pin before
# measuring anything (round-16 ADVICE): the tree must be AT the pinned
# commit and clean, or the "pinned classes" label is a lie.
if [ "$(git rev-parse HEAD)" != "$(git rev-parse "$COMMIT^{commit}")" ]; then
  echo "ERROR: $WT is at $(git rev-parse HEAD), not $COMMIT — remove it" >&2
  exit 1
fi
if [ -n "$(git status --porcelain)" ]; then
  echo "ERROR: $WT has local modifications — remove it and re-run" >&2
  exit 1
fi
sbt -batch compile >/dev/null
# Run the pinned commit's FULL suite and read baseline20Sec off its
# total line — a 20-query-only run pays all its own JIT/codegen and
# reads ~3x the in-suite subtotal (measured 2026-08-16: 77.95 s subset
# vs 25-30 s in-suite on the same host hour), so only full-suite
# numbers are comparable to the captures recorded in BASELINE.md.
SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Bench" 2>&1 |
  grep -oE '\{"metric":"total".*\}'
echo "# cleanup: git worktree remove --force $WT" >&2
