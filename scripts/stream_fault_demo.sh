#!/usr/bin/env bash
# Driver-death fault injection for the streaming exactly-once landing
# path (see graft.StreamFaultDemo): a real kill -9 of the driver JVM
# mid-micro-batch at each of the two commit windows, then a restart from
# the checkpoint that must reconverge to the uncrashed baseline table.
#   before-manifest -> data bytes written, nothing visible; recovery
#                      re-lands the re-delivered batch
#   after-commit    -> batch visible, checkpoint behind; recovery must
#                      skip the re-delivered batch via its txn tag
# Usage: scripts/stream_fault_demo.sh
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile
rc=0
for point in before-manifest after-commit; do
  WORK="$(mktemp -d /tmp/streamfault.XXXXXX)"
  echo "[fault] === kill point: $point (work: $WORK) ==="
  # the victim is EXPECTED to die with 137 (kill -9); under pipefail the
  # pipeline reports that 137, so guard the WHOLE pipeline, not just grep
  { sbt -batch "runMain graft.StreamFaultDemo victim $WORK $point" 2>&1 \
    | grep -E '\[fault\]|Nonzero exit'; } || true
  out="$(sbt -batch "runMain graft.StreamFaultDemo resume $WORK $point" 2>&1 \
    | grep -E '"metric"' || true)"
  echo "$out"
  case "$out" in *exactly-once*) ;; *) rc=1;; esac
done
exit $rc
