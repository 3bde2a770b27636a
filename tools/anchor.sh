#!/usr/bin/env bash
# Probe-gated launcher: poll the host window with the Spark-free lite
# probe until mcpu/cpu <= THRESHOLD (default 1.2 — the anchor-grade
# bar), then run the given command; give up after BUDGET seconds and
# exit 75 (EX_TEMPFAIL) without running it. The r18 verdict's item 1:
# clean windows must be CHOSEN, not hoped for — every absolute the
# repo publishes as an anchor should have been launched through this
# gate (the run's own canary brackets still verify the window held).
#
#   CLASSES=/tmp/graft_r19_classes THRESHOLD=1.2 BUDGET=3600 POLL=30 \
#     tools/anchor.sh <cmd...>
set -u
CLASSES="${CLASSES:-target/scala-2.13/classes}"
THRESHOLD="${THRESHOLD:-1.2}"
BUDGET="${BUDGET:-3600}"     # max seconds to wait for a window
POLL="${POLL:-30}"           # seconds between lite probes
deadline=$(( $(date +%s) + BUDGET ))
attempt=0
while true; do
  attempt=$(( attempt + 1 ))
  out=$(java -cp "$CLASSES:/opt/spark/jars/*" -Xmx2g graft.Probe \
        "$THRESHOLD" lite 2>/dev/null | tail -1)
  echo "[anchor] probe #$attempt: $out" >&2
  if echo "$out" | grep -q '"clean":true'; then
    echo "[anchor] window clean at probe #$attempt — launching: $*" >&2
    exec "$@"
  fi
  if [ "$(date +%s)" -ge "$deadline" ]; then
    echo "[anchor] no clean window within ${BUDGET}s — giving up" >&2
    exit 75
  fi
  sleep "$POLL"
done
