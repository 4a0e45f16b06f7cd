#!/bin/bash
# Round-4 session supervisor: serializes the TPU-tunnel work queue (one
# process per tunnel). Waits for the registry rebuild chain to exit, then
# runs the follow-up chain (high-res A/B + remaining ladder), then one
# bench.py pass so (a) the driver's end-of-round bench loads every program
# from the persistent compile cache -- including any scan-program changes
# committed while training ran -- and (b) an in-session datapoint with the
# trained flagship is recorded in the log.
#
#   setsid nohup bash tools/r4_supervisor.sh <rebuild_pid> \
#       >>/tmp/r4_supervisor.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
PID=${1:?usage: r4_supervisor.sh <rebuild_pid>}

echo "=== supervisor: waiting on rebuild pid $PID ($(date -u)) ==="
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "=== rebuild chain exited ($(date -u)); tail of its log: ==="
tail -5 /tmp/r3_rebuild.log

if [ ! -f /tmp/.r4_followup_done ]; then
    echo "=== supervisor: launching r4_followup ($(date -u)) ==="
    bash tools/r4_followup.sh >>/tmp/r4_followup.log 2>&1 \
        && touch /tmp/.r4_followup_done \
        || echo "followup exited rc=$? (continuing to bench)"
    tail -5 /tmp/r4_followup.log
fi

echo "=== supervisor: bench warm+datapoint ($(date -u)) ==="
BENCH_HIGHRES_BUDGET=2400 timeout 7200 python bench.py 2>&1 | tail -3
echo "=== SUPERVISOR DONE ($(date -u)) ==="
