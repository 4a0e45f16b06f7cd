#!/bin/bash
# Round-4 session supervisor: serializes the TPU-tunnel work queue (one
# process per tunnel) and survives transient tunnel outages. Behavior:
#
#   1. Wait for the registry rebuild chain to exit.
#   2. If it exited WITHOUT writing "REBUILD DONE" (tunnel outage, OOM),
#      probe the tunnel until it answers, then relaunch the chain (it is
#      anytime/resumable: stage markers + trainstate resume). Up to 12
#      relaunches; /tmp/r3_stop stops everything at the next edge.
#   3. Run the follow-up chain (high-res A/B, lanes/batch re-tune, ladder).
#   4. One bench.py pass so the driver's end-of-round bench loads every
#      program (including scan-program changes committed while training
#      ran) from the persistent compile cache, and an in-session trained-
#      flagship datapoint lands in the log.
#
#   setsid nohup bash tools/r4_supervisor.sh <rebuild_pid> \
#       >>/tmp/r4_supervisor.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
PID=${1:-}

probe () {  # block until the tunnel answers (probe every ~5 min)
    while true; do
        [ -f /tmp/r3_stop ] && return 1
        timeout 150 python -c "import jax; jax.devices(); import jax.numpy \
as jnp; (jnp.ones((8,8))*2).block_until_ready(); print('TUNNEL_OK')" \
            2>/dev/null | grep -q TUNNEL_OK && return 0
        echo "--- tunnel probe failed ($(date -u)); retry in 300s ---"
        sleep 300
    done
}

ATT=0
while true; do
    if [ -n "$PID" ]; then
        echo "=== supervisor: waiting on rebuild pid $PID ($(date -u)) ==="
        while kill -0 "$PID" 2>/dev/null; do sleep 60; done
        echo "=== rebuild chain exited ($(date -u)); log tail: ==="
        tail -3 /tmp/r3_rebuild.log
    fi
    grep -q "REBUILD DONE" /tmp/r3_rebuild.log 2>/dev/null && break
    [ -f /tmp/r3_stop ] && { echo "=== r3_stop present; supervisor exiting ==="; exit 0; }
    ATT=$((ATT + 1))
    [ "$ATT" -gt 12 ] && { echo "=== 12 relaunches exhausted ==="; break; }
    echo "=== rebuild incomplete; probing tunnel for relaunch #$ATT ($(date -u)) ==="
    probe || exit 0
    setsid nohup bash tools/r4_rebuild.sh >>/tmp/r3_rebuild.log 2>&1 < /dev/null &
    sleep 5
    PID=$(ps -eo pid,cmd | grep "bash tools/r4_rebuild.sh" | grep -v grep \
          | awk '{print $1}' | head -1)
    [ -z "$PID" ] && { echo "=== relaunch failed to start ==="; break; }
    echo "=== relaunched rebuild chain as pid $PID ==="
done

if [ ! -f /tmp/.r4_followup_done ]; then
    echo "=== supervisor: launching r4_followup ($(date -u)) ==="
    probe || exit 0
    bash tools/r4_followup.sh >>/tmp/r4_followup.log 2>&1 \
        && touch /tmp/.r4_followup_done \
        || echo "followup exited rc=$? (continuing to bench)"
    tail -5 /tmp/r4_followup.log
fi

echo "=== supervisor: bench warm+datapoint ($(date -u)) ==="
probe || exit 0
BENCH_HIGHRES_BUDGET=2400 timeout 7200 python bench.py 2>&1 | tail -3
echo "=== SUPERVISOR DONE ($(date -u)) ==="
