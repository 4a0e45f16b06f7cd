#!/bin/bash
# Round-5 session-3 supervisor: keeps tools/r5_chain.sh running to
# completion across tunnel outages AND wedged device calls.
#
# The session-2 incident (STATUS.md): a lost in-flight device call leaves
# the trainer at 0% CPU in futex_wait forever — it never times out and
# blocks the whole serialized queue. So besides the relaunch-on-exit loop,
# a watchdog kills the chain's python descendants (by walked pid, never by
# pattern) when every queue log has been static for WEDGE_MIN minutes.
# Threshold 75 min: a cold high-res scan compile is silent for 30-40 min,
# so 45 would false-positive.
#
#   setsid nohup bash tools/r5_supervisor.sh >>/tmp/r5_supervisor.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
WEDGE_MIN=75
LOGS="/tmp/r5_chain.log /tmp/r4_train.log /tmp/r4b_train.log /tmp/r5_pallas_ab.log /tmp/r4_highres_ab.log"

probe () {  # block until the tunnel answers (probe every ~5 min)
    while true; do
        [ -f /tmp/r3_stop ] && return 1
        timeout 240 python -c "import jax; jax.devices(); import jax.numpy \
as jnp; (jnp.ones((8,8))*2).block_until_ready(); print('TUNNEL_OK')" \
            2>/dev/null | grep -q TUNNEL_OK && return 0
        echo "--- tunnel probe failed ($(date -u)); retry in 300s ---"
        sleep 300
    done
}

descendants () {  # print all descendant pids of $1 (walked, not pattern-matched)
    local p kids
    kids=$(ps -eo pid=,ppid= | awk -v P="$1" '$2==P{print $1}')
    for p in $kids; do echo "$p"; descendants "$p"; done
}

newest_log_age_min () {
    local newest=0 f m
    for f in $LOGS demo/train_run*/*.txt; do
        [ -f "$f" ] || continue
        m=$(stat -c %Y "$f" 2>/dev/null) || continue
        [ "$m" -gt "$newest" ] && newest=$m
    done
    echo $(( ($(date +%s) - newest) / 60 ))
}

registry_complete () {
    local missing=0 s
    for s in 1_56 2_56 3_56 4_112 5_112 6_112 7_112 8_192 9_192 10_192; do
        [ -f demo/mse/$s.pkl ] || missing=1
    done
    for s in 1_56 2_56 3_56 4_56 5_112 6_112 7_112 8_192 9_192; do
        [ -f demo/ssim/$s.pkl ] || missing=1
    done
    return $missing
}

launch_chain () {
    setsid nohup bash tools/r5_chain.sh >>/tmp/r5_chain.log 2>&1 < /dev/null &
    sleep 3
    CHAIN_PID=$(ps -eo pid=,cmd= | grep "bash tools/r5_chain.sh" | grep -v grep \
                | awk '{print $1}' | head -1)
    echo "=== launched r5_chain as pid ${CHAIN_PID:-NONE} ($(date -u)) ==="
}

ATT=0
launch_chain
while true; do
    [ -f /tmp/r3_stop ] && { echo "=== r3_stop; supervisor exiting ==="; exit 0; }
    if [ -n "${CHAIN_PID:-}" ] && kill -0 "$CHAIN_PID" 2>/dev/null; then
        AGE=$(newest_log_age_min)
        if [ "$AGE" -ge "$WEDGE_MIN" ]; then
            echo "=== WEDGE: logs static ${AGE}min; killing chain $CHAIN_PID descendants ($(date -u)) ==="
            for p in $(descendants "$CHAIN_PID") "$CHAIN_PID"; do
                kill -9 "$p" 2>/dev/null
            done
            sleep 5
        else
            sleep 120
            continue
        fi
    fi
    # chain is dead here
    if grep -q "R5 CHAIN DONE" /tmp/r5_chain.log 2>/dev/null; then
        if registry_complete || [ "$ATT" -ge 12 ]; then
            echo "=== chain done (registry complete: $(registry_complete && echo yes || echo no)) ==="
            break
        fi
        echo "=== chain done but registry incomplete; relaunching for missing slots ==="
        # strip the DONE marker so the next completion is re-checked
        sed -i 's/R5 CHAIN DONE/R5 CHAIN PASS/' /tmp/r5_chain.log
    fi
    ATT=$((ATT + 1))
    [ "$ATT" -gt 12 ] && { echo "=== 12 relaunches exhausted ==="; break; }
    echo "=== chain incomplete; probing tunnel for relaunch #$ATT ($(date -u)) ==="
    probe || exit 0
    launch_chain
done
echo "=== R5 SUPERVISOR DONE ($(date -u)) ==="
