#!/bin/bash
# Session chain: wait for the running round-3 extras marathon to release the
# TPU tunnel, then (1) A/B the burst window profile on chip, (2) fill the
# remaining 8 registry points, (3) fill the last 4 SSIM points + RD tables.
# One process at a time on the tunnel throughout.
cd "$(dirname "$0")/.."

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    echo "chain: waiting for pid $WAIT_PID to exit..."
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
    echo "chain: pid $WAIT_PID exited at $(date -u)"
fi

echo "=== chain: burst/chunks A/B (prof_scan_manual) ==="
timeout 5400 python tools/prof_scan_manual.py --hw 512 1024 --iters 3 \
    --configs gather:4:256 burst:4:256 burst:4:256:mm burst:2:256:mm \
    burst:1:256:mm \
    > /tmp/r4_ab.log 2>&1 || echo "chain: A/B failed (see /tmp/r4_ab.log)"
tail -20 /tmp/r4_ab.log

echo "=== chain: round4_train.sh ($(date -u)) ==="
bash tools/round4_train.sh > /tmp/r4_train.log 2>&1 \
    || echo "chain: round4_train FAILED (see /tmp/r4_train.log)"

echo "=== chain: round4b_train.sh ($(date -u)) ==="
bash tools/round4b_train.sh > /tmp/r4b_train.log 2>&1 \
    || echo "chain: round4b_train FAILED (see /tmp/r4b_train.log)"

echo "=== chain: DONE ($(date -u)) ==="
