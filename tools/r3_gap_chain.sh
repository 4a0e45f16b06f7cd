#!/bin/bash
# Gap runner: wait for the round-4 registry marathon to release the TPU
# tunnel, A/B the Pallas window kernel (first on-chip compile), grab a
# fresh section ablation, then run the round-4b SSIM marathon.
cd "$(dirname "$0")/.."

WAIT_PID=${1:?pid to wait for}
echo "gap chain: waiting for pid $WAIT_PID ..."
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "gap chain: pid $WAIT_PID exited at $(date -u)"

echo "=== gap: pallas window A/B ==="
timeout 3600 python tools/prof_scan_manual.py --hw 512 1024 --iters 3 \
    --configs gather:4:256 pallas:4:256 pallas:2:256 \
    > /tmp/r4_pallas_ab.log 2>&1 \
    || echo "gap: pallas A/B failed (see /tmp/r4_pallas_ab.log)"
tail -10 /tmp/r4_pallas_ab.log

echo "=== gap: section ablation (default profile) ==="
timeout 2400 python tools/prof_scan_ablate.py > /tmp/r4_ablate.log 2>&1 \
    || echo "gap: ablation failed (see /tmp/r4_ablate.log)"
tail -20 /tmp/r4_ablate.log

echo "=== gap: round4b_train.sh ($(date -u)) ==="
bash tools/round4b_train.sh > /tmp/r4b_train.log 2>&1 \
    || echo "gap: round4b_train FAILED (see /tmp/r4b_train.log)"
echo "=== gap chain: DONE ($(date -u)) ==="
