#!/bin/bash
# End-of-session wind-down: stop the rebuild chain at its next edge, then
# use the freed tunnel to (1) re-run the 512x1024 window-mode A/B with the
# Mosaic-fixed pallas/fused kernels (the chain's [2b] pass failed all
# three pallas configs on the bf16 minor-dim insertion, since fixed), and
# (2) capture the final in-session bench with the trained flagship. Run
# this ~1h before the driver snapshot so the driver's own bench.py finds
# a free tunnel and a warm compile cache.
#
#   bash tools/r4_winddown.sh >>/tmp/r4_winddown.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

touch /tmp/r3_stop
echo "=== r3_stop set; waiting for the chain to drain ($(date -u)) ==="
while ps -eo cmd | grep -v grep \
        | grep -qE "r4_(rebuild|supervisor|followup)\.sh|round4b?_train\.sh|prof_scan_manual|pseudocylindrical_convolution_tpu\.train\.loop"; do
    sleep 60
done
echo "=== chain drained ($(date -u)) ==="
sleep 10

if [ ! -f /tmp/.r4_ab2_done ]; then
    echo "=== [A] window-mode A/B, fixed kernels ($(date -u)) ==="
    timeout 3000 python tools/prof_scan_manual.py --hw 512 1024 --iters 3 \
        --configs gather:4:256 pallas:4:256 fused:4:256 fusedu:4:256 \
                  gather:4:512 \
        >> /tmp/pallas_ab2.log 2>&1 && touch /tmp/.r4_ab2_done
    # closed-form renorm changed the AC cost model: re-test B=2 batching
    timeout 900 python tools/prof_scan_manual.py --hw 512 1024 --iters 3 \
        --batch 2 --configs gather:4:256 >> /tmp/pallas_ab2.log 2>&1
    grep -E "ms/step|FAILED" /tmp/pallas_ab2.log | tail -12
fi

if [ ! -f /tmp/.r4_hr_ab_done ]; then
    # config-4 deeper-chunk / fused probe (VERDICT r3 weak #3: high-res
    # combined sat below baseline at gather:4). Budgeted: partial rows
    # still print on timeout, and the final bench below must still run.
    echo "=== [H] high-res A/B ($(date -u)) ==="
    timeout 1500 python tools/prof_scan_manual.py --hw 2048 4096 --iters 2 \
        --configs gather:8:256 fused:4:256 \
        >> /tmp/pallas_ab2.log 2>&1 && touch /tmp/.r4_hr_ab_done
    grep -E "ms/step|FAILED" /tmp/pallas_ab2.log | tail -4
fi

# Decision window: if the A/B shows a clear pallas/fused win the operator
# flips DEFAULT_WINDOW_MODE NOW (before the final bench, so the driver's
# end-of-round bench loads the flipped program warm from the cache).
# touch /tmp/r4_flip_ack to proceed immediately; otherwise continue after
# 10 minutes so the final bench always lands.
for i in $(seq 60); do
    [ -f /tmp/r4_flip_ack ] && break
    sleep 10
done

echo "=== [B] final bench ($(date -u)) ==="
BENCH_HIGHRES_BUDGET=1500 timeout 4500 python bench.py 2>&1 | tail -3

# ---- [R] RD tables over whatever the registry now holds ---------------
# (the rebuild chain's own [7] stage may not have been reached; these
# feed RD_EVIDENCE.md's round-4 section)
if [ ! -f /tmp/.r4_rd_done ]; then
    echo "=== [R] rd_curve ($(date -u)) ==="
    ls /tmp/synth360/test_*.npy | head -6 > /tmp/r4_eval_list.txt
    timeout 1800 python tools/rd_curve.py --img-file /tmp/r4_eval_list.txt \
        > /tmp/r4_rd_mse.log 2>&1 || true
    tail -20 /tmp/r4_rd_mse.log
    timeout 900 python tools/rd_curve.py --img-file /tmp/r4_eval_list.txt \
        --ssim > /tmp/r4_rd_ssim.log 2>&1 || true
    tail -12 /tmp/r4_rd_ssim.log
    touch /tmp/.r4_rd_done
fi
echo "=== WINDDOWN DONE ($(date -u)) ==="
