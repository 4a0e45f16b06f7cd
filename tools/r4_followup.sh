#!/bin/bash
# Round-4 follow-up chain: run AFTER tools/r3_rebuild.sh completes (one
# process per TPU tunnel). Stages:
#
#   [H] config-4 (2048x4096) window-mode x conv-chunk A/B on the chip --
#       the high-res step is conv-dominated (ARCHITECTURE.md section 8
#       item 5), so deeper group chunking (less wasted G_y) and the fused
#       VMEM kernel are the candidate levers for getting highres combined
#       MP/s above the 0.26 baseline (VERDICT r3 item 3).
#   [L] remaining registry ladder: tools/round4_train.sh then
#       tools/round4b_train.sh (both install-gated; each install is
#       committed to git the moment it lands).
#
#   bash tools/r4_followup.sh >>/tmp/r4_followup.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

# ---- [H] high-res A/B --------------------------------------------------------
# gather:4 is the shipped profile (21.4/23.4 ms/step in round 3); gather:8
# tests deeper chunking where conv dominates; fused:4/8 test the VMEM
# step kernel at scale. prof prints incrementally so a timeout still
# leaves partial rows.
if [ ! -f /tmp/.r4_highres_ab_done ]; then
    echo "=== [H] high-res A/B ($(date -u)) ==="
    timeout 10800 python tools/prof_scan_manual.py --hw 2048 4096 --iters 2 \
        --configs gather:4:256 gather:8:256 fused:4:256 fused:8:256 \
        >> /tmp/r4_highres_ab.log 2>&1 && touch /tmp/.r4_highres_ab_done
    tail -15 /tmp/r4_highres_ab.log
fi

# ---- [P] lane-count and batch re-tune at 512x1024 ------------------------------
# The closed-form AC renormalization (device_ac.py round-4 item 10)
# changed the AC cost model: rounds are much cheaper, so wider lanes
# (fewer sequential rounds/step) and B=2 batching (fatter conv matmuls)
# may now win where they measured flat-to-worse before. Flip auto_lanes /
# the bench batch only on a clear win.
if [ ! -f /tmp/.r4_lanes_ab_done ]; then
    echo "=== [P] lanes/batch re-tune ($(date -u)) ==="
    timeout 7200 python tools/prof_scan_manual.py --hw 512 1024 --iters 3 \
        --configs gather:4:256 gather:4:512 gather:4:1024 \
        >> /tmp/r4_lanes_ab.log 2>&1 \
    && timeout 3600 python tools/prof_scan_manual.py --hw 512 1024 --iters 3 \
        --batch 2 --configs gather:4:256 \
        >> /tmp/r4_lanes_ab.log 2>&1 \
    && touch /tmp/.r4_lanes_ab_done
    tail -12 /tmp/r4_lanes_ab.log
fi

# ---- [L] remaining ladder ------------------------------------------------------
echo "=== [L] round4_train.sh ($(date -u)) ==="
bash tools/round4_train.sh >>/tmp/r4_train.log 2>&1 \
    || echo "round4_train.sh exited rc=$? (continuing)"
tail -5 /tmp/r4_train.log
echo "=== [L] round4b_train.sh ($(date -u)) ==="
bash tools/round4b_train.sh >>/tmp/r4b_train.log 2>&1 \
    || echo "round4b_train.sh exited rc=$? (continuing)"
tail -5 /tmp/r4b_train.log
echo "=== R4 FOLLOWUP DONE ($(date -u)) ==="
