#!/bin/bash
# Round-4 registry rebuild, adapted after a SECOND machine reset (Aug 19)
# wiped every untracked file again. What survived is exactly the
# git-tracked state: demo/mse/10_192.pkl (the flagship best after
# full-phase segment 1/4, commit 2844795) and the round-3 training logs.
# All trainstate pickles, .seg markers, and ModelSaver sidecars are gone,
# so tools/r3_rebuild.sh's resume logic would restart the flagship from
# scratch AND could overwrite 10_192.pkl with a worse early-epoch best
# (fresh saver memory accepts the first epoch it sees). This chain:
#
#   * seeds every phase from the INSTALLED registry (params-only resume),
#   * measures the installed checkpoint's tloss once (tools/eval_tloss.py)
#     and gates every same-slot install on beating it (gate files
#     demo/{mse,ssim}/<name>.tloss, committed with the checkpoint),
#   * reorders for registry BREADTH under a ~6 h session budget: bench
#     cache warm, pallas/fused A/B, new rate points (vd56, vd112, ssim),
#     THEN more flagship epochs, extras, RD tables. A new rate point is
#     worth more than 4 more epochs on an already-installed slot.
#
# Anytime design as before: 4-epoch segments, install+commit after each,
# stage markers written only on success, /tmp/r3_stop stops at the edge.
#
#   bash tools/r4_rebuild.sh >>/tmp/r3_rebuild.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DATA=/tmp/synth360
[ -d $DATA ] || python tools/make_synth_dataset.py --out $DATA --n-train 256 --n-test 16
head -128 $DATA/train.txt > $DATA/train128.txt

COMMON="--img-dir $DATA --train-list $DATA/train128.txt --test-list $DATA/test.txt \
        --difficulty-dict $DATA/train_val.dic --batch-size 2 --acc-batch 2 \
        --test-batch-size 2"

train () {
    [ -f /tmp/r3_stop ] && { echo "=== /tmp/r3_stop present; chain stopping ==="; exit 0; }
    python -m pseudocylindrical_convolution_tpu.train.loop $COMMON "$@" || {
        echo "=== TRAIN FAILED (rc=$?) at: $* -- chain ABORTING ($(date -u)) ==="
        exit 1
    }
}

# ---------------------------------------------------------------------------
# gated install: a run's best_0 tloss is best[0] of its ModelSaver sidecar
# ({prefix}_saver.json -- written at every save, so it matches the file
# best_0.pkl actually holds). Install only if it beats the tracked gate
# <slot>.tloss; update the gate alongside so the registry is monotone
# across resets and segment relaunches.
ginstall () {  # ginstall <run-dir> <prefix> <dst.pkl> <msg>
    local D=$1 P=$2 OUT=$3 MSG=$4
    local SJ=$D/${P}_saver.json GATE=${OUT%.pkl}.tloss
    [ -f $SJ ] || { echo "=== $OUT: no saver sidecar in $D; skip ==="; return 0; }
    [ -f $D/${P}_best_0.pkl ] || { echo "=== $OUT: no best_0 in $D; skip ==="; return 0; }
    local TL
    TL=$(python -c "import json; print(json.load(open('$SJ'))[0])")
    if [ -f $GATE ] && ! python -c "import sys; sys.exit(0 if float('$TL') < float(open('$GATE').read()) else 1)"; then
        echo "=== $OUT: run best $TL does not beat installed $(cat $GATE); keeping installed ==="
        return 0
    fi
    mkdir -p "$(dirname $OUT)"
    cp $D/${P}_best_0.pkl $OUT
    echo "$TL" > $GATE
    git add -f "$OUT" "$GATE" && git commit -q -m "$MSG (tloss $TL)" -- "$OUT" "$GATE" \
        && echo "=== committed $OUT (tloss $TL) ==="
}

# seg_phase <dir> <prefix> <n_segments> <seg_epochs> <install|""> <first_resume|""> <args...>
seg_phase () {
    local D=$1 P=$2 NSEG=$3 SEGE=$4 OUT=$5 FIRST=$6; shift 6
    local k0=1
    [ -f $D/.seg ] && k0=$(( $(cat $D/.seg) + 1 ))
    for k in $(seq $k0 $NSEG); do
        echo "--- $D segment $k/$NSEG ($(date -u)) ---"
        if [ -f $D/${P}_trainstate.pkl ]; then
            train --resume $D/${P}_trainstate.pkl --epochs $SEGE "$@" --save-dir $D
        else
            train ${FIRST:+--resume $FIRST} --epochs $SEGE "$@" --save-dir $D
        fi
        echo $k > $D/.seg
        if [ -n "$OUT" ]; then
            ginstall $D $P $OUT \
                "Registry rebuild: $OUT (best after segment $k/$NSEG of $D)"
        fi
    done
}

BASE192=demo/mse/10_192.pkl
[ -f $BASE192 ] || { echo "FATAL: $BASE192 missing -- wrong tree?"; exit 1; }

# ---- [B] bench cache warm ---------------------------------------------------
# First so the driver's end-of-round bench.py loads every program (incl.
# the closed-form-renorm decoder, never yet compiled on this machine)
# from the persistent compile cache, whatever happens later.
if [ ! -f /tmp/.bench_warm_done ]; then
    echo "=== [B] bench cache warm ($(date -u)) ==="
    BENCH_HIGHRES_BUDGET=1200 timeout 7200 python bench.py \
        && touch /tmp/.bench_warm_done \
        || echo "bench warm failed/timed out (continuing)"
fi

# ---- [G] seed the flagship install gate ------------------------------------
# The tloss that justified 10_192.pkl died with the logs; measure it.
if [ ! -f demo/mse/10_192.tloss ]; then
    echo "=== [G] gate seed: eval installed flagship ($(date -u)) ==="
    TL=$(python tools/eval_tloss.py --ckpt $BASE192 --valid-dim 192 \
             --img-dir $DATA --test-list $DATA/test.txt \
         | tee -a /dev/stderr | grep "^TLOSS" | awk '{print $2}')
    if [ -n "$TL" ]; then
        echo "$TL" > demo/mse/10_192.tloss
        git add -f demo/mse/10_192.tloss \
            && git commit -q -m "Registry gate: measured tloss of installed 10_192.pkl" \
                   -- demo/mse/10_192.tloss
    else
        echo "gate seed FAILED (continuing; installs stay ungated)"
    fi
fi

# ---- [2b] pallas/fused window A/B on the real chip (VERDICT r3 item 2) -----
# Before the training tail: it feeds the round's perf headline and has
# never compiled on real TPU. prof prints per-config so a timeout still
# leaves rows. Flip DEFAULT_WINDOW_MODE manually only on a clear win
# (and re-warm the bench cache afterwards).
if [ ! -f /tmp/.pallas_ab_done ]; then
    echo "=== [2b] pallas/fused A/B ($(date -u)) ==="
    timeout 7200 python tools/prof_scan_manual.py --hw 512 1024 --iters 3 \
        --configs gather:4:256 pallas:4:256 fused:4:256 fusedu:4:256 \
        >> /tmp/pallas_ab.log 2>&1 && touch /tmp/.pallas_ab_done
    tail -25 /tmp/pallas_ab.log
fi

# ---- [3] staged vd=56 (alpha=3) -> demo/mse/1_56.pkl ------------------------
P=ent_opt_192_56_16
echo "=== [3] vd56 staged ($(date -u)) ==="
if [ ! -f demo/train_run_vd56/.init_done ]; then
    if [ -f demo/train_run_vd56/${P}_init_trainstate.pkl ]; then
        train --valid-dim 56 --alpha 3 --init \
              --resume demo/train_run_vd56/${P}_init_trainstate.pkl \
              --epochs 2 --save-dir demo/train_run_vd56
    else
        train --valid-dim 56 --alpha 3 --init --init-from $BASE192 \
              --epochs 4 --save-dir demo/train_run_vd56
    fi
    touch demo/train_run_vd56/.init_done
fi
seg_phase demo/train_run_vd56f $P 2 4 demo/mse/1_56.pkl \
    demo/train_run_vd56/${P}_init_best_0.pkl --valid-dim 56 --alpha 3

# ---- [4] staged vd=112 (alpha=1) -> demo/mse/5_112.pkl ----------------------
P=ent_opt_192_112_16
echo "=== [4] vd112 staged ($(date -u)) ==="
if [ ! -f demo/train_run_vd112/.init_done ]; then
    if [ -f demo/train_run_vd112/${P}_init_trainstate.pkl ]; then
        train --valid-dim 112 --alpha 1 --init \
              --resume demo/train_run_vd112/${P}_init_trainstate.pkl \
              --epochs 2 --save-dir demo/train_run_vd112
    else
        train --valid-dim 112 --alpha 1 --init --init-from $BASE192 \
              --epochs 4 --save-dir demo/train_run_vd112
    fi
    touch demo/train_run_vd112/.init_done
fi
seg_phase demo/train_run_vd112f $P 2 4 demo/mse/5_112.pkl \
    demo/train_run_vd112/${P}_init_best_0.pkl --valid-dim 112 --alpha 1

# ---- [5] SSIM flagship (lr 1e-5: RD_EVIDENCE.md post-mortem) ----------------
P=ent_opt_192_192_16
echo "=== [5] ssim 9_192 ($(date -u)) ==="
seg_phase demo/train_run_ssim192 $P 2 4 demo/ssim/9_192.pkl $BASE192 \
    --valid-dim 192 --alpha 1 --beta 10 --gamma 0 --lr 1e-5

# ---- [2] flagship full phase: remaining depth (gated) -----------------------
# Segment 1/4 produced the installed 10_192.pkl; run 2 more 4-epoch
# segments seeded from it. Fresh Adam can regress below the install --
# the [G] gate keeps those out of the registry.
P=ent_opt_192_192_16
echo "=== [2] flagship full remaining segments ($(date -u)) ==="
seg_phase demo/train_run_full $P 2 4 demo/mse/10_192.pkl \
    $BASE192 --valid-dim 192

# ---- [6] extras: same-vd ladder (gentle lr + tloss install gates) -----------
point () {  # point <run-dir> <prefix> <init-ckpt> <install-path> <gate> <args...>
    local D=$1 P=$2 FB=$3 OUT=$4 GATE=$5; shift 5
    if [ -f $OUT ]; then echo "=== $OUT already installed ==="; return 0; fi
    [ -f $FB ] || { echo "=== $OUT: init ckpt $FB missing; skip ==="; return 0; }
    if [ ! -f $D/.done ]; then
        if [ -f $D/${P}_trainstate.pkl ]; then
            train --resume $D/${P}_trainstate.pkl --epochs 3 "$@" --save-dir $D
        else
            train --resume $FB --epochs 6 "$@" --save-dir $D
        fi
        touch $D/.done
    fi
    # filter nan: GNU sort -g orders NaN first and float('nan') < gate is
    # False, so one nan validation epoch would veto a legitimate install
    local TL=$(grep "^tloss" $D/${P}_log.txt | awk '{print $2}' \
               | grep -iv nan | sort -g | head -1)
    if ! python -c "import sys; sys.exit(0 if float('$TL') < $GATE else 1)"; then
        echo "=== $OUT: tloss $TL above gate $GATE; NOT installed ==="
        return 0
    fi
    echo "$TL" > ${OUT%.pkl}.tloss
    mkdir -p "$(dirname $OUT)"
    cp $D/${P}_best_0.pkl $OUT
    git add -f "$OUT" "${OUT%.pkl}.tloss" \
        && git commit -q -m "Registry rebuild: $OUT (same-vd ladder finetune, tloss $TL)" \
               -- "$OUT" "${OUT%.pkl}.tloss" \
        && echo "=== committed $OUT ==="
}

echo "=== [6] extras ($(date -u)) ==="
point demo/train_run_vd56a2  ent_opt_192_56_16  demo/mse/1_56.pkl   demo/mse/2_56.pkl  3e-4 \
    --valid-dim 56 --alpha 2 --lr 1e-5
point demo/train_run_vd192a2 ent_opt_192_192_16 demo/mse/10_192.pkl demo/mse/9_192.pkl 3e-4 \
    --valid-dim 192 --alpha 2 --lr 1e-5
point demo/train_run_ssim112 ent_opt_192_112_16 demo/mse/5_112.pkl  demo/ssim/5_112.pkl 0.05 \
    --valid-dim 112 --alpha 1 --beta 10 --gamma 0 --lr 1e-5

# ---- [7] RD tables ----------------------------------------------------------
echo "=== [7] rd_curve ($(date -u)) ==="
ls $DATA/test_*.npy | head -6 > /tmp/r3_eval_list.txt
ls $DATA/test_*.npy | head -1 > /tmp/r3_eval1.txt
python tools/rd_curve.py --img-file /tmp/r3_eval_list.txt \
    > /tmp/r3_rd_mse.log 2>&1 || true
tail -20 /tmp/r3_rd_mse.log
python tools/rd_curve.py --img-file /tmp/r3_eval_list.txt --ssim \
    > /tmp/r3_rd_ssim.log 2>&1 || true
tail -20 /tmp/r3_rd_ssim.log
python tools/rd_curve.py --img-file /tmp/r3_eval1.txt \
    --model-indices 9 --decode > /tmp/r3_rd_flagship_roundtrip.log 2>&1 || true
tail -5 /tmp/r3_rd_flagship_roundtrip.log
echo "=== REBUILD DONE ($(date -u)) ==="
