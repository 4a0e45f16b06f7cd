#!/bin/bash
# Registry rebuild after the round-3 machine reset wiped every untracked
# checkpoint (demo/ was gitignored; the trained registry and /tmp dataset
# were lost between sessions). This chain re-creates the registry from
# scratch on the TPU tunnel, committing every installed checkpoint to git
# the moment it lands so a reset can never zero the registry again.
#
# Stages (each .done-gated and resumable via the saved TrainState):
#   0. deterministic dataset regen (seed 0 -- identical to round 3's)
#   A. pallas window A/B (the round-3 checklist item; informs the shipped
#      scan profile before the bench at round end)
#   1. flagship --base phase, vd=192           (reconstruction pretrain)
#   2. flagship full phase -> demo/mse/10_192.pkl
#   3. staged vd=56  (init+full) -> demo/mse/1_56.pkl
#   4. staged vd=112 (init+full) -> demo/mse/5_112.pkl
#   5. SSIM finetune vd=192      -> demo/ssim/9_192.pkl
#   6. extras (same-vd ladder, lr 1e-5 + tloss gates):
#      mse/2_56, mse/9_192, ssim/5_112
#   7. rd_curve tables over whatever is installed
#
# Epoch budget is compressed vs round 2 (base 15+full 36) to fit one
# session: base 10 + full 16; the round-2 run crossed the RD anchor at
# full-epoch 9, and the best-checkpoint saver keeps the best epoch anyway.
#
#   bash tools/r3_rebuild.sh >/tmp/r3_rebuild.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

# A train invocation that dies (TPU tunnel outage, OOM, kill) must ABORT
# the chain -- the first version treated any exit as stage completion,
# marked .base_done after a backend-init failure, and steamed into the
# full phase with a nonexistent resume checkpoint. `train` now exits the
# chain on failure; stage markers are only touched after success.
# /tmp/r3_stop lets the operator stop the chain at the next stage edge.
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

install () {  # install <src> <dst> <msg>
    mkdir -p "$(dirname $2)"
    cp "$1" "$2"
    git add -f "$2" && git commit -q -m "$3" && echo "=== committed $2 ==="
}

echo "=== [A] pallas window A/B ($(date -u)) ==="
if [ ! -f /tmp/r3_pallas_ab.log ]; then
    timeout 3600 python tools/prof_scan_manual.py --hw 512 1024 --iters 3 \
        --configs gather:4:256 pallas:4:256 pallas:2:256 \
        > /tmp/r3_pallas_ab.log 2>&1 \
        || echo "pallas A/B failed (see /tmp/r3_pallas_ab.log)"
    tail -12 /tmp/r3_pallas_ab.log
fi

# ---- flagship vd=192 ------------------------------------------------------
D=demo/train_run
P=ent_opt_192_192_16
echo "=== [1] flagship base phase ($(date -u)) ==="
if [ ! -f $D/.base_done ]; then
    if [ -f $D/${P}_trainstate.pkl ]; then
        train --valid-dim 192 --base --resume $D/${P}_trainstate.pkl \
              --epochs 5 --save-dir $D
    else
        train --valid-dim 192 --base --epochs 10 --save-dir $D
    fi
    touch $D/.base_done
fi

D=demo/train_run_full
echo "=== [2] flagship full phase ($(date -u)) ==="
if [ ! -f $D/.full_done ]; then
    if [ -f $D/${P}_trainstate.pkl ]; then
        train --valid-dim 192 --resume $D/${P}_trainstate.pkl \
              --epochs 8 --save-dir $D
    else
        train --valid-dim 192 \
              --resume demo/train_run/${P}_best_0.pkl \
              --epochs 16 --save-dir $D
    fi
    touch $D/.full_done
fi
[ -f demo/mse/10_192.pkl ] || install $D/${P}_best_0.pkl demo/mse/10_192.pkl \
    "Registry rebuild: flagship mse/10_192 retrained (base+full phases)"

BASE192=demo/mse/10_192.pkl

# ---- bench cache warm ------------------------------------------------------
# One bench run right after the flagship lands: the driver's end-of-round
# bench.py then loads every program (dense encode, scan enc/dec at 512 and
# 2048) from the persistent compile cache instead of paying cold compiles.
# Also records an in-session BENCH datapoint in the log.
if [ ! -f /tmp/.bench_warm_done ]; then
    echo "=== [2b] bench cache warm ($(date -u)) ==="
    timeout 7200 python bench.py && touch /tmp/.bench_warm_done \
        || echo "bench warm failed/timed out (continuing)"
fi

# ---- staged vd=56 (alpha=3) ----------------------------------------------
D=demo/train_run_vd56
P=ent_opt_192_56_16
echo "=== [3] vd56 staged ($(date -u)) ==="
if [ ! -f $D/.init_done ]; then
    if [ -f $D/${P}_init_trainstate.pkl ]; then
        train --valid-dim 56 --alpha 3 --init \
              --resume $D/${P}_init_trainstate.pkl --epochs 2 --save-dir $D
    else
        train --valid-dim 56 --alpha 3 --init --init-from $BASE192 \
              --epochs 4 --save-dir $D
    fi
    touch $D/.init_done
fi
if [ ! -f $D/.full_done ]; then
    if [ -f $D/${P}_trainstate.pkl ]; then
        train --valid-dim 56 --alpha 3 --resume $D/${P}_trainstate.pkl \
              --epochs 3 --save-dir $D
    else
        train --valid-dim 56 --alpha 3 --resume $D/${P}_init_best_0.pkl \
              --epochs 6 --save-dir $D
    fi
    touch $D/.full_done
fi
[ -f demo/mse/1_56.pkl ] || install $D/${P}_best_0.pkl demo/mse/1_56.pkl \
    "Registry rebuild: staged mse/1_56 (vd=56 alpha=3 from the flagship)"

# ---- staged vd=112 (alpha=1) ----------------------------------------------
D=demo/train_run_vd112
P=ent_opt_192_112_16
echo "=== [4] vd112 staged ($(date -u)) ==="
if [ ! -f $D/.init_done ]; then
    if [ -f $D/${P}_init_trainstate.pkl ]; then
        train --valid-dim 112 --alpha 1 --init \
              --resume $D/${P}_init_trainstate.pkl --epochs 2 --save-dir $D
    else
        train --valid-dim 112 --alpha 1 --init --init-from $BASE192 \
              --epochs 4 --save-dir $D
    fi
    touch $D/.init_done
fi
if [ ! -f $D/.full_done ]; then
    if [ -f $D/${P}_trainstate.pkl ]; then
        train --valid-dim 112 --alpha 1 --resume $D/${P}_trainstate.pkl \
              --epochs 3 --save-dir $D
    else
        train --valid-dim 112 --alpha 1 --resume $D/${P}_init_best_0.pkl \
              --epochs 6 --save-dir $D
    fi
    touch $D/.full_done
fi
[ -f demo/mse/5_112.pkl ] || install $D/${P}_best_0.pkl demo/mse/5_112.pkl \
    "Registry rebuild: staged mse/5_112 (vd=112 alpha=1 from the flagship)"

# ---- SSIM flagship (lr 1e-5: RD_EVIDENCE.md post-mortem) -------------------
D=demo/train_run_ssim192
P=ent_opt_192_192_16
echo "=== [5] ssim 9_192 ($(date -u)) ==="
if [ ! -f $D/.full_done ]; then
    if [ -f $D/${P}_trainstate.pkl ]; then
        train --valid-dim 192 --alpha 1 --beta 10 --gamma 0 --lr 1e-5 \
              --resume $D/${P}_trainstate.pkl --epochs 3 --save-dir $D
    else
        train --valid-dim 192 --alpha 1 --beta 10 --gamma 0 --lr 1e-5 \
              --resume $BASE192 --epochs 6 --save-dir $D
    fi
    touch $D/.full_done
fi
[ -f demo/ssim/9_192.pkl ] || install $D/${P}_best_0.pkl demo/ssim/9_192.pkl \
    "Registry rebuild: ssim/9_192 (beta=10 finetune of the MSE flagship)"

# ---- extras: same-vd ladder (gentle lr + tloss install gates) --------------
# point <run-dir> <prefix> <init-ckpt> <install-path> <gate> <args...>
point () {
    local D=$1 P=$2 FB=$3 OUT=$4 GATE=$5; shift 5
    if [ -f $OUT ]; then echo "=== $OUT already installed ==="; return 0; fi
    if [ ! -f $D/.done ]; then
        if [ -f $D/${P}_trainstate.pkl ]; then
            train --resume $D/${P}_trainstate.pkl --epochs 3 "$@" --save-dir $D
        else
            train --resume $FB --epochs 6 "$@" --save-dir $D
        fi
        touch $D/.done
    fi
    local TL=$(grep "^tloss" $D/${P}_log.txt | tail -1 | awk '{print $2}')
    if ! python -c "import sys; sys.exit(0 if float('$TL') < $GATE else 1)"; then
        echo "=== $OUT: tloss $TL above gate $GATE; NOT installed ==="
        return 0
    fi
    install $D/${P}_best_0.pkl $OUT \
        "Registry rebuild: $OUT (same-vd ladder finetune, tloss $TL)"
}

echo "=== [6] extras ($(date -u)) ==="
point demo/train_run_vd56a2  ent_opt_192_56_16  demo/mse/1_56.pkl   demo/mse/2_56.pkl  3e-4 \
    --valid-dim 56 --alpha 2 --lr 1e-5
point demo/train_run_vd192a2 ent_opt_192_192_16 demo/mse/10_192.pkl demo/mse/9_192.pkl 3e-4 \
    --valid-dim 192 --alpha 2 --lr 1e-5
point demo/train_run_ssim112 ent_opt_192_112_16 demo/mse/5_112.pkl  demo/ssim/5_112.pkl 0.05 \
    --valid-dim 112 --alpha 1 --beta 10 --gamma 0 --lr 1e-5

# ---- RD tables --------------------------------------------------------------
echo "=== [7] rd_curve ($(date -u)) ==="
ls $DATA/test_*.npy | head -6 > /tmp/r3_eval_list.txt
# tables via encode-side reconstruction (equal to the decoded image by the
# bit-exactness tests; avoids cold scan-decode compiles per valid_dim) ...
python tools/rd_curve.py --img-file /tmp/r3_eval_list.txt \
    > /tmp/r3_rd_mse.log 2>&1 || true
tail -20 /tmp/r3_rd_mse.log
python tools/rd_curve.py --img-file /tmp/r3_eval_list.txt --ssim \
    > /tmp/r3_rd_ssim.log 2>&1 || true
tail -20 /tmp/r3_rd_ssim.log
# ... plus ONE full-bitstream roundtrip spot check on the flagship (its
# scan programs are already in the compile cache from the bench warm)
python tools/rd_curve.py --img-file /tmp/r3_eval_list.txt \
    --model-indices 9 --decode > /tmp/r3_rd_flagship_roundtrip.log 2>&1 || true
tail -5 /tmp/r3_rd_flagship_roundtrip.log
echo "=== REBUILD DONE ($(date -u)) ==="
