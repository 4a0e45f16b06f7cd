#!/bin/bash
# Round-3 extras: three more registry rate points on top of round3_train.sh
# (which installs mse/1_56, mse/5_112, ssim/9_192 next to round 2's
# mse/10_192). Each extra point stage-initializes from an already-trained
# neighbour (the reference's run.sh --init staging), so a handful of epochs
# converges:
#
#   4. MSE  2_56  (alpha=2, from mse/1_56)   -> model-idx 1
#   5. MSE  9_192 (alpha=2, from mse/10_192) -> model-idx 8
#   6. SSIM 5_112 (beta=10, from mse/5_112)  -> ssim model-idx 4
#
# Run AFTER round3_train.sh, one process at a time on the TPU tunnel:
#   bash tools/round3_train_extra.sh >/tmp/r3_train_extra.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

DATA=/tmp/synth360
[ -d $DATA ] || python tools/make_synth_dataset.py --out $DATA --n-train 256 --n-test 16
head -128 $DATA/train.txt > $DATA/train128.txt

COMMON="--img-dir $DATA --train-list $DATA/train128.txt --test-list $DATA/test.txt \
        --difficulty-dict $DATA/train_val.dic --batch-size 2 --acc-batch 2 \
        --test-batch-size 2"

train () { python -m pseudocylindrical_convolution_tpu.train.loop $COMMON "$@"; }

resume_or () {  # resume_or <dir> <prefix> <fallback-ckpt> <args...>
    local D=$1 P=$2 FB=$3; shift 3
    if [ -f $D/${P}_trainstate.pkl ]; then
        train --resume $D/${P}_trainstate.pkl --epochs 3 "$@" --save-dir $D
    else
        train --resume $FB --epochs 6 "$@" --save-dir $D
    fi
}

# ---- rate point 4: MSE 2_56 (alpha=2; higher rate than 1_56) -------------
D=demo/train_run_vd56a2
if [ ! -f $D/.done ]; then
    resume_or $D ent_opt_192_56_16 demo/mse/1_56.pkl --valid-dim 56 --alpha 2
    touch $D/.done
fi
cp $D/ent_opt_192_56_16_best_0.pkl demo/mse/2_56.pkl
echo "=== installed demo/mse/2_56.pkl ==="

# ---- rate point 5: MSE 9_192 (alpha=2; lower rate than 10_192) -----------
D=demo/train_run_vd192a2
if [ ! -f $D/.done ]; then
    resume_or $D ent_opt_192_192_16 demo/mse/10_192.pkl --valid-dim 192 --alpha 2
    touch $D/.done
fi
cp $D/ent_opt_192_192_16_best_0.pkl demo/mse/9_192.pkl
echo "=== installed demo/mse/9_192.pkl ==="

# ---- rate point 6: SSIM 5_112 (beta=10, from the MSE vd112 model) --------
D=demo/train_run_ssim112
mkdir -p demo/ssim
if [ ! -f $D/.done ]; then
    # SSIM finetune at the reference's lr (see round3_train.sh rate point 3)
    resume_or $D ent_opt_192_112_16 demo/mse/5_112.pkl \
        --valid-dim 112 --alpha 1 --beta 10 --gamma 0 --lr 1e-5
    touch $D/.done
fi
cp $D/ent_opt_192_112_16_best_0.pkl demo/ssim/5_112.pkl
echo "=== installed demo/ssim/5_112.pkl ==="

# ---- evaluation: RD tables over the full installed registry --------------
ls $DATA/test_*.npy | head -6 > /tmp/r3_eval_list.txt
echo "=== rd_curve (mse registry) ==="
python tools/rd_curve.py --img-file /tmp/r3_eval_list.txt \
       --model-indices 0 1 4 8 9 --decode
echo "=== rd_curve (ssim registry) ==="
python tools/rd_curve.py --img-file /tmp/r3_eval_list.txt --ssim \
       --model-indices 4 8 --decode
echo "=== EXTRA MARATHON DONE ==="
