#!/bin/bash
# Round-5 sequential TPU training queue. The attached chip is single-tenant,
# so every training job runs alone; each job is wall-capped with `timeout`
# (the trainers checkpoint periodically, so a timeout just freezes the run at
# its last saved step — results cite whatever step was actually reached).
#
# Pause between jobs by `touch /tmp/r5_queue.pause` (frees the chip for a
# bench window); resume by removing the flag. Logs: /tmp/r5_<name>.out.
cd /root/repo || exit 1
export ICLR17C_PRECISION=high
LOG=/tmp/r5_queue.log

run() { # run <wallcap_s> <name> <cli args...>
  echo "[queue] $(date +%T) start $2 (cap ${1}s)" >>"$LOG"
  timeout "$1" python -m iclr_17_compression_tpu.train.cli -n "$2" "${@:3}" \
    >"/tmp/r5_$2.out" 2>&1
  echo "[queue] $(date +%T) done $2 rc=$?" >>"$LOG"
  while [ -f /tmp/r5_queue.pause ]; do sleep 20; done
}

resume_if() { # echo --resume <dir> when a checkpoint exists there
  [ -f "$1/latest.ckpt" ] && echo "--resume $1"
}

# 1. DSC rate ladder (verdict round-4 "missing" #1): flagship base, the
#    higher-rate temp_1bpp preset, then the residual reg stage on the frozen
#    flagship — the reference's two-stage 0.0625-bpp mechanism.
run 5400 dsc_flagship --config examples/rd/dsc_flagship.json \
  $(resume_if checkpoints/dsc_flagship)
run 3300 dsc_1bpp --config examples/rd/dsc_1bpp.json \
  $(resume_if checkpoints/dsc_1bpp)
run 2400 dsc_reg0625 --config examples/rd/dsc_reg0625.json \
  -p checkpoints/dsc_flagship/best_train.ckpt

# 2. Ballé-17 λ sweep: lam512 lost its round-3/4 checkpoints (fresh start),
#    the rest resume their round-4 runs.
run 3900 lam512 --config examples/rd/lam512.json \
  $(resume_if checkpoints/lam512)
run 2400 lam128 --config examples/rd/lam128.json --resume checkpoints/lam128
run 2400 lam2048 --config examples/rd/lam2048.json --resume checkpoints/lam2048
run 1500 lam8192 --config examples/rd/lam8192.json --resume checkpoints/lam8192
run 1500 msssim48 --config examples/rd/msssim48.json --resume checkpoints/msssim48
echo "[queue] $(date +%T) ALL DONE" >>"$LOG"
