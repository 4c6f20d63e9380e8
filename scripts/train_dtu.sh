#!/bin/bash
# DTU stage-1 launcher (ref: bashs/bash_dtu_blending.sh). TPU: no --gpu needed.
usage() { echo "Usage: ${0} [-c|--case] [-lr] [-lr_geo]" 1>&2; exit 1; }
while [[ $# -gt 0 ]]; do
  case ${1} in
    -c|--case) CASE=${2}; shift 2;;
    -g|--gpu) shift 2;;  # accepted for parity; unused on TPU
    -lr|--learning_rate) LR=${2}; shift 2;;
    -lr_geo|--learning_rate_geo) LR_GEO=${2}; shift 2;;
    *) usage; shift;;
  esac
done
python -m neuraludf_tpu.cli --conf ./confs/udf_dtu_blending.conf \
  --case ${CASE} --threshold 0.005 --resolution 128 \
  ${LR:+--learning_rate ${LR}} ${LR_GEO:+--learning_rate_geo ${LR_GEO}}
