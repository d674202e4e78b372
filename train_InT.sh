#!/usr/bin/env bash
# Canonical InT training config (reference train_InT.sh).
python mainclean.py -b 180 --model InT --length 64 --speed 1 --dist 14 \
  --parallel --lr 3e-04 --epochs 2000 --name InT
