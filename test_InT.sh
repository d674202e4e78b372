#!/usr/bin/env bash
# Canonical InT eval config (reference test_InT.sh).
python test_model.py --model InT --name InT --length 64 --speed 1 --dist 14 \
  --which_tests=64
