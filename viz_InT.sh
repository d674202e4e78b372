#!/usr/bin/env bash
# Canonical InT attribution-viz config (reference viz_InT.sh).
python viz_model_att.py --model InT --name InT --length 64 --speed 1 --dist 25 \
  --set_name=gen_1_25_64 -b 40
