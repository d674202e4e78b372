#!/usr/bin/env python3
"""Train entry point (reference mainclean.py equivalent).

Usage matches the reference launcher, e.g.:
  python mainclean.py --model InT --length 64 --speed 1 --dist 14 \
      -b 180 --parallel --lr 3e-04 --epochs 2000 --name InT
"""
from pathtracker_tpu.train.loop import main

if __name__ == "__main__":
    main()
