#!/usr/bin/env python3
"""Eval entry point (reference test_model.py equivalent): picks the best
checkpoint for a run and sweeps the 8 generalization configs."""
from pathtracker_tpu.eval.test_model import main

if __name__ == "__main__":
    main()
