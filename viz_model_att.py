#!/usr/bin/env python3
"""Attribution-visualization entry point (reference viz_model_att.py
equivalent): input-gradient saliency against human MTurk responses."""
from pathtracker_tpu.eval.viz import main

if __name__ == "__main__":
    main()
