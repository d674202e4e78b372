from pathtracker_tpu.data.tfrecord import (
    read_tfrecord_file,
    write_tfrecord_file,
    parse_example,
    build_example,
)
from pathtracker_tpu.data.pathtracker import render_pathtracker_clip, make_synthetic_dataset
from pathtracker_tpu.data.pipeline import tfr_data_loader, ClipDataset
