"""pathtracker_tpu — a TPU-native JAX framework for the PathTracker task.

A from-scratch re-design of the capabilities of the reference PyTorch codebase
(pathtracker-code/pathtracker-models): the InT gated recurrent circuit and a zoo
of video baselines (hGRU, ConvGRU, ConvLSTM, ST-LSTM, LSTM/LRCN, feedforward
3D convnets, 3D ResNets, TSM+MotionSqueeze, SlowFast, TimeSformer/Performer/
Lambda), trained on 3-channel 32x32 clips loaded from GZIP TFRecords.

Design stance (TPU-first, not a port):
  * all recurrence is `jax.lax.scan` over the frame axis with static shapes;
  * input-dependent projections are hoisted out of the scan into one large
    batched matmul (MXU-friendly) instead of per-step 1x1 convs;
  * batch statistics (the reference's track_running_stats=False BatchNorm)
    are pure functions of the current batch, so every model is a pure
    params->logits function — no mutable state anywhere;
  * parallelism is SPMD over a `jax.sharding.Mesh` (batch on the 'data' axis),
    with XLA-inserted collectives, instead of DataParallel scatter/gather;
  * the data path is a TF-free TFRecord(GZIP) codec with a native C++ fast
    path and device-side normalization/layout (uint8 in HBM, f32 out).

Layers (mirrors SURVEY.md's layer map of the reference):
  data/      TFRecord codec, synthetic PathTracker renderer, input pipeline
  models/    the model zoo, each a flax.linen module with the reference contract
  ops/       initializers, batch-stat norm, correlation, TSM, RBP, Pallas kernels
  parallel/  mesh construction + sharding helpers
  utils/     flags, meters, metrics, early stopping, logging sinks
  engine.py  model/dataset registries and the model_step families
  train.py / test.py / viz.py   entry points (argparse-compatible with the
             reference's mainclean.py / test_model.py / viz_model_att.py)
"""

__version__ = "0.1.0"
