from pathtracker_tpu.ops.initializers import (
    torch_conv_default,
    torch_conv_bias,
    torch_orthogonal_conv,
    torch_orthogonal_matrix,
    chrono_gate_bias,
)
from pathtracker_tpu.ops.layers import (
    conv2d,
    conv3d,
    batch_norm,
    layer_norm_2d,
    softplus,
    global_avg_pool,
)
