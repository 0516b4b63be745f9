"""Core ops: torch-parity reference implementations + TPU fast paths."""

from tdanet_tpu.ops.basic import (
    acc_dtype,
    act_storage,
    adaptive_avg_pool1d,
    avg_pool_matrix,
    conv1d,
    dw_s2_fold,
    store_activation,
    conv1d_init,
    conv1d_xavier_init,
    conv_transpose1d,
    conv_transpose1d_xavier_init,
    drop_path,
    dropout,
    glob_ln,
    glob_ln_init,
    group_norm1,
    interpolate_nearest,
    layer_norm,
    layer_norm_init,
    mha_init,
    multi_head_attention,
    pad_signal,
    prelu,
    prelu_init,
    sinusoidal_pe,
)

__all__ = [
    "acc_dtype", "act_storage", "store_activation",
    "adaptive_avg_pool1d", "avg_pool_matrix", "conv1d", "conv1d_init", "conv1d_xavier_init",
    "conv_transpose1d", "dw_s2_fold", "conv_transpose1d_xavier_init", "drop_path",
    "dropout", "glob_ln", "glob_ln_init", "group_norm1",
    "interpolate_nearest", "layer_norm", "layer_norm_init", "mha_init",
    "multi_head_attention", "pad_signal", "prelu", "prelu_init",
    "sinusoidal_pe",
]
