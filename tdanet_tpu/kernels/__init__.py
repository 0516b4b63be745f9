"""Pallas TPU kernels (native-code layer; reference §2.7)."""

from tdanet_tpu.kernels.window_process import (
    WindowProcess,
    WindowProcessReverse,
    roll_and_window_partition,
    roll_and_window_partition_xla,
    window_merge_and_roll,
    window_merge_and_roll_xla,
    window_partition_xla,
    window_reverse_xla,
)

__all__ = [
    "WindowProcess", "WindowProcessReverse", "roll_and_window_partition",
    "roll_and_window_partition_xla", "window_merge_and_roll",
    "window_merge_and_roll_xla", "window_partition_xla",
    "window_reverse_xla",
]
