"""Utilities: audio IO, config parsing, tensor helpers, separation API."""

from tdanet_tpu.utils.audio_io import read_wav, wav_frames, write_wav
from tdanet_tpu.utils.misc import (
    get_activation,
    make_non_pad_mask,
    make_pad_mask,
    pad_list,
    pad_x_to_y,
    print_only,
    shape_reconstructed,
    tensors_to_device,
)
from tdanet_tpu.utils.parser import (
    apply_overrides,
    isfloat,
    isint,
    load_yaml,
    parse_args_as_dict,
    parse_config,
    prepare_parser_from_dict,
    save_yaml,
    str2bool,
    str2bool_arg,
    str_int_float,
)
from tdanet_tpu.utils.stft import STFT, iSTFT
from tdanet_tpu.utils.complex_utils import (
    is_complex,
    is_torch_complex_tensor,
    new_complex_like,
)
from tdanet_tpu.utils.progress import (
    BatchesProcessedColumn,
    MyMetricsTextColumn,
    RichProgressBarTheme,
)
from tdanet_tpu.utils.get_layer import InversibleInterface, get_layer
from tdanet_tpu.utils.profiling import count_flops, count_params, \
    profile_model
from tdanet_tpu.utils.separator import separate

__all__ = [
    "read_wav", "wav_frames", "write_wav", "get_activation",
    "make_non_pad_mask", "make_pad_mask", "pad_list", "pad_x_to_y",
    "print_only", "shape_reconstructed", "tensors_to_device",
    "apply_overrides", "load_yaml", "parse_args_as_dict", "parse_config",
    "prepare_parser_from_dict", "save_yaml", "str2bool", "str2bool_arg",
    "str_int_float", "separate", "InversibleInterface", "get_layer",
    "count_flops", "count_params", "profile_model",
    # name-parity with look2hear.utils.__all__ (utils/__init__.py:24-47)
    "STFT", "iSTFT", "isfloat", "isint", "is_complex",
    "is_torch_complex_tensor", "new_complex_like",
    "RichProgressBarTheme", "BatchesProcessedColumn",
    "MyMetricsTextColumn",
]
