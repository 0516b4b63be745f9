"""tdanet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech-separation framework.

A from-scratch rebuild of the capabilities of the chiexplorer/TDANet
("Look2Hear") reference framework, designed TPU-first:

- functional model cores with explicit parameter pytrees (torch-layout
  tensors, so the released PyTorch checkpoints load losslessly),
- jit-compiled forward/train steps with static, bucketed shapes,
- data/tensor parallelism via ``jax.sharding.Mesh`` + XLA collectives,
- Pallas kernels for the hot framing/overlap-add/attention ops.

Reference layer map: /root/reference (see SURVEY.md for file:line cites).
"""

__version__ = "0.1.0"

__all__ = ["__version__"]
