"""Pretrained-model demo (reference: inference.py:1-10):
load a reference-format checkpoint and separate a wav."""

import sys

from tdanet_tpu.models import BaseModel
from tdanet_tpu.utils import read_wav, separate, write_wav
from tdanet_tpu.utils.misc import honor_jax_platforms_env

honor_jax_platforms_env()  # the axon sitecustomize clobbers JAX_PLATFORMS


def main(ckpt="pretrained/lsr2_4ms/pytorch_model.bin",
         wav_path="test_mix.wav", out_prefix="separated"):
    model, params = BaseModel.from_pretrain("TDANetBest", ckpt)
    wav, sr = read_wav(wav_path)
    est = separate(model, params, wav)
    for i in range(est.shape[0]):
        write_wav(f"{out_prefix}_s{i + 1}.wav", est[i], sr)
        print(f"wrote {out_prefix}_s{i + 1}.wav")


if __name__ == "__main__":
    main(*sys.argv[1:])
