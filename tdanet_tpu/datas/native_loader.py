"""ctypes bridge to the C++ batch loader (tdanet_tpu/native/loader.cc).

``NativeLoader`` is a drop-in alternative to ``datasets.Loader``: a C++
thread pool decodes wavs (reading only the cropped byte range), assembles
fixed-shape batches, and Python copies them straight into numpy arrays —
no per-item Python, no GIL on the decode path. Falls back transparently
when the shared library hasn't been built (``make -C tdanet_tpu/native``
— auto-built on first use when g++ is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtdanet_io.so"))
_LIB = None


def _build_lib():
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH) and not _build_lib():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tdanet_loader_create.restype = ctypes.c_void_p
    lib.tdanet_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int]
    lib.tdanet_loader_next.restype = ctypes.c_int
    lib.tdanet_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.tdanet_loader_n_batches.restype = ctypes.c_int64
    lib.tdanet_loader_n_batches.argtypes = [ctypes.c_void_p]
    lib.tdanet_loader_start_epoch.argtypes = [ctypes.c_void_p,
                                              ctypes.c_uint64]
    lib.tdanet_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.tdanet_wav_frames.restype = ctypes.c_int64
    lib.tdanet_wav_frames.argtypes = [ctypes.c_char_p]
    lib.tdanet_loader_create_av.restype = ctypes.c_void_p
    lib.tdanet_loader_create_av.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int, ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.tdanet_loader_next_av.restype = ctypes.c_int
    lib.tdanet_loader_next_av.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.tdanet_npz_mouth_dims.restype = ctypes.c_int
    lib.tdanet_npz_mouth_dims.argtypes = [ctypes.c_char_p,
                                          ctypes.POINTER(ctypes.c_int64)]
    _LIB = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


class NativeLoader:
    """C++-backed batch iterator over a SeparationDataset's manifest."""

    def __init__(self, dataset, batch_size, shuffle=False, num_workers=4,
                 seed=0, prefetch=4):
        lib = load_library()
        if lib is None:
            raise RuntimeError(
                "native loader library unavailable (g++ build failed)")
        self._lib = lib
        self.ds = dataset
        self.batch_size = batch_size
        self.seg = dataset.seg_len
        if self.seg is None:
            raise ValueError("NativeLoader requires a fixed segment length")
        self.n_src = dataset.n_src
        self.epoch = 0

        mix_paths = [info[0].encode() for info in dataset.mix]
        src_paths = []
        for i in range(len(dataset.mix)):
            for s in range(self.n_src):
                src_paths.append(dataset.sources[s][i][0].encode())
        lengths = np.asarray([info[1] for info in dataset.mix], np.int64)

        MixArr = ctypes.c_char_p * len(mix_paths)
        SrcArr = ctypes.c_char_p * len(src_paths)
        # AV branch (lrs2datamodule.py:180-247): source manifests carry a
        # mouth .npz at index 1; the C++ side reads npz/npy natively
        self.audio_only = getattr(dataset, "audio_only", True)
        if not self.audio_only:
            mouth_paths = []
            for i in range(len(dataset.mix)):
                for s in range(self.n_src):
                    mouth_paths.append(dataset.sources[s][i][1].encode())
            dims = (ctypes.c_int64 * 3)()
            if not lib.tdanet_npz_mouth_dims(mouth_paths[0], dims):
                raise RuntimeError(
                    f"cannot probe mouth npz {mouth_paths[0]!r}")
            self.fps_len = int(dataset.fps_len)
            self.mh, self.mw = int(dims[1]), int(dims[2])
            MouthArr = ctypes.c_char_p * len(mouth_paths)
            self._handle = lib.tdanet_loader_create_av(
                MixArr(*mix_paths), SrcArr(*src_paths),
                MouthArr(*mouth_paths),
                lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(mix_paths), self.n_src, self.seg, batch_size,
                1 if shuffle else 0, seed, num_workers, prefetch,
                self.fps_len, self.mh, self.mw)
        else:
            self._handle = lib.tdanet_loader_create(
                MixArr(*mix_paths), SrcArr(*src_paths),
                lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(mix_paths), self.n_src, self.seg, batch_size,
                1 if shuffle else 0, seed, num_workers, prefetch)

    def __len__(self):
        return int(self._lib.tdanet_loader_n_batches(self._handle))

    def __iter__(self):
        if self.epoch > 0:
            self._lib.tdanet_loader_start_epoch(self._handle, self.epoch)
        self.epoch += 1
        B, S, n = self.batch_size, self.seg, self.n_src
        fp = ctypes.POINTER(ctypes.c_float)
        while True:
            mix = np.empty((B, S), np.float32)
            src = np.empty((B, n, S), np.float32)
            if self.audio_only:
                ok = self._lib.tdanet_loader_next(
                    self._handle, mix.ctypes.data_as(fp),
                    src.ctypes.data_as(fp))
                if not ok:
                    break
                yield mix, src, [""] * B
            else:
                mouth = np.empty((B, n, self.fps_len, self.mh, self.mw),
                                 np.float32)
                ok = self._lib.tdanet_loader_next_av(
                    self._handle, mix.ctypes.data_as(fp),
                    src.ctypes.data_as(fp), mouth.ctypes.data_as(fp))
                if not ok:
                    break
                yield mix, src, mouth, [""] * B

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.tdanet_loader_destroy(self._handle)
            self._handle = None
