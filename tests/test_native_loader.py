"""C++ native loader: build, decode correctness, batching, shuffling."""
import numpy as np
import pytest

from tdanet_tpu.datas import SeparationDataset
from tdanet_tpu.datas.native_loader import NativeLoader, native_available
from test_data_metrics_utils import make_synth_split

SR = 8000


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ build unavailable")


@pytest.fixture
def dataset(tmp_path):
    make_synth_split(str(tmp_path), n_utt=8, seconds=(2.0, 3.0), seed=3)
    return SeparationDataset(str(tmp_path), segment=1.5, sample_rate=SR)


def test_native_batches_and_mix_consistency(dataset):
    loader = NativeLoader(dataset, batch_size=2, shuffle=False,
                          num_workers=2, seed=0)
    assert len(loader) == len(dataset) // 2
    batches = list(iter(loader))
    assert len(batches) == len(loader)
    seg = int(1.5 * SR)
    for mix, src, names in batches:
        assert mix.shape == (2, seg) and src.shape == (2, 2, seg)
        # mixture == sum of sources for the synthetic data (same crop)
        np.testing.assert_allclose(mix, src.sum(1), atol=1e-3)
        assert np.abs(mix).max() > 0


def test_native_matches_python_decode(dataset, tmp_path):
    # full-file read through the native path == audio_io read
    from tdanet_tpu.utils import read_wav
    path, n = dataset.mix[0]
    ds_full = SeparationDataset(dataset.json_dir, segment=n / SR,
                                sample_rate=SR)
    loader = NativeLoader(ds_full, batch_size=1, shuffle=False,
                          num_workers=1, seed=0)
    mix, src, _ = next(iter(loader))
    want, _ = read_wav(path)
    np.testing.assert_allclose(mix[0][:len(want)], want, atol=1e-6)


def _make_av_split(root, n_utt=4, seconds=2.0, fps=25, hw=(6, 5), seed=7,
                   compressed=False, dtype=np.float32):
    import json
    import os

    from tdanet_tpu.utils import write_wav
    rng = np.random.default_rng(seed)
    T = int(seconds * SR)
    infos = {"mix_clean": [], "s1": [], "s2": []}
    save = np.savez_compressed if compressed else np.savez
    for i in range(n_utt):
        s1 = rng.standard_normal(T).astype(np.float32) * 0.1
        s2 = rng.standard_normal(T).astype(np.float32) * 0.1
        # the python AV branch np.stacks per-source mouths, so frame
        # counts must agree within an item (they may differ across items)
        n_frames = int(seconds * fps) + int(rng.integers(-3, 4))
        for ch, d in (("mix_clean", s1 + s2), ("s1", s1), ("s2", s2)):
            p = os.path.join(root, ch, f"u{i}.wav")
            write_wav(p, d, SR)
            if ch == "mix_clean":
                infos[ch].append([p, T])
            else:
                mp = os.path.join(root, ch, f"u{i}.npz")
                if dtype == np.uint8:
                    data = rng.integers(0, 255, (n_frames, *hw)) \
                        .astype(np.uint8)
                else:
                    data = rng.standard_normal((n_frames, *hw)) \
                        .astype(dtype)
                save(mp, data=data)
                infos[ch].append([p, mp, T])
    for ch, lst in infos.items():
        with open(os.path.join(root, f"{ch}.json"), "w") as f:
            json.dump(lst, f)


@pytest.mark.parametrize("compressed,dtype", [
    (False, np.float32),    # np.savez: stored zip entries
    (True, np.float32),     # np.savez_compressed: deflate
    (False, np.uint8),      # uint8 mouth crops
])
def test_native_av_matches_python(tmp_path, compressed, dtype):
    """The C++ npz/npy mouth path yields exactly the Python AV branch's
    tensors (reference lrs2datamodule.py:180-247)."""
    _make_av_split(str(tmp_path), compressed=compressed, dtype=dtype)
    ds = SeparationDataset(str(tmp_path), segment=2.0, sample_rate=SR,
                           audio_only=False, fps=25)
    loader = NativeLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                          seed=0)
    batches = list(iter(loader))
    assert len(batches) == len(ds) // 2
    for bi, (mix, src, mouth, names) in enumerate(batches):
        assert mouth.shape == (2, 2, 50, 6, 5)
        for k in range(2):
            w_mix, w_src, w_mouth, _ = ds[bi * 2 + k]
            np.testing.assert_allclose(mix[k], w_mix, atol=1e-6)
            np.testing.assert_allclose(src[k], w_src, atol=1e-6)
            # python path truncates but does not pad; compare the
            # overlapping frames and require zero padding beyond
            nf = w_mouth.shape[1]
            np.testing.assert_array_equal(
                mouth[k][:, :nf], w_mouth.astype(np.float32))
            assert not mouth[k][:, nf:].any()


def test_native_shuffle_differs_by_epoch(dataset):
    loader = NativeLoader(dataset, batch_size=2, shuffle=True,
                          num_workers=2, seed=0)
    e1 = np.concatenate([m.ravel() for m, _, _ in loader])
    e2 = np.concatenate([m.ravel() for m, _, _ in loader])
    assert e1.shape == e2.shape
    assert not np.allclose(e1, e2)  # different order / crops per epoch
