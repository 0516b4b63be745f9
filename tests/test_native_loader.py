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


def test_native_shuffle_differs_by_epoch(dataset):
    loader = NativeLoader(dataset, batch_size=2, shuffle=True,
                          num_workers=2, seed=0)
    e1 = np.concatenate([m.ravel() for m, _, _ in loader])
    e2 = np.concatenate([m.ravel() for m, _, _ in loader])
    assert e1.shape == e2.shape
    assert not np.allclose(e1, e2)  # different order / crops per epoch
