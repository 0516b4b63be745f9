"""Data layer, metrics, and config-system tests (synthetic fixtures)."""
import json
import os

import numpy as np
import pytest

from tdanet_tpu.datas import (
    Libri2MixDataModule,
    LibriCSSDataset,
    Loader,
    SeparationDataset,
    preprocess_one_dir,
)
from tdanet_tpu.metrics import MetricsTracker, sdr_pit
from tdanet_tpu.utils import (
    apply_overrides,
    parse_args_as_dict,
    prepare_parser_from_dict,
    read_wav,
    write_wav,
)

SR = 8000


def make_synth_split(root, n_utt=6, sr=SR, seconds=(1.0, 4.0), seed=0):
    """Create wavs + manifests like DataPreProcess output."""
    rng = np.random.default_rng(seed)
    infos = {"mix_clean": [], "s1": [], "s2": []}
    durations = np.linspace(seconds[0], seconds[1], n_utt)  # deterministic
    for i in range(n_utt):
        T = int(sr * durations[i])
        s1 = rng.standard_normal(T).astype(np.float32) * 0.1
        s2 = rng.standard_normal(T).astype(np.float32) * 0.1
        mix = s1 + s2
        for ch, data in (("mix_clean", mix), ("s1", s1), ("s2", s2)):
            path = os.path.join(root, ch, f"utt{i}.wav")
            write_wav(path, data, sr)
            infos[ch].append([path, T])
    for ch, lst in infos.items():
        with open(os.path.join(root, f"{ch}.json"), "w") as f:
            json.dump(lst, f)
    return infos


def test_wav_roundtrip(tmp_path):
    data = np.sin(np.linspace(0, 100, SR)).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, data, SR)
    back, sr = read_wav(p)
    assert sr == SR
    np.testing.assert_allclose(back, data, atol=1e-6)


def test_dataset_drops_short_and_crops(tmp_path):
    infos = make_synth_split(str(tmp_path))
    ds = SeparationDataset(str(tmp_path), segment=3.0, sample_rate=SR)
    seg = int(3.0 * SR)
    # every kept utterance is >= segment; the short ones were dropped
    assert all(info[1] >= seg for info in ds.mix)
    n_short = sum(1 for _, n in infos["mix_clean"] if n < seg)
    assert ds.drop_utt == n_short
    assert len(ds) == len(infos["mix_clean"]) - n_short
    mix, src, name = ds.__getitem__(0, np.random.default_rng(0))
    assert mix.shape == (seg,)
    assert src.shape == (2, seg)
    assert np.allclose(mix, src.sum(0), atol=1e-5)


def test_dataset_full_length_at_test(tmp_path):
    make_synth_split(str(tmp_path))
    ds = SeparationDataset(str(tmp_path), segment=None, sample_rate=SR)
    mix, src, _ = ds[0]
    assert mix.shape[-1] == ds.mix[0][1]


def test_loader_batches(tmp_path):
    make_synth_split(str(tmp_path), n_utt=7, seconds=(3.5, 4.0))
    ds = SeparationDataset(str(tmp_path), segment=3.0, sample_rate=SR)
    loader = Loader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 2  # drop_last
    mix, src, names = batches[0]
    assert mix.shape == (2, int(3.0 * SR))
    assert src.shape == (2, 2, int(3.0 * SR))
    assert len(names) == 2


def test_dataset_n_src1_pair_expansion(tmp_path):
    """n_src=1 single-target mode (libri2mixdatamodule.py:68-95,121-146):
    both s1/s2 manifests are read and each utterance becomes one
    (mix, source) item per source, target shape (1, T). Reference
    quirks pinned: train-time expansion iterates BACKWARDS (reversed
    utterance order — the drop loop doubles as the build loop), test
    iterates forwards."""
    infos = make_synth_split(str(tmp_path))
    seg = 3.0
    kept = [i for i, (_, T) in enumerate(infos["mix_clean"])
            if T >= int(seg * SR)]

    ds = SeparationDataset(str(tmp_path), n_src=1, segment=seg,
                           sample_rate=SR)
    assert len(ds) == 2 * len(kept)
    # reversed utterance order, s1 then s2 per utterance
    for j, i in enumerate(reversed(kept)):
        for s, skey in enumerate(("s1", "s2")):
            item_idx = 2 * j + s
            assert ds.mix[item_idx][0] == infos["mix_clean"][i][0]
            assert ds.sources[0][item_idx][0] == infos[skey][i][0]
    mix, src, name = ds[0]
    assert src.shape == (1, int(seg * SR)) and mix.shape == src.shape[1:]

    # test mode: forward order, full length
    ds_t = SeparationDataset(str(tmp_path), n_src=1, segment=None,
                             sample_rate=SR)
    assert len(ds_t) == 2 * len(infos["mix_clean"])
    assert ds_t.mix[0][0] == infos["mix_clean"][0][0]
    assert ds_t.sources[0][1][0] == infos["s2"][0][0]
    mix, src, _ = ds_t[0]
    np.testing.assert_allclose(
        src[0], read_wav(infos["s1"][0][0])[0], atol=1e-6)


def test_loader_propagates_worker_errors(tmp_path):
    """A corrupt/missing wav must fail the epoch loudly — the producer
    used to swallow the exception and end the epoch early, silently
    training on a truncated dataset."""
    make_synth_split(str(tmp_path), n_utt=6, seconds=(3.5, 4.0))
    ds = SeparationDataset(str(tmp_path), segment=3.0, sample_rate=SR)

    class Corrupt:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i, rng=None):
            if i == 3:
                raise OSError("simulated unreadable wav")
            return ds.__getitem__(i, rng)

    loader = Loader(Corrupt(), batch_size=2, shuffle=False, num_workers=2)
    try:
        list(loader)
        assert False, "expected the worker error to propagate"
    except OSError as e:
        assert "unreadable" in str(e)


def test_datamodule_setup(tmp_path):
    for split in ("tr", "dev", "tt"):
        make_synth_split(str(tmp_path / split), seconds=(3.5, 4.0))
    dm = Libri2MixDataModule(
        train_dir=str(tmp_path / "tr"), valid_dir=str(tmp_path / "dev"),
        test_dir=str(tmp_path / "tt"), n_src=2, sample_rate=SR, segment=3.0,
        batch_size=2, num_workers=1)
    dm.setup()
    train, val, test = dm.make_sets
    assert len(train) > 0 and len(val) > 0 and len(test) > 0
    tl, vl, sl = dm.make_loader
    mix, src, names = next(iter(tl))
    assert mix.shape[0] == 2


def test_preprocess_one_dir(tmp_path):
    wav_dir = tmp_path / "wavs"
    os.makedirs(wav_dir)
    for i in range(3):
        write_wav(str(wav_dir / f"u{i}.wav"),
                  np.zeros(100 * (i + 1), np.float32), SR)
    infos = preprocess_one_dir(str(wav_dir), str(tmp_path / "out"), "mix")
    with open(tmp_path / "out" / "mix.json") as f:
        loaded = json.load(f)
    assert [n for _, n in loaded] == [100, 200, 300]


def test_libricss_segmentation(tmp_path):
    sr, seconds = SR, 2.6
    T = int(sr * seconds)
    write_wav(str(tmp_path / "long.wav"),
              np.random.default_rng(0).standard_normal(T).astype(np.float32),
              sr)
    ds = LibriCSSDataset(str(tmp_path), sample_rate=sr, segment=1.0,
                         overlap=0.25)
    name, segs, pad_len = ds[0]
    seg_len, hop = sr, int(sr * 0.75)
    assert all(s.shape == (seg_len,) for s in segs)
    # reconstruct length: first seg + hops + recorded pad
    assert name == "long.wav"
    assert 0 <= pad_len < seg_len


def test_metrics_tracker(tmp_path):
    rng = np.random.default_rng(0)
    s1 = rng.standard_normal(SR).astype(np.float32)
    s2 = rng.standard_normal(SR).astype(np.float32)
    clean = np.stack([s1, s2])
    mix = s1 + s2
    csv_path = str(tmp_path / "metrics.csv")
    tracker = MetricsTracker(csv_path)
    row = tracker(mix, clean, clean + 1e-6 * rng.standard_normal((2, SR)),
                  "perfect")
    assert row["si-snr"] > 40
    assert row["si-snr_i"] > 40
    res = tracker.final()
    assert res["si-snr_i"] > 40
    lines = open(csv_path).read().strip().splitlines()
    assert len(lines) == 1 + 1 + 2  # header + 1 utt + avg/std


def test_metrics_tracker_sdr_direction(tmp_path):
    """Pin the reference's swapped SDR projection direction
    (wrapper.py:50-51): fast_bss_eval losses are (est, ref) but the
    reference passes (clean, estimate), so the sdr column projects the
    CLEAN onto the estimate's delay span, while the baseline (mix,
    clean) is in the normal direction. A delayed-but-perfect estimate
    makes the two directions differ by tens of dB, so this test fails
    loudly if someone 'fixes' the direction."""
    rng = np.random.default_rng(3)
    T, d = 4000, 32
    clean = rng.standard_normal((2, T)).astype(np.float32)
    mix = clean.sum(0)
    # estimate = clean delayed by d: projecting est onto clean's span
    # is a single lag-d tap (near-perfect SDR); projecting clean onto
    # est's span needs a non-causal advance (terrible SDR)
    est = np.concatenate([np.zeros((2, d), np.float32), clean[:, :-d]], -1)

    # fwd ~23 dB (not inf: the correlation-based filter uses the full
    # ref autocorrelation vs a truncated-overlap crosscorrelation —
    # fast_bss_eval computes the same sums); rev ~-9 dB
    fwd, _, _ = sdr_pit(clean, est)   # normal direction: high
    rev, _, _ = sdr_pit(est, clean)   # reference's direction: low
    assert fwd > 15 and rev < 0 and fwd - rev > 20

    tracker = MetricsTracker(str(tmp_path / "m.csv"))
    row = tracker(mix, clean, est, "delayed")
    assert abs(row["sdr"] - rev) < 1e-9  # quirk reproduced, not 'fixed'
    base, _, _ = sdr_pit(clean, np.stack([mix, mix]))
    assert abs(row["sdr_i"] - (rev - base)) < 1e-9


def test_bss_eval_sdr_properties():
    rng = np.random.default_rng(1)
    refs = rng.standard_normal((2, 4000))
    # estimate = short-FIR-filtered refs (allowed distortion) -> high SDR
    h = np.array([0.8, 0.1, -0.05])
    ests = np.stack([np.convolve(r, h)[:4000] for r in refs])
    sdr, per_src, perm = sdr_pit(refs, ests)
    assert sdr > 40
    assert perm == (0, 1)
    # permuted estimates are recovered by PIT
    sdr_p, _, perm_p = sdr_pit(refs, ests[::-1])
    assert abs(sdr_p - sdr) < 1e-6
    assert perm_p == (1, 0)
    # unrelated noise -> low SDR
    noise = rng.standard_normal((2, 4000))
    sdr_n, _, _ = sdr_pit(refs, noise)
    assert sdr_n < 5


def test_parser_two_level_mirror():
    conf = {"audionet": {"audionet_name": "TDANetBest",
                         "audionet_config": {"out_channels": 128}},
            "optimizer": {"optim_name": "adam", "lr": 0.001}}
    parser = prepare_parser_from_dict(conf)
    d = parse_args_as_dict(parser, args=["--lr", "0.01"])
    assert d["optimizer"]["lr"] == 0.01
    assert d["audionet"]["audionet_name"] == "TDANetBest"


def test_apply_overrides():
    conf = {"a": {"b": {"c": 1}}, "x": True}
    out = apply_overrides(conf, ["a.b.c=5", "x=false", "new.key=hi"])
    assert out["a"]["b"]["c"] == 5
    assert out["x"] is False
    assert out["new"]["key"] == "hi"
    assert conf["a"]["b"]["c"] == 1  # original untouched


def test_stitch_chain_matches_reference_loop():
    """Pin the permutation-chain semantics against an independent
    transcription of the torch CSS loop (audio_test_css.py:109-131):
    comparison tails FROZEN at segment 0 (s1_t_minus_1 assigned only at
    k==0), tie SWAPS (keep requires comb1 > comb2). Random segments
    with engineered sign flips exercise both keep and swap branches,
    including a case where frozen-tail and previous-tail alignment
    disagree."""
    import numpy as np

    from tdanet_tpu.utils.css import stitch_chain

    def reference_loop(est, overlap_len):
        def cos(a, b):
            return float(np.dot(a, b) /
                         (np.linalg.norm(a) * np.linalg.norm(b) + 1e-8))
        out1, out2 = [est[0, 0]], [est[0, 1]]
        t1, t2 = est[0, 0][-overlap_len:], est[0, 1][-overlap_len:]
        for k in range(1, est.shape[0]):
            s1, s2 = est[k, 0], est[k, 1]
            comb1 = cos(t1, s1[:overlap_len]) + cos(t2, s2[:overlap_len])
            comb2 = cos(t1, s2[:overlap_len]) + cos(t2, s1[:overlap_len])
            if comb1 > comb2:
                out1.append(s1[overlap_len:])
                out2.append(s2[overlap_len:])
            else:
                out1.append(s2[overlap_len:])
                out2.append(s1[overlap_len:])
        return np.stack([np.concatenate(out1), np.concatenate(out2)])

    rng = np.random.default_rng(0)
    L, ov = 64, 16
    for trial in range(20):
        K = int(rng.integers(2, 6))
        est = rng.standard_normal((K, 2, L)).astype(np.float32)
        # make heads correlate with segment k-1's tails on odd trials so
        # frozen-at-0 vs previous-tail alignment actually disagree
        if trial % 2:
            for k in range(1, K):
                est[k, :, :ov] = est[k - 1, :, -ov:][::-1]
        got = stitch_chain(est, ov)
        want = reference_loop(est, ov)
        np.testing.assert_array_equal(got, want)

    # exact tie must SWAP (reference keeps only on strict >)
    est = np.ones((2, 2, L), np.float32)
    got = stitch_chain(est, ov)
    want = reference_loop(est, ov)
    np.testing.assert_array_equal(got, want)

    # overlap_len=0 with multiple segments fails loudly (the reference
    # crashes on the empty cosine slice; we raise a clear error)
    try:
        stitch_chain(np.zeros((2, 2, L), np.float32), 0)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "overlap" in str(e)
