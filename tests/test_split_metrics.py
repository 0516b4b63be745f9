"""SPlitMetricsTracker parity vs the reference splitwrapper.py loaded
as a torch oracle (read-only)."""
import importlib.util
import sys
import types

import numpy as np
import torch

from oracle import _install_stubs


def _load_ref_splitwrapper():
    _install_stubs()  # registers the look2hear package path
    name = "look2hear.metrics.splitwrapper"
    if name in sys.modules:
        return sys.modules[name]
    # stub the metrics package (its __init__ imports fast_bss_eval,
    # absent here) so splitwrapper's relative ..losses import resolves
    if "look2hear.metrics" not in sys.modules:
        mpkg = types.ModuleType("look2hear.metrics")
        mpkg.__path__ = ["/root/reference/look2hear/metrics"]
        sys.modules["look2hear.metrics"] = mpkg
    spec = importlib.util.spec_from_file_location(
        name, "/root/reference/look2hear/metrics/splitwrapper.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_split_tracker_matches_reference(tmp_path):
    """Row-for-row equality with the reference tracker on 2+1-source
    mixtures whose estimates are PERMUTED — exercising the global
    3-source neg-SNR PIT reorder (splitwrapper.py:51-53) that runs
    before the two/one split."""
    from tdanet_tpu.metrics import SPlitMetricsTracker

    ref_mod = _load_ref_splitwrapper()
    ref = ref_mod.SPlitMetricsTracker(save_file=str(tmp_path / "ref.csv"))
    ours = SPlitMetricsTracker(str(tmp_path / "ours.csv"))

    rng = np.random.default_rng(7)
    T = 4000
    for utt in range(4):
        clean = rng.standard_normal((3, T)).astype(np.float32) * 0.1
        mix = clean.sum(0)
        # estimate = noisy clean, then scrambled so the global reorder
        # matters (channel 2 holds what belongs at channel 0, etc.)
        est = clean + 0.02 * rng.standard_normal((3, T)).astype(np.float32)
        perm = [2, 0, 1] if utt % 2 else [1, 2, 0]
        est = est[perm]

        ref(torch.from_numpy(mix), torch.from_numpy(clean),
            torch.from_numpy(est), f"utt{utt}")
        row = ours(mix, clean, est, f"utt{utt}")

        for field, acc in (("one_snr", ref.one_all_snrs),
                           ("one_snr_i", ref.one_all_snrs_i),
                           ("one_si-snr", ref.one_all_sisnrs),
                           ("one_si-snr_i", ref.one_all_sisnrs_i),
                           ("two_snr", ref.two_all_snrs),
                           ("two_snr_i", ref.two_all_snrs_i),
                           ("two_si-snr", ref.two_all_sisnrs),
                           ("two_si-snr_i", ref.two_all_sisnrs_i)):
            assert abs(row[field] - acc[-1]) < 2e-3, \
                (field, row[field], acc[-1])

    res = ours.final()
    ref.final()  # flushes + closes the reference CSV
    assert np.isfinite(res["two_si-snr_i"]) and np.isfinite(
        res["one_si-snr_i"])
    # same 9-column schema as the reference CSV
    header = open(tmp_path / "ours.csv").readline().strip()
    ref_header = open(tmp_path / "ref.csv").readline().strip()
    assert header == ref_header
