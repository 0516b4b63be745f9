"""Per-utterance eval metric trackers (reference: metrics/wrapper.py:25-90,
metrics/splitwrapper.py:23-121): PIT SI-SNR(+i vs mixture baseline) and
BSS-eval SDR(+i), streamed to CSV with avg+std footer rows."""

from __future__ import annotations

import csv

import numpy as np

import jax.numpy as jnp

from tdanet_tpu.losses import (
    PITLossWrapper,
    pairwise_neg_sisdr,
    pairwise_neg_snr,
)
from tdanet_tpu.metrics.bss_eval import sdr_pit


class MetricsTracker:
    COLUMNS = ["snt_id", "sdr", "sdr_i", "si-snr", "si-snr_i"]

    def __init__(self, save_file: str = ""):
        self.all_sdrs, self.all_sdrs_i = [], []
        self.all_sisnrs, self.all_sisnrs_i = [], []
        self.results_csv = open(save_file, "w") if save_file else None
        self.writer = None
        if self.results_csv is not None:
            self.writer = csv.DictWriter(self.results_csv,
                                         fieldnames=self.COLUMNS)
            self.writer.writeheader()
        # reference default threshold_byloss=True — a no-op at the
        # per-utterance batch=1 this tracker runs at (the >-30 dB subset
        # is either the whole singleton batch or empty-with-fallback)
        self.pit_sisnr = PITLossWrapper(pairwise_neg_sisdr,
                                        pit_from="pw_mtx")

    def __call__(self, mix, clean, estimate, key):
        """mix (T,), clean (n_src, T), estimate (n_src, T)."""
        mix = np.asarray(mix)
        clean = np.asarray(clean)
        estimate = np.asarray(estimate)
        n_src = clean.shape[0]
        mix_rep = np.stack([mix] * n_src, 0)

        sisnr = -float(self.pit_sisnr(jnp.asarray(estimate)[None],
                                      jnp.asarray(clean)[None]))
        sisnr_base = -float(self.pit_sisnr(jnp.asarray(mix_rep)[None],
                                           jnp.asarray(clean)[None]))
        sisnr_i = sisnr - sisnr_base

        # Reference-exact quirk (wrapper.py:50-51, load-bearing for
        # parity with reported numbers): fast_bss_eval loss functions
        # take (est, ref) — est first, the torch loss convention — but
        # the reference passes `sdr_pit_loss(clean, estimate)`, i.e.
        # CLEAN in the estimate slot. The metric therefore projects the
        # clean sources onto the ESTIMATE's delay span (a merely-delayed
        # perfect estimate scores LOW). The baseline call
        # `sdr_pit_loss(mix, clean)` is in the normal direction, so
        # sdr_i mixes the two conventions. sdr_pit here is (refs, ests).
        sdr, _, _ = sdr_pit(estimate, clean)
        sdr_base, _, _ = sdr_pit(clean, mix_rep)
        sdr_i = sdr - sdr_base

        row = {"snt_id": key, "sdr": sdr, "sdr_i": sdr_i,
               "si-snr": sisnr, "si-snr_i": sisnr_i}
        if self.writer:
            self.writer.writerow(row)
        self.all_sdrs.append(sdr)
        self.all_sdrs_i.append(sdr_i)
        self.all_sisnrs.append(sisnr)
        self.all_sisnrs_i.append(sisnr_i)
        return row

    def update(self):
        return {"sdr_i": float(np.mean(self.all_sdrs_i)),
                "si-snr_i": float(np.mean(self.all_sisnrs_i))}

    def final(self):
        for name, fn in (("avg", np.mean), ("std", np.std)):
            row = {"snt_id": name,
                   "sdr": fn(self.all_sdrs), "sdr_i": fn(self.all_sdrs_i),
                   "si-snr": fn(self.all_sisnrs),
                   "si-snr_i": fn(self.all_sisnrs_i)}
            if self.writer:
                self.writer.writerow(row)
        if self.results_csv:
            self.results_csv.close()
        return self.update()


class SPlitMetricsTracker:
    """2+1-source split metrics (splitwrapper.py:23-121): the three
    estimates are FIRST globally reordered by a 3-source neg-SNR PIT
    (splitwrapper.py:51-53, return_ests=True), then SNR and SI-SNR
    (+improvement vs the stacked-mixture baseline) are computed on the
    reordered [0:2] block and on reordered channel [2] separately.
    Assumes exactly 3 sources, like the reference."""

    COLUMNS = ["snt_id", "one_snr", "one_snr_i", "one_si-snr",
               "one_si-snr_i", "two_snr", "two_snr_i", "two_si-snr",
               "two_si-snr_i"]

    def __init__(self, save_file: str = ""):
        self.acc = {c: [] for c in self.COLUMNS[1:]}
        self.results_csv = open(save_file, "w") if save_file else None
        self.writer = None
        if self.results_csv is not None:
            self.writer = csv.DictWriter(self.results_csv,
                                         fieldnames=self.COLUMNS)
            self.writer.writeheader()
        # reference defaults: threshold_byloss=True (a no-op at the
        # per-utterance batch=1 these trackers run at)
        self.pit_sisnr = PITLossWrapper(pairwise_neg_sisdr,
                                        pit_from="pw_mtx")
        self.pit_snr = PITLossWrapper(pairwise_neg_snr, pit_from="pw_mtx")

    def __call__(self, mix, clean, estimate, key):
        """mix (T,), clean (3, T), estimate (3, T)."""
        cl = jnp.asarray(np.asarray(clean))[None]
        est = jnp.asarray(np.asarray(estimate))[None]
        # global reorder under the 3-source neg-SNR permutation
        _, ests_np = self.pit_snr(est, cl, return_ests=True)
        mix_rep = jnp.asarray(
            np.stack([np.asarray(mix)] * clean.shape[0], 0))[None]

        def pit(fn, e, c):
            return float(fn(e, c))

        vals = {}
        for name, fn in (("si-snr", self.pit_sisnr), ("snr", self.pit_snr)):
            two = pit(fn, ests_np[:, 0:2], cl[:, 0:2])
            one = pit(fn, ests_np[:, 2:3], cl[:, 2:3])
            two_base = pit(fn, mix_rep[:, 0:2], cl[:, 0:2])
            one_base = pit(fn, mix_rep[:, 2:3], cl[:, 2:3])
            vals[f"two_{name}"] = -two
            vals[f"two_{name}_i"] = -(two - two_base)
            vals[f"one_{name}"] = -one
            vals[f"one_{name}_i"] = -(one - one_base)

        row = {"snt_id": key, **{c: vals[c] for c in self.COLUMNS[1:]}}
        if self.writer:
            self.writer.writerow(row)
        for c in self.COLUMNS[1:]:
            self.acc[c].append(vals[c])
        return row

    def update(self):
        return {"two_si-snr_i": float(np.mean(self.acc["two_si-snr_i"])),
                "one_si-snr_i": float(np.mean(self.acc["one_si-snr_i"]))}

    def final(self):
        for name, fn in (("avg", np.mean), ("std", np.std)):
            row = {"snt_id": name,
                   **{c: fn(self.acc[c]) for c in self.COLUMNS[1:]}}
            if self.writer:
                self.writer.writerow(row)
        if self.results_csv:
            self.results_csv.close()
        return self.update()
