"""Per-utterance eval metric trackers (reference: metrics/wrapper.py:25-90,
metrics/splitwrapper.py:23-121): PIT SI-SNR(+i vs mixture baseline) and
BSS-eval SDR(+i), streamed to CSV with avg+std footer rows."""

from __future__ import annotations

import csv

import numpy as np

import jax.numpy as jnp

from tdanet_tpu.losses import PITLossWrapper, pairwise_neg_sisdr
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
        self.pit_sisnr = PITLossWrapper(pairwise_neg_sisdr, pit_from="pw_mtx",
                                        threshold_byloss=False)

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
    """2+1-source split metrics: separate accumulators for the two-speaker
    channels vs the single channel (splitwrapper.py:23-121)."""

    COLUMNS = ["snt_id", "two_si-snr", "two_si-snr_i", "one_si-snr",
               "one_si-snr_i"]

    def __init__(self, save_file: str = ""):
        self.two_sisnrs, self.two_sisnrs_i = [], []
        self.one_sisnrs, self.one_sisnrs_i = [], []
        self.results_csv = open(save_file, "w") if save_file else None
        self.writer = None
        if self.results_csv is not None:
            self.writer = csv.DictWriter(self.results_csv,
                                         fieldnames=self.COLUMNS)
            self.writer.writeheader()
        self.pit_sisnr = PITLossWrapper(pairwise_neg_sisdr, pit_from="pw_mtx",
                                        threshold_byloss=False)

    def __call__(self, mix, clean, estimate, key):
        mix = np.asarray(mix)
        clean = np.asarray(clean)
        estimate = np.asarray(estimate)

        def pit(e, c):
            return -float(self.pit_sisnr(jnp.asarray(e)[None],
                                         jnp.asarray(c)[None]))

        two_e, one_e = estimate[:2], estimate[2:]
        two_c, one_c = clean[:2], clean[2:]
        mix2 = np.stack([mix] * 2, 0)
        mix1 = mix[None][:one_c.shape[0]]

        two = pit(two_e, two_c)
        two_base = pit(mix2, two_c)
        one = pit(one_e, one_c) if one_c.shape[0] else 0.0
        one_base = pit(mix1, one_c) if one_c.shape[0] else 0.0

        row = {"snt_id": key, "two_si-snr": two,
               "two_si-snr_i": two - two_base, "one_si-snr": one,
               "one_si-snr_i": one - one_base}
        if self.writer:
            self.writer.writerow(row)
        self.two_sisnrs.append(two)
        self.two_sisnrs_i.append(two - two_base)
        self.one_sisnrs.append(one)
        self.one_sisnrs_i.append(one - one_base)
        return row

    def update(self):
        return {"two_si-snr_i": float(np.mean(self.two_sisnrs_i)),
                "one_si-snr_i": float(np.mean(self.one_sisnrs_i))}

    def final(self):
        for name, fn in (("avg", np.mean), ("std", np.std)):
            row = {"snt_id": name,
                   "two_si-snr": fn(self.two_sisnrs),
                   "two_si-snr_i": fn(self.two_sisnrs_i),
                   "one_si-snr": fn(self.one_sisnrs),
                   "one_si-snr_i": fn(self.one_sisnrs_i)}
            if self.writer:
                self.writer.writerow(row)
        if self.results_csv:
            self.results_csv.close()
        return self.update()
