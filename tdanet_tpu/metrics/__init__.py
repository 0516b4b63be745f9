"""Eval metrics: PIT SI-SNR(i), BSS-eval SDR(i), CSV trackers."""

from tdanet_tpu.metrics.bss_eval import sdr_matrix, sdr_pit
from tdanet_tpu.metrics.wrapper import MetricsTracker, SPlitMetricsTracker

__all__ = ["sdr_matrix", "sdr_pit", "MetricsTracker", "SPlitMetricsTracker"]
