"""Standalone SI-SNR-improvement utility (reference: losses/sisnri.py —
whose ctor references an undefined ``Loss``; rebuilt as working
functions with the same math)."""

from __future__ import annotations

from itertools import permutations

import jax.numpy as jnp


def sisnr_improvement(mix, est, ref, eps: float = 1e-8):
    """Per-utterance SI-SNR(est) - SI-SNR(mix) vs ref; all (B, L) ->
    (B, 1) like the reference (sisnri.py:8-24)."""
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    mix = mix - jnp.mean(mix, axis=-1, keepdims=True)
    ref_energy = jnp.sum(ref * ref, axis=-1, keepdims=True)
    est_p = jnp.sum(est * ref, axis=-1, keepdims=True) * ref / ref_energy
    est_v = est - est_p
    mix_p = jnp.sum(mix * ref, axis=-1, keepdims=True) * ref / ref_energy
    mix_v = mix - mix_p

    def snr(p, v):
        return 10 * jnp.log10(
            (jnp.sum(p * p, axis=-1, keepdims=True) + eps)
            / (jnp.sum(v * v, axis=-1, keepdims=True) + eps))

    return snr(est_p, est_v) - snr(mix_p, mix_v)


class SISNRi:
    """PIT-max SI-SNRi loss (sisnri.py:26-41): returns the negated mean of
    the best-permutation improvement."""

    def sisnr(self, mix, est, ref, eps=1e-8):
        return sisnr_improvement(mix, est, ref, eps)

    def compute_loss(self, mix, ests, refs):
        num_spks = len(ests)
        rows = []
        for perm in permutations(range(num_spks)):
            vals = jnp.stack([self.sisnr(mix, ests[s], refs[t])
                              for s, t in enumerate(perm)])
            rows.append(jnp.mean(vals, axis=0, keepdims=True))
        sisnr_mat = jnp.stack(rows)
        max_pmt = jnp.max(sisnr_mat, axis=0)
        return -jnp.mean(max_pmt)

    __call__ = compute_loss
