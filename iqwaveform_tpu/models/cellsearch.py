"""5G-NR cell search: PSS/SSS matched filtering on device.

Builds on the sync-sequence generators (models.ofdm.pss_5g_nr /
sss_5g_nr, reference ofdm.py:123-448). The reference generates the
sequences but ships no searcher ("The sequence can be convolved with an
IQ waveform ... to compute a synchronization correlation sequence",
ofdm.py:275-277); this model is that correlator as a jit-compiled
batched-FFT matched filter:

1. PSS stage: correlate the capture against all 3 N_id2 sequences at once
   (one batched FFT product), normalize by local input power, pick the
   strongest (N_id2, sample offset).
2. SSS stage (optional): correlate the symbol two slots later against the
   336 SSS candidates consistent with N_id2 to recover the full cell ID
   N_id = 3*N_id1 + N_id2.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import ofdm

__all__ = ['CellSearch', 'CellSearchResult']


@dataclasses.dataclass
class CellSearchResult:
    n_id2: int
    offset: int  # sample index of the PSS sequence start
    peak: float  # normalized correlation magnitude at the peak
    n_id: int | None = None  # full cell ID when SSS search ran
    sss_peak: float | None = None


class CellSearch:
    """matched-filter 5G-NR cell searcher.

    Usage:
        search = CellSearch(sample_rate=7.68e6, subcarrier_spacing=15e3)
        result = search(iq)                  # numpy or jax input

    The correlators are jit-compiled; sequences are host-side constants.
    """

    def __init__(
        self,
        sample_rate: float,
        subcarrier_spacing: float = 15e3,
        center_frequency: float = 0.0,
    ):
        self.sample_rate = sample_rate
        self.subcarrier_spacing = subcarrier_spacing

        # matched-filter templates, host numpy (trace constants)
        self._pss = np.asarray(
            ofdm.pss_5g_nr(
                sample_rate,
                subcarrier_spacing,
                center_frequency=center_frequency,
                pad_cp=False,
            )
        )
        self._sss = np.asarray(
            ofdm.sss_5g_nr(
                sample_rate,
                subcarrier_spacing,
                center_frequency=center_frequency,
                pad_cp=False,
            )
        )
        self.nfft = round(sample_rate / subcarrier_spacing)
        # symbol stride between PSS and SSS: PSS occupies symbol k, SSS
        # symbol k+2 (reference ofdm.py:429-438); at 15/30 kHz SCS each
        # intervening symbol spans nfft + cp samples
        cp = round(9 * sample_rate / subcarrier_spacing / 128)
        self.sss_stride = 2 * (self.nfft + cp)

        self._pss_corr = jax.jit(self._pss_correlate)
        # axon-safe orchestration cores: both return 2-D/1-D float32
        # (the tunneled attachment cannot read back scalars or integer
        # arrays; the argmax/indexing runs on host over these)
        self._pss_score = jax.jit(
            lambda v: self._normalized_corr(v, self._pss)
        )
        self._sss_scores_at = jax.jit(self._sss_correlate_at)

    # --- correlator cores (traceable) ---

    def _normalized_corr(self, x, templates):
        """|matched filter| / sqrt(local energy), shape (n_templates, L)."""
        n = x.shape[0]
        m = templates.shape[1]
        nfft = 1 << int(np.ceil(np.log2(n + m - 1)))

        X = jnp.fft.fft(x, n=nfft)
        T = jnp.fft.fft(jnp.asarray(templates), n=nfft, axis=1)
        corr = jnp.fft.ifft(X[None, :] * jnp.conj(T), axis=1)[:, : n - m + 1]

        # local input energy over each m-sample window (moving sum)
        p = jnp.abs(x) ** 2
        cs = jnp.cumsum(jnp.concatenate([jnp.zeros(1, p.dtype), p]))
        energy = cs[m:] - cs[: n - m + 1]
        t_energy = (jnp.abs(jnp.asarray(templates)) ** 2).sum(axis=1)

        denom = jnp.sqrt(jnp.maximum(energy[None, :] * t_energy[:, None], 1e-20))
        return jnp.abs(corr) / denom

    def _pss_correlate(self, x):
        score = self._normalized_corr(x, self._pss)  # (3, L)
        flat = jnp.argmax(score)
        n_id2 = flat // score.shape[1]
        offset = flat % score.shape[1]
        return score, n_id2, offset

    def _sss_correlate_at(self, x, start):
        """normalized correlation of the SSS symbol at traced sample
        offset ``start`` against ALL 1008 SSS candidates -> (1008,).
        Correlating the full set keeps the program static in n_id2 (one
        trace); the host selects the 336 candidates consistent with the
        PSS decision afterwards."""
        m = self._sss.shape[1]
        segment = jax.lax.dynamic_slice(x, (start,), (m,))
        return self._normalized_corr(
            jnp.concatenate([segment, jnp.zeros(1, segment.dtype)]), self._sss
        )[:, 0]

    # --- host orchestration ---

    def __call__(self, iq, search_sss: bool = True) -> CellSearchResult:
        """run the search. Device work runs as two jit programs whose
        outputs read back as float32 arrays; peak selection runs on the
        host (scalar/integer readbacks hang tunneled TPU attachments, so
        the orchestration never performs one)."""
        iq = jnp.asarray(iq, dtype='complex64')
        score = np.asarray(self._pss_score(iq))  # (3, L) float32
        flat = int(score.argmax())
        n_id2, offset = divmod(flat, score.shape[1])
        peak = float(score[n_id2, offset])

        result = CellSearchResult(n_id2=n_id2, offset=offset, peak=peak)

        if not search_sss:
            return result

        sss_start = offset + self.sss_stride
        m = self._sss.shape[1]
        if sss_start + m > iq.shape[0]:
            return result  # capture too short for the SSS symbol

        all_scores = np.asarray(
            self._sss_scores_at(iq, np.int32(sss_start))
        )
        # candidates consistent with n_id2: N_id = 3*N_id1 + n_id2
        cand_ids = np.arange(336) * 3 + n_id2
        sss_score = all_scores[cand_ids]
        best = int(np.argmax(sss_score))
        result.n_id = int(cand_ids[best])
        result.sss_peak = float(sss_score[best])
        return result
