"""Example: 5G-NR cell search on a synthetic capture.

Embeds a PSS/SSS pair for a chosen cell ID in noise and recovers the cell
identity, timing offset, and correlation quality.

Run: python examples/cell_search.py
"""

import os

import jax

# demo on CPU unless explicitly pointed at TPU hardware
if not os.environ.get('EXAMPLE_ON_TPU'):
    jax.config.update('jax_platforms', 'cpu')

import numpy as np

from iqwaveform_tpu.models import CellSearch, ofdm


def main():
    fs, scs = 7.68e6, 15e3
    search = CellSearch(fs, scs)

    # synthesize: noise + PSS/SSS for cell ID 3*211 + 2 = 635
    n_id2, n_id1 = 2, 211
    n_id = 3 * n_id1 + n_id2
    offset = 31_000

    rng = np.random.default_rng(0)
    n = 120_000
    x = 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))

    pss = np.asarray(ofdm.pss_5g_nr(fs, scs, pad_cp=False))
    sss = np.asarray(ofdm.sss_5g_nr(fs, scs, pad_cp=False))
    x[offset : offset + pss.shape[1]] += 15 * pss[n_id2]
    s0 = offset + search.sss_stride
    x[s0 : s0 + sss.shape[1]] += 15 * sss[n_id]
    x = x.astype('complex64')

    print(f'searching {n / 1e6:.2f} Ms capture at {fs / 1e6:.2f} MS/s ...')
    r = search(x)

    print(f'  true cell: N_id={n_id} (N_id2={n_id2}, N_id1={n_id1}), offset={offset}')
    print(
        f'  found:     N_id={r.n_id} (N_id2={r.n_id2}), offset={r.offset}, '
        f'pss peak={r.peak:.3f}, sss peak={r.sss_peak:.3f}'
    )
    assert r.n_id == n_id and r.offset == offset
    print('cell identity recovered')


if __name__ == '__main__':
    main()
