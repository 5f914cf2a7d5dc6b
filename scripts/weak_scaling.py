"""Weak-scaling check of the sharded monitor on a virtual CPU mesh.

Runs the full sharded step at 1..64 devices, on 1-D time meshes and
asymmetric 2-D receiver-batch x time meshes (batch-major included), with
FIXED PER-DEVICE work (weak scaling): per-device time should stay ~flat
if the collectives are O(noverlap + bins) as designed (no capture-sized
all-gather). Each run also counts the collectives in the compiled HLO
and asserts the budget is INVARIANT in device count and mesh shape
(VERDICT r3 #7) — the same bound
tests/test_parallel.py::test_sharded_monitor_collective_budget pins on
the 8-device CI mesh. Virtual CPU devices share one host's memory
bandwidth, so this bounds collective *overhead structure*, not real ICI
bandwidth.

Usage: python scripts/weak_scaling.py   (re-execs itself per mesh)
"""

import json
import os
import subprocess
import sys
import time

# 1-D time meshes plus asymmetric 2-D batch x time meshes (batch-major
# and time-major); a v5e pod slice is bigger than 8, so stretch to 64
MESHES = ('1', '2', '4', '8', '16', '32', '64', '2x16', '4x8', '8x4')

BUDGET = {
    'all-gather': 0,
    'all-to-all': 0,
    'collective-permute': 2,  # halo in + OLA tail out
    'all-reduce': 4,  # psum/pmean/pmax statistic merges
}


def _parse_mesh(spec: str):
    if 'x' in spec:
        b, t = spec.split('x')
        return int(b), int(t)
    return 1, int(spec)


def run_one(spec: str) -> dict:
    import re

    import numpy as np

    import jax

    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor
    from iqwaveform_tpu.models.monitor import BATCH_AXIS
    from iqwaveform_tpu.parallel.mesh import TIME_AXIS

    n_batch, n_time = _parse_mesh(spec)

    design = design_wideband_monitor(
        61.44e6, 30.72e6, bw=20e6, channel_count=8,
        fft_size_per_channel=128, window='hamming', apd_bins=512,
    )
    if n_batch > 1:
        mesh_shape, axis_names = (n_batch, n_time), (BATCH_AXIS, TIME_AXIS)
    else:
        mesh_shape, axis_names = (n_time,), (TIME_AXIS,)
    mesh = jax.make_mesh(
        mesh_shape,
        axis_names,
        axis_types=tuple(jax.sharding.AxisType.Auto for _ in axis_names),
    )
    mon = WidebandMonitor(design, mesh=mesh)

    # weak scaling: per-device work fixed at 8 per-time-shard quanta and
    # one batch row per batch shard, so the total grows with the mesh
    quantum = mon.min_input_multiple(n_time)
    n = 8 * quantum
    b = n_batch

    rng = np.random.default_rng(0)
    iq = (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))).astype(
        'complex64'
    )
    iq = jax.device_put(
        jnp.asarray(iq),
        NamedSharding(
            mesh, P(BATCH_AXIS if n_batch > 1 else None, TIME_AXIS)
        ),
    )

    step = jax.jit(mon.sharded_step)
    compiled = step.lower(iq).compile()
    hlo = compiled.as_text()
    counts = {
        op: len(re.findall(rf'{op}\(|{op}-start', hlo)) for op in BUDGET
    }
    for op, lim in BUDGET.items():
        assert counts[op] <= lim, (
            f'mesh {spec}: {op} count {counts[op]} exceeds the '
            f'shape-invariant budget {lim}'
        )

    out = step(iq)
    jax.block_until_ready(out)  # warm

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(iq)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    n_dev = n_batch * n_time
    return {
        'mesh': spec,
        'devices': n_dev,
        'samples': b * n,
        'samples_per_device': b * n // n_dev,
        'step_ms': round(dt * 1e3, 2),
        # virtual devices all run on ONE host core, so total host work
        # is serialized: the flat-under-weak-scaling signal is cost per
        # TOTAL sample (per-device wall time trivially grows with the
        # device count on this host and means nothing)
        'ms_per_Msample_total': round(dt * 1e3 / (b * n / 1e6), 2),
        'collectives': counts,
    }


def _run_spec_subprocess(spec: str):
    n_dev = (lambda b_t: b_t[0] * b_t[1])(_parse_mesh(spec))
    env = dict(os.environ)
    env['XLA_FLAGS'] = (
        ' '.join(
            f for f in env.get('XLA_FLAGS', '').split()
            if 'host_platform_device_count' not in f
        )
        + f' --xla_force_host_platform_device_count={n_dev}'
    ).strip()
    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__), spec],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    if res.returncode != 0:
        print(f'mesh={spec} FAILED:', res.stderr[-500:], file=sys.stderr)
        return None
    return json.loads(res.stdout.strip().splitlines()[-1])


def main():
    # trials mode (VERDICT r4 #8): re-run one mesh shape N times in
    # fresh subprocesses and report median + spread, to confirm or
    # retract single-run outliers (host scheduling on the shared core):
    #   python scripts/weak_scaling.py --trials 3 4x8 8x4
    if len(sys.argv) > 2 and sys.argv[1] == '--trials':
        n_trials = int(sys.argv[2])
        for spec in sys.argv[3:] or ('4x8',):
            vals = []
            for t in range(n_trials):
                row = _run_spec_subprocess(spec)
                if row is not None:
                    vals.append(row['ms_per_Msample_total'])
                    print(f'{spec} trial {t + 1}: {row}', flush=True)
            if vals:
                vals.sort()
                import numpy as _np

                med = float(_np.median(vals))
                print(
                    json.dumps(
                        {
                            'mesh': spec,
                            'n_trials': len(vals),
                            'ms_per_Msample_total_median': round(med, 1),
                            'spread_pct': round(
                                100 * (vals[-1] - vals[0]) / med, 1
                            ),
                            'trials': vals,
                        }
                    ),
                    flush=True,
                )
        return

    if len(sys.argv) > 1:
        print(json.dumps(run_one(sys.argv[1])))
        return

    rows = []
    for spec in MESHES:
        row = _run_spec_subprocess(spec)
        if row is None:
            continue
        rows.append(row)
        print(row, flush=True)

    if rows:
        base = rows[0]['ms_per_Msample_total']
        print('\nweak scaling (host cost per total Msample, 1-device = 1.0):')
        for r in rows:
            rel = r['ms_per_Msample_total'] / base
            c = r['collectives']
            print(
                f"  {r['mesh']:>5} ({r['devices']:2d} dev): "
                f"{r['step_ms']:8.2f} ms/step, "
                f"{r['ms_per_Msample_total']:7.2f} ms/MS total "
                f"({rel:.2f}x)  permutes={c['collective-permute']} "
                f"reduces={c['all-reduce']}"
            )


if __name__ == '__main__':
    main()
