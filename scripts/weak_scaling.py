"""Weak-scaling check of the sharded monitor on a virtual CPU mesh.

Runs the full sharded step at 1/2/4/8 devices with FIXED PER-DEVICE work
(weak scaling): per-device time should stay ~flat if the collectives are
O(noverlap + bins) as designed (no capture-sized all-gather). Virtual CPU
devices share one host's memory bandwidth, so this bounds collective
*overhead structure*, not real ICI bandwidth — see
tests/test_parallel.py::test_sharded_monitor_collective_budget for the
matching HLO-level assertion.

Usage: python scripts/weak_scaling.py   (re-execs itself per device count)
"""

import json
import os
import subprocess
import sys
import time

DEVICE_COUNTS = (1, 2, 4, 8)


def run_one(n_dev: int) -> dict:
    import numpy as np

    import jax

    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor
    from iqwaveform_tpu.parallel.mesh import TIME_AXIS

    design = design_wideband_monitor(
        61.44e6, 30.72e6, bw=20e6, channel_count=8,
        fft_size_per_channel=128, window='hamming', apd_bins=512,
    )
    mesh = jax.make_mesh(
        (n_dev,), (TIME_AXIS,), axis_types=(jax.sharding.AxisType.Auto,)
    )
    mon = WidebandMonitor(design, mesh=mesh)

    # weak scaling: per-device work fixed at 8 per-shard quanta, so the
    # total grows with the device count
    quantum = mon.min_input_multiple(n_dev)
    n = 8 * quantum

    rng = np.random.default_rng(0)
    iq = (rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n))).astype(
        'complex64'
    )
    iq = jax.device_put(
        jnp.asarray(iq), NamedSharding(mesh, P(None, TIME_AXIS))
    )

    step = jax.jit(mon.sharded_step)
    out = step(iq)
    jax.block_until_ready(out)  # compile + warm

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(iq)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    return {
        'devices': n_dev,
        'samples': n,
        'samples_per_device': n // n_dev,
        'step_ms': round(dt * 1e3, 2),
        'ms_per_Msample_per_device': round(dt * 1e3 / (n / n_dev / 1e6), 2),
    }


def main():
    if len(sys.argv) > 1:
        print(json.dumps(run_one(int(sys.argv[1]))))
        return

    rows = []
    for n_dev in DEVICE_COUNTS:
        env = dict(os.environ)
        env['XLA_FLAGS'] = (
            ' '.join(
                f for f in env.get('XLA_FLAGS', '').split()
                if 'host_platform_device_count' not in f
            )
            + f' --xla_force_host_platform_device_count={n_dev}'
        ).strip()
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n_dev)],
            env=env, capture_output=True, text=True, timeout=600,
        )
        if res.returncode != 0:
            print(f'devices={n_dev} FAILED:', res.stderr[-500:], file=sys.stderr)
            continue
        row = json.loads(res.stdout.strip().splitlines()[-1])
        rows.append(row)
        print(row, flush=True)

    if rows:
        base = rows[0]['ms_per_Msample_per_device']
        print('\nweak scaling (per-device time, 1-device = 1.0):')
        for r in rows:
            rel = r['ms_per_Msample_per_device'] / base
            print(
                f"  {r['devices']} devices: {r['step_ms']:8.2f} ms/step, "
                f"{r['ms_per_Msample_per_device']:6.2f} ms/MS/dev "
                f"({rel:.2f}x)"
            )


if __name__ == '__main__':
    main()
