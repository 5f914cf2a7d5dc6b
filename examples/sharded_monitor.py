"""Example: multi-chip wideband monitoring on a device mesh.

Runs the WidebandMonitor over a 2-D (receiver-batch x time) mesh with
halo-exchange sharding. On a CPU host this demonstrates against a virtual
8-device mesh; on a TPU pod slice the same code shards over ICI.

Run: python examples/sharded_monitor.py
"""

import os

if 'xla_force_host_platform_device_count' not in os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax

# demo on the virtual CPU mesh unless explicitly pointed at TPU hardware
# (calling jax.default_backend() here would initialize the backend too
# early to override)
if not os.environ.get('EXAMPLE_ON_TPU'):
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor
from iqwaveform_tpu.models.monitor import BATCH_AXIS
from iqwaveform_tpu.parallel.mesh import TIME_AXIS


def main():
    n_dev = len(jax.devices())
    if n_dev % 2 == 0 and n_dev > 2:
        mesh_shape, axis_names = (2, n_dev // 2), (BATCH_AXIS, TIME_AXIS)
    else:
        mesh_shape, axis_names = (n_dev,), (TIME_AXIS,)
    mesh = jax.make_mesh(
        mesh_shape,
        axis_names,
        axis_types=tuple(jax.sharding.AxisType.Auto for _ in axis_names),
    )
    print(f'mesh: {dict(mesh.shape)}')

    design = design_wideband_monitor(
        61.44e6,
        30.72e6,
        bw=20e6,
        fs_sdr=61.44e6,
        channel_count=8,
        fft_size_per_channel=128,
        window='hamming',
        apd_bins=512,
        fft_backend='mxu',
    )
    mon = WidebandMonitor(design, mesh=mesh)

    n_time = mesh.shape[TIME_AXIS]
    n_rx = 2 * mesh.shape.get(BATCH_AXIS, 1)
    n = mon.min_input_multiple(n_time) * 4

    print(f'synthesizing {n_rx} x {n / 1e6:.2f} Ms capture ...')
    rng = np.random.default_rng(0)
    iq = (
        rng.standard_normal((n_rx, n)) + 1j * rng.standard_normal((n_rx, n))
    ).astype('complex64')

    spec = P(BATCH_AXIS if BATCH_AXIS in mesh.shape else None, TIME_AXIS)
    iq_sharded = jax.device_put(jnp.asarray(iq), NamedSharding(mesh, spec))

    step = jax.jit(mon.sharded_step)
    out = step(iq_sharded)

    psd = np.asarray(out['psd_mean'])
    ch = np.asarray(out['channel_power_mean'])
    print('psd_mean shape:', psd.shape, 'finite:', np.isfinite(psd).all())
    print('per-receiver channel power (dB):')
    for r in range(n_rx):
        row = 10 * np.log10(ch[r] + 1e-25)
        print(f'  rx{r}:', np.array2string(row, precision=1))
    print('apd totals:', np.asarray(out['apd_counts']).sum(axis=-1))


if __name__ == '__main__':
    main()
