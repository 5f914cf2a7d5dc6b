"""Regenerate docs/API.md: the public-name index by module.

Run: python scripts/gen_api_index.py   (CPU; writes docs/API.md)
"""

import importlib
import os
import sys

HEADER = """# API index

Public names by module (generated from `__all__` / public attributes;
each docstring cites the reference `file:line` it provides parity for).
Facade modules (`fourier`, `power_analysis`, `ofdm`, `util`, `windows`,
`io`, `figures`, `env`) mirror the reference import surface, so
`import iqwaveform_tpu as iqwaveform` is a drop-in for most code.
Regenerate with `python scripts/gen_api_index.py`.
"""

MODULES = [
    'iqwaveform_tpu',
    'iqwaveform_tpu.fourier',
    'iqwaveform_tpu.power_analysis',
    'iqwaveform_tpu.ofdm',
    'iqwaveform_tpu.util',
    'iqwaveform_tpu.windows',
    'iqwaveform_tpu.io',
    'iqwaveform_tpu.figures',
    'iqwaveform_tpu.env',
    'iqwaveform_tpu.ops',
    'iqwaveform_tpu.ops.mxu_fft',
    'iqwaveform_tpu.parallel',
    'iqwaveform_tpu.models',
    'iqwaveform_tpu.models.monitor',
    'iqwaveform_tpu.utils',
]


def public_names(mod):
    import inspect

    names = getattr(mod, '__all__', None)
    if names is None:
        names = [
            n
            for n in dir(mod)
            if not n.startswith('_')
            and n != 'annotations'
            and not inspect.ismodule(getattr(mod, n))
        ]
    else:
        names = [n for n in names if not inspect.ismodule(getattr(mod, n))]
    return sorted(set(names))


def main():
    import jax

    jax.config.update('jax_platforms', 'cpu')

    sections = [HEADER]
    for name in MODULES:
        mod = importlib.import_module(name)
        doc = (mod.__doc__ or '').strip().splitlines()
        first = doc[0] if doc else ''
        names = ', '.join(f'`{n}`' for n in public_names(mod))
        sections.append(f'## `{name}`\n\n{first}\n\n{names}\n')

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'docs',
        'API.md',
    )
    with open(out, 'w') as f:
        f.write('\n'.join(sections))
    print(f'wrote {out} ({len(MODULES)} modules)')


if __name__ == '__main__':
    sys.exit(main())
