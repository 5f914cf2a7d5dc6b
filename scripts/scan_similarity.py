"""Scan for contiguous runs of identical source lines vs the reference.

Provenance hygiene tool: for every Python file in iqwaveform_tpu/ (and
scripts/, native/), find the longest runs of consecutive lines that also
appear consecutively in any reference source file. Lines are normalized
(whitespace collapsed) before matching; blank lines, comment-only lines,
and trivial lines (`else:`, `return`, closing brackets, decorators) do
not count toward run length but do not break a run.

Usage:
    python scripts/scan_similarity.py [--min-run 5]

Exit status 1 if any run >= --min-run significant lines is found.
"""

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path('/root/reference/src/iqwaveform')

TRIVIAL = re.compile(
    r'^($|#|else:$|try:$|finally:$|pass$|continue$|break$|return$|'
    r'[)\]}>,:]+$|"""|\'\'\'|import |from |@|raise$|\.\.\.$)'
)

# comma-terminated lines are argument lists / table entries / literal
# members: signature parity and standards tables force these to match,
# so they neither count toward nor break a run
WEAK = re.compile(r'.*,$|^def |^class |^\w+=\S+$|^[-+\d.e]+$|^[\'"].*[\'"]$')

# spans whose identity with the reference is forced by external
# standards or shared field contracts, reviewed and accepted:
# (file, first_line, last_line, reason) — line ranges are generous so
# drift in surrounding code doesn't invalidate them
ALLOWLIST = (
    (
        'iqwaveform_tpu/models/ofdm.py',
        280,
        340,
        'SyncParams field names: shared dataclass contract',
    ),
    (
        'iqwaveform_tpu/models/ofdm.py',
        660,
        860,
        '3GPP TS 38.211 / IEEE 802.16 numerology tables (standards data)',
    ),
)


def _allowlisted(src_rel: str, start: int, end: int) -> bool:
    for path, lo, hi, _ in ALLOWLIST:
        if src_rel == path and start >= lo and end <= hi:
            return True
    return False


def normalize(line: str) -> str:
    return re.sub(r'\s+', ' ', line.strip())


def significant(norm: str) -> bool:
    return not TRIVIAL.match(norm) and not WEAK.match(norm)


def load_ref_index(ref_files):
    """Map normalized significant line -> list of (file, line_no)."""
    index = {}
    texts = {}
    for path in ref_files:
        lines = path.read_text(errors='replace').splitlines()
        norms = [normalize(ln) for ln in lines]
        texts[path] = norms
        for i, norm in enumerate(norms):
            if norm and significant(norm):
                index.setdefault(norm, []).append((path, i))
    return index, texts


def longest_runs(src_path, index, texts, min_run):
    """Yield (src_start, src_end, ref_path, ref_start, n_significant)."""
    lines = src_path.read_text(errors='replace').splitlines()
    norms = [normalize(ln) for ln in lines]
    n = len(norms)
    results = []
    i = 0
    while i < n:
        norm = norms[i]
        if not norm or not significant(norm) or norm not in index:
            i += 1
            continue
        best = None
        for ref_path, j in index[norm][:50]:
            ref = texts[ref_path]
            # extend forward, skipping insignificant lines on both sides
            si, rj, sig = i, j, 0
            last_sig_si = i
            while si < n and rj < len(ref):
                a, b = norms[si], ref[rj]
                if not a or not significant(a):
                    si += 1
                    continue
                if not b or not significant(b):
                    rj += 1
                    continue
                if a != b:
                    break
                sig += 1
                last_sig_si = si
                si += 1
                rj += 1
            if best is None or sig > best[0]:
                best = (sig, ref_path, j, last_sig_si)
        sig, ref_path, j, last_si = best
        if sig >= min_run:
            results.append((i + 1, last_si + 1, ref_path, j + 1, sig))
            i = last_si + 1
        else:
            i += 1
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--min-run', type=int, default=5)
    ap.add_argument(
        '--show', action='store_true', help='print the matched significant lines'
    )
    ap.add_argument(
        '--src',
        nargs='*',
        default=None,
        help='specific source files to scan (default: all package sources)',
    )
    args = ap.parse_args()

    ref_files = sorted(REFERENCE.rglob('*.py'))
    index, texts = load_ref_index(ref_files)

    if args.src:
        src_files = [Path(p).resolve() for p in args.src]
    else:
        src_files = sorted((REPO / 'iqwaveform_tpu').rglob('*.py'))
        src_files += sorted((REPO / 'scripts').glob('*.py'))
        src_files += sorted((REPO / 'native').glob('*.py'))
        src_files += sorted((REPO / 'examples').glob('*.py'))
        src_files += sorted(REPO.glob('*.py'))

    found = 0
    for src in src_files:
        if 'test' in src.name:
            continue
        for s0, s1, ref, r0, sig in longest_runs(src, index, texts, args.min_run):
            rel = src.relative_to(REPO)
            if _allowlisted(str(rel), s0, s1):
                continue
            found += 1
            ref_rel = ref.relative_to(REFERENCE.parent.parent)
            print(
                f'{rel}:{s0}-{s1}  ~  {ref_rel}:{r0}  '
                f'({sig} significant identical lines)'
            )
            if args.show:
                src_lines = src.read_text(errors='replace').splitlines()
                for k in range(s0 - 1, s1):
                    norm = normalize(src_lines[k])
                    if norm and significant(norm):
                        print(f'    {k + 1}: {src_lines[k].strip()}')
    if not found:
        print(f'clean: no runs of >= {args.min_run} significant identical lines')
    return 1 if found else 0


if __name__ == '__main__':
    sys.exit(main())
