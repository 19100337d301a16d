"""Extended differential parity sweep against the reference library.

Reuses the SAME grammar-driven corpus generator and comparison
helpers as ``tests/test_differential.py`` (which run 250 docs x 9
configs in CI) but at sweep scale: N docs per seed x multiple seeds x
the 9 config variants, every row compared field-for-field
(trs, desc, lots, qqs, lot_acres) between our kernels and the actual
reference library (importable read-only from /root/reference).

    python scripts/differential_sweep.py [n_docs_per_seed] [seeds...]

Prints one summary line per (seed, config) and a final verdict.
Pure-Python (no Spark session): the kernels under test are the same
ones the Arrow UDFs map.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))
sys.path.insert(0, '/root/reference')

import test_differential as TD  # noqa: E402  (tests dir on path)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seeds = [int(x) for x in sys.argv[2:]] or [42, 7, 1234]
    configs = [{}, {'clean_qq': True}, {'qq_depth': 2},
               {'break_halves': True}, {'segment': True},
               {'sec_within': True}, {'require_colon': True},
               {'suppress_lot_divs': True},
               {'ocr_scrub': True, 'clean_qq': True},
               # round-5 additions: the two interactions the r4
               # sweep left uncovered (exact qq_depth forcing
               # subdivision THROUGH halves, and segmentation with
               # the cautious colon second-pass)
               {'qq_depth': 2, 'break_halves': True},
               {'segment': True,
                'require_colon': 'sec_colon_cautious'}]
    total = mismatches = ref_crashes = 0
    t0 = time.time()
    for seed in seeds:
        corpus = TD._random_corpus(n=n, seed=seed)
        for kw in configs:
            bad = crashed = 0
            for doc in corpus:
                try:
                    ref_rows, _ = TD._reference(doc, kw)
                except Exception:  # noqa: BLE001 -- reference's own bug
                    crashed += 1
                    continue
                ours_rows, _ = TD._ours(doc, kw)
                if ours_rows != ref_rows:
                    bad += 1
            total += len(corpus)
            mismatches += bad
            ref_crashes += crashed
            print(f'seed={seed} cfg={TD._cfg_string(kw):40s} '
                  f'docs={len(corpus)} ref_crashes={crashed} '
                  f'mismatches={bad}', flush=True)
    wall = time.time() - t0
    print(f'\nTOTAL: {total} (doc, config) pairs, '
          f'{ref_crashes} reference crashes (excluded, reference bug), '
          f'{mismatches} row mismatches, {wall:.0f}s')
    sys.exit(1 if mismatches else 0)


if __name__ == '__main__':
    main()
