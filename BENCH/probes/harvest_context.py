"""Clean-window refresh of the CONTEXT scaling cells (local[8/16/32]).

BENCH/NOTES_r5.md round-5 close names the local[16] cell as leaning on
a DRAM-ceiling argument: the campaign's context-level bests
(462.6 / 351.5 / 326.6 s) were all sampled in degraded host windows —
the ROUND-4 tree's clean-window bests at the same corpus were
449.8 / 209.3 / 378.8 s (harvest_clean.py comment), so the standing
r5 table under-states the binary-packed tree's context cells.

This tool samples ONLY the context levels (cheapest first, so a window
flip costs the least), merges every sample — fast or slow — into the
campaign blob, and regenerates BENCH/BASELINE.md via
scale_bench.finish (which re-asserts pairs/clusters identity across
all runs and levels). The primary pair is untouched: the gate number
(eff 1→4) does not move unless a local[4] sample is added elsewhere.

Usage: python BENCH/probes/harvest_context.py [reps] [levels...]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import extend_primary  # noqa: E402
import scale_bench  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    levels = ([int(x) for x in sys.argv[2:]] if len(sys.argv) > 2
              else [16, 32, 8])
    corpus = scale_bench.ensure_corpus(3_600_000)
    results = extend_primary.load_blob()
    for rep in range(reps):
        for c in levels:
            got = scale_bench.run_level(c, corpus, f"ctx{rep}")
            extend_primary.merge(results, got)
            best = results[c]["sec"]
            print(f"rep{rep} local[{c}]: {got['sec']}s (best {best}s)",
                  flush=True)
    eff = extend_primary.eff_primary(results)
    print(f"eff(1->4) unchanged check: {eff:.3f}", flush=True)
    scale_bench.finish(results, 3_600_000,
                       scale_bench.protocol_desc(results))


if __name__ == "__main__":
    main()
