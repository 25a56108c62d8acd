#!/usr/bin/env python
"""Single-core extraction-kernel cost: ms/page for the full Arrow-UDF body
(decode + shared-parse extract_page_fields -> MDX + links) over the
synthetic Common-Crawl-style corpus, no Spark involved.

This is the number that caps single-host scaling (VERDICT r3 #1): at
local[32] the crawl_scan wall is ~n_pages * ms_per_page / eff_parallelism,
so every 10%% shaved here moves the oversubscribed local[8]->local[32]
scaling pair directly.

Usage: python scripts/kernel_profile.py [synth_sf] [n_pages] [--profile]
With --profile, prints the top cumulative-time slices from cProfile.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import duckdb

    from supercrawler_spark import refspec
    from supercrawler_spark.sources import synth

    synth_sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    corpus_dir = synth.ensure_corpus(synth_sf)
    rows = duckdb.sql(
        f"SELECT url, html FROM '{corpus_dir}/pages/*/*.parquet' "
        f"ORDER BY hash(url) LIMIT {n}").fetchall()
    pages = [(u, bytes(h).decode("utf-8", errors="replace"))
             for u, h in rows]
    total_bytes = sum(len(h.encode()) for _, h in pages)

    def run_once():
        for u, h in pages:
            refspec.extract_page_fields(h, u, variant="supercrawler")

    run_once()  # warm (regex compile, memo tables)
    t0 = time.monotonic()
    run_once()
    dt = time.monotonic() - t0
    print(f"pages={len(pages)} bytes={total_bytes} wall={dt:.3f}s "
          f"ms_per_page={1000 * dt / len(pages):.3f} "
          f"mb_per_s={total_bytes / dt / 2**20:.1f}")

    if "--profile" in sys.argv:
        import cProfile
        import pstats
        pr = cProfile.Profile()
        pr.enable()
        run_once()
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
