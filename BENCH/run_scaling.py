#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north rule).

The two-cluster-size criterion (≥0.8 throughput scaling efficiency between N
and 4N executors) cannot use a real cluster in this sandbox; per the driver
instruction it is evidenced by running the identical job at two parallelism
levels — local[8] vs local[32] — on the same input and reporting throughput
at both.

Job: ``crawl_scan`` from bench.py — the full fetch-join + Arrow-UDF
extraction + docs/metrics commit over the synthetic Common-Crawl-style pages
corpus (every url seeded, depth 0), i.e. one full crawl round at maximum
width. Each level runs in a fresh JVM (subprocess) so nothing is shared.

Usage:  python BENCH/run_scaling.py [synth_sf] [repeats]
Writes: BENCH/BASELINE.md + BENCH/scaling.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, synth_sf: float) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SYNTH_SF=str(synth_sf),
               SPARK_GRAFT_BENCH_ONLY="crawl_scan",
               # checkpoint I/O on tmpfs: this measures the engine, not the
               # sandbox's noisy virtio disk (5%+ steal time observed)
               TMPDIR="/dev/shm",
               PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    """N vs 4N parallelism. Default levels local[8] / local[32] (the driver
    instruction's example): this VM presents 32 physical cores, 1 thread per
    core, and a 32-wide pure-Python burn loop shows only ~6% extra per-
    process slowdown vs 8-wide (0.49s -> 0.52s), so the hardware penalty at
    the 4N level is small and reported, not hidden."""
    synth_sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n4 = 4 * n

    results: dict[int, dict] = {}
    # interleave levels so environment noise hits both equally; keep best-of
    for _ in range(repeats):
        for cpus in (n, n4):
            r = run_level(cpus, synth_sf)
            prev = results.get(cpus)
            if prev is None or r["queries"]["crawl_scan"] < prev["queries"]["crawl_scan"]:
                results[cpus] = r

    t8 = results[n]["queries"]["crawl_scan"]
    t32 = results[n4]["queries"]["crawl_scan"]
    urls = results[n]["crawl_scan_urls"]
    thr8 = urls / t8
    thr32 = urls / t32
    eff = thr32 / (4 * thr8)

    payload = {
        "job": "crawl_scan (fetch-join + Arrow extract + commit, full corpus)",
        "synth_sf": synth_sf,
        "pages": urls,
        "level_n": n,
        "level_4n": n4,
        "n_sec": t8,
        "n4_sec": t32,
        "urls_per_sec_n": round(thr8, 1),
        "urls_per_sec_4n": round(thr32, 1),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "repeats_best_of": repeats,
        "date": str(date.today()),
    }
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(payload, f, indent=2)

    md = f"""# BENCH/BASELINE.md — measured engine numbers

## Scaling efficiency (north-rule two-cluster-size criterion)

No real cluster exists in this sandbox; per the driver instruction the N vs
4N-executor criterion is evidenced by the identical job at two parallelism
levels on the same input, fresh JVM each:

| level | wall (s) | frontier URLs/s |
|---|---|---|
| local[{n}]  | {t8:.1f} | {thr8:,.0f} |
| local[{n4}] | {t32:.1f} | {thr32:,.0f} |

**Scaling efficiency = throughput@local[{n4}] / (4 x throughput@local[{n}]) =
{eff:.3f}** (target >= 0.8). Levels local[{n}]/local[{n4}] both sit within
the VM's 32 physical cores (1 thread/core); a 32-wide pure-Python burn loop
shows ~6% extra per-process slowdown vs 8-wide (0.49s -> 0.52s single-core
0.39s), so the reported efficiency slightly UNDERSTATES the engine (the
hardware itself costs a few points at the 4N level). Interleaved
best-of-{repeats} runs, fresh JVM per run, checkpoint I/O on tmpfs (the
sandbox disk shows 5%+ steal-time noise).

Job: one full-width crawl round over the synthetic Common-Crawl-style corpus
(sf={synth_sf}, {urls:,} pages, hot-host skew 40%): frontier -> bucket-pruned
pages lookup join -> Arrow-vectorized extract (clean_to_mdx + extract_links)
-> docs/metrics parquet commit. Timing excludes SparkSession startup and the
one-time codegen/Arrow warmup (bench.py warms those paths first); at the
100 TB design point those per-session costs amortize to zero.

Storage backend: parquet dirs hash-bucketed by pmod(xxhash64(url), B) with a
JSON round manifest — the Iceberg bucket(B, url) layout emulated, since no
Iceberg runtime jar ships with this sandbox's PySpark (SURVEY.md 7.0).

Generated by BENCH/run_scaling.py on {date.today()}; raw numbers in
BENCH/scaling.json. Reference-side numbers: the reference publishes no
benchmarks (BASELINE.md), only configuration constants.
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    # preserve any manually-maintained sections after the scaling block
    extra = ""
    if os.path.exists(out_path):
        old = open(out_path).read()
        marker = "\n## Headline bench"
        if marker in old:
            extra = marker + old.split(marker, 1)[1]
    with open(out_path, "w") as f:
        f.write(md + extra)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
