"""CrawlStore — per-round atomic checkpoint lineage (north-rule L6 extension).

The reference keeps frontier + visited set in memory and loses both on crash
(SURVEY.md §2.8 L6). At 10^10-URL scale the engine instead commits each round
atomically: round artifacts (extracted pages, docs, next frontier, seen
delta, metrics) are written as parquet, then a manifest entry is committed
via write-temp + rename. Resume = read the last committed manifest entry and
continue from its frontier; partially-written rounds are ignored (their
directories are simply orphaned, never referenced).

With an Iceberg runtime this maps 1:1 onto table snapshots + a bucket(B, url)
partition transform; no Iceberg jar ships with this sandbox's PySpark, so the
parquet+manifest backend below provides the same semantics (SURVEY.md §7.0).
tests/test_iceberg_backend.py pins the real-backend contract (round commit ==
snapshot, resume == VERSION AS OF, aborted writes invisible) and auto-skips
unless an iceberg-spark-runtime jar is present (SPARK_GRAFT_ICEBERG_JAR).
The ``seen`` set is stored as per-round deltas, each repartitioned by
``pmod(xxhash64(url), B)`` so the anti-join reads co-bucketed data; deltas
are compacted every ``compact_every`` rounds to bound read amplification.
"""

from __future__ import annotations

import json
import os
import time


class CrawlStore:
    MANIFEST = "manifest.json"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ---------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, self.MANIFEST)

    def read_manifest(self) -> dict:
        path = self._manifest_path()
        if not os.path.exists(path):
            return {"rounds": [], "config": None, "init": None, "done": False}
        with open(path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self._manifest_path())  # atomic commit

    def init_config(self, config_dict: dict) -> None:
        manifest = self.read_manifest()
        if manifest["config"] is None:
            manifest["config"] = config_dict
            self._write_manifest(manifest)
        elif manifest["config"] != config_dict:
            raise ValueError(
                f"checkpoint at {self.root} was created with a different "
                f"config: {manifest['config']} != {config_dict}")

    def last_committed_round(self) -> int:
        rounds = self.read_manifest()["rounds"]
        return rounds[-1]["round"] if rounds else -1

    def commit_init(self, counts: dict, paths: dict,
                    timings: dict | None = None) -> None:
        """Commit the seed-enqueue step (frontier_0 + seed seen delta)."""
        manifest = self.read_manifest()
        manifest["init"] = {"committed_at": time.time(),
                            "counts": counts, "paths": paths}
        if timings:
            manifest["init"]["timings"] = timings
        self._write_manifest(manifest)

    def commit_round(self, round_no: int, counts: dict, paths: dict,
                     timings: dict | None = None) -> None:
        manifest = self.read_manifest()
        assert all(r["round"] < round_no for r in manifest["rounds"])
        entry = {
            "round": round_no,
            "committed_at": time.time(),
            "counts": counts,
            "paths": paths,
        }
        if timings:
            entry["timings"] = timings
        manifest["rounds"].append(entry)
        self._write_manifest(manifest)

    def mark_done(self) -> None:
        manifest = self.read_manifest()
        manifest["done"] = True
        self._write_manifest(manifest)

    # -- paths --------------------------------------------------------------

    def round_dir(self, round_no: int, name: str) -> str:
        return os.path.join(self.root, f"round={round_no:04d}", name)

    def frontier_path(self, round_no: int) -> str:
        return self.round_dir(round_no, "frontier")

    def docs_path(self, round_no: int) -> str:
        return self.round_dir(round_no, "docs")

    def seen_delta_path(self, round_no: int) -> str:
        return self.round_dir(round_no, "seen_delta")

    def seen_compact_path(self, round_no: int) -> str:
        return self.round_dir(round_no, "seen_compact")

    def metrics_path(self, round_no: int) -> str:
        return self.round_dir(round_no, "metrics")

    def bloom_words_path(self, round_no: int) -> str:
        return self.round_dir(round_no, "bloom_words")

    def init_bloom_path(self) -> str:
        return os.path.join(self.root, "init", "bloom_words")

    def init_frontier_path(self) -> str:
        return os.path.join(self.root, "init", "frontier")

    def init_seen_path(self) -> str:
        return os.path.join(self.root, "init", "seen_delta")

    def seed_preview_path(self) -> str:
        return os.path.join(self.root, "init", "seed_preview")

    def docs_compact_path(self) -> str:
        return os.path.join(self.root, "docs_compact")

    def compact_docs(self, spark, num_buckets: int = 32) -> str:
        """Compact the per-round docs directories into ONE parquet layout
        hash-partitioned by pmod(xxhash64(url), B) — the long-crawl analog of
        the seen compaction: a depth-5 crawl leaves 6+ docs dirs whose
        per-round files are small; downstream consumers (dedup, quality,
        export) want one bucketed table with predicate-pushdown-friendly
        layout. Committed via manifest pointer; the per-round dirs stay (they
        belong to round lineage and resume)."""
        from pyspark.sql import functions as F
        manifest = self.read_manifest()
        paths = [e["paths"]["docs"] for e in manifest["rounds"]
                 if "docs" in e["paths"]]
        if not paths:
            raise ValueError("no committed docs rounds to compact")
        docs = spark.read.parquet(*paths)
        out = self.docs_compact_path()
        (docs.withColumn("bucket",
                         F.pmod(F.xxhash64("url"), F.lit(num_buckets))
                         .cast("int"))
             .repartition("bucket")
             .write.mode("overwrite").partitionBy("bucket").parquet(out))
        manifest["docs_compact"] = out
        self._write_manifest(manifest)
        return out

    def seen_paths_up_to(self, round_no: int) -> list[str]:
        """Paths whose union is the seen set after processing round
        ``round_no`` (-1 ≙ just the seed delta): the latest compaction plus
        subsequent deltas."""
        manifest = self.read_manifest()
        paths: list[str] = []
        if manifest.get("init") and "seen_delta" in manifest["init"]["paths"]:
            paths.append(manifest["init"]["paths"]["seen_delta"])
        for entry in manifest["rounds"]:
            if entry["round"] > round_no:
                break
            if "seen_compact" in entry["paths"]:
                paths = [entry["paths"]["seen_compact"]]
            elif "seen_delta" in entry["paths"]:
                paths.append(entry["paths"]["seen_delta"])
        return paths

    def bloom_words_path_up_to(self, round_no: int) -> str | None:
        """Latest committed CUMULATIVE Bloom word file covering rounds
        ≤ ``round_no`` (each expanding round rewrites the full — tiny —
        word set, so one path suffices). None when the crawl was started
        without the Bloom filter."""
        manifest = self.read_manifest()
        path = None
        if manifest.get("init") and "bloom_words" in manifest["init"]["paths"]:
            path = manifest["init"]["paths"]["bloom_words"]
        for entry in manifest["rounds"]:
            if entry["round"] > round_no:
                break
            if "bloom_words" in entry["paths"]:
                path = entry["paths"]["bloom_words"]
        return path
