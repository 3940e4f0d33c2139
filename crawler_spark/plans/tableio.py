"""Snapshot/commit protocol with per-partition lineage (SURVEY.md §4.3).

north_rule: every wave checkpoints frontier + seen-filter state so a killed
job resumes bit-identically. Target backend is Iceberg (snapshot-id = wave);
the sandbox has no Iceberg runtime jar and no network to fetch one, so the
default backend is **snapdir**: Parquet under ``<root>/<table>/_snap=<wave>/``
plus ``<root>/_manifest/<wave>.json`` written LAST as the atomic commit point
(a snapshot without its manifest does not exist). Manifests carry per-table
row counts and order-insensitive xxhash64 content fingerprints — the lineage
a resume verifies against.

Tables are committed in one of two modes:
  * ``full``  — complete state each wave (frontier, hosts);
  * ``delta`` — append-only per-wave increment (documents, fetch_log,
    metrics); a read at wave W unions deltas 0..W.
``seen`` uses delta-PLUS-COMPACTION (spec.seen_compact_every): per-wave
``seen_delta`` snapshots with a full base every K waves, reconstructed by
``read_seen`` — a full rewrite per wave would be O(total frontier) write
volume at the 10^10 design point. Iceberg gives the same layout natively via
snapshot manifests.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


def content_fingerprint(df: DataFrame) -> int:
    """Order-insensitive content hash: sum(xxhash64(to_json(struct(*))))
    mod 2^64. The sum runs in decimal(38,0) — a long sum of 64-bit hashes
    overflows almost immediately under ANSI mode (Spark 4 default).
    Used by manifests and the resume test (bitwise-equal state)."""
    row = df.select(
        F.sum(F.xxhash64(F.to_json(F.struct(*df.columns)))
              .cast("decimal(38,0)")).alias("fp")).collect()[0]
    return int(row["fp"] or 0) % (1 << 64)


class MemoryStore:
    """No-checkpoint state store: localCheckpoint() truncates lineage so the
    per-wave plan does not grow; nothing survives the session."""

    resumable = False

    def persist_wave(self, wave: int, full: dict[str, DataFrame],
                     delta: dict[str, DataFrame], extra: dict | None = None
                     ) -> dict[str, DataFrame]:
        # full tables accumulate lineage across waves -> must be truncated;
        # delta tables hang off already-checkpointed wave intermediates.
        out = {name: df.localCheckpoint(eager=True) for name, df in full.items()}
        out.update(delta)
        return out


class SnapDirStore:
    """Parquet snapshot store with manifest-as-commit-point."""

    resumable = True

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "_manifest"), exist_ok=True)

    # -- paths --
    def _snap_path(self, table: str, wave: int) -> str:
        return os.path.join(self.root, table, f"_snap={wave}")

    def _manifest_path(self, wave: int) -> str:
        return os.path.join(self.root, "_manifest", f"{wave:06d}.json")

    # -- commit --
    def persist_wave(self, wave: int, full: dict[str, DataFrame],
                     delta: dict[str, DataFrame], extra: dict | None = None
                     ) -> dict[str, DataFrame]:
        manifest = {"wave": wave, "parent_wave": wave - 1,
                    "tables": {}, "extra": extra or {}}
        out: dict[str, DataFrame] = {}
        for mode, tables in (("full", full), ("delta", delta)):
            for name, df in tables.items():
                path = self._snap_path(name, wave)
                if os.path.exists(path):           # re-run of an uncommitted wave
                    shutil.rmtree(path)
                df.write.parquet(path)
                back = self.spark.read.parquet(path)
                manifest["tables"][name] = {
                    "mode": mode,
                    "rows": back.count(),
                    "fingerprint": content_fingerprint(back),
                    "n_files": len([f for f in os.listdir(path)
                                    if f.endswith(".parquet")]),
                }
                out[name] = back
        tmp = self._manifest_path(wave) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, self._manifest_path(wave))   # atomic commit point
        return out

    # -- read / resume --
    def latest_wave(self) -> int | None:
        waves = [int(f.split(".")[0]) for f in os.listdir(os.path.join(self.root, "_manifest"))
                 if f.endswith(".json")]
        return max(waves) if waves else None

    def manifest(self, wave: int) -> dict:
        with open(self._manifest_path(wave)) as fh:
            return json.load(fh)

    def read_full(self, table: str, wave: int) -> DataFrame:
        return self.spark.read.parquet(self._snap_path(table, wave))

    def read_delta_union(self, table: str, upto_wave: int,
                         from_wave: int = 0) -> DataFrame | None:
        paths = [self._snap_path(table, w)
                 for w in range(from_wave, upto_wave + 1)]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            return None
        # mergeSchema: a resumed run may append deltas with columns an older
        # process's files lack (e.g. metrics grew job_id/event) — without it
        # Spark infers from one arbitrary file and the new columns silently
        # vanish from the union
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def read_seen(self, wave: int) -> DataFrame:
        """Reconstruct `seen` as of `wave` under either layout: a full
        snapshot at `wave`, or the last compacted base plus the per-wave
        `seen_delta` chain since (manifest `extra.seen_base_wave`)."""
        man = self.manifest(wave)
        if "seen" in man.get("tables", {}):
            return self.read_full("seen", wave)
        base = man.get("extra", {}).get("seen_base_wave")
        if base is None:
            raise FileNotFoundError(f"no seen snapshot or base at wave {wave}")
        df = self.read_full("seen", base)
        deltas = self.read_delta_union("seen_delta", wave, from_wave=base + 1)
        return df if deltas is None else df.unionByName(deltas)


class IcebergStore:
    """Iceberg backend (config-switched; requires iceberg-spark-runtime on the
    classpath — absent in this sandbox, see SURVEY.md §4.3). Same contract:
    one snapshot per wave, resume = read latest snapshot."""

    resumable = True

    def __init__(self, spark: SparkSession, catalog: str, namespace: str):
        raise NotImplementedError(
            "no Iceberg runtime jar in sandbox; production: writeTo("
            f"'{catalog}.{namespace}.<table>').createOrReplace() per wave, "
            "wave id stamped via snapshot summary properties")
