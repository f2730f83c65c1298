"""Superfile management: named containers of sub-files with transactional
add/remove/swap — the reference's incremental-ingest idiom.

Reference: ``IDistributedSuperFile`` (dali/base/dadfs.hpp:493-497 —
addSubFile with positional insert, removeSubFile, swapSuperFile) and the
Std.File surface (ecllibrary/std/File.ecl:982-1065 —
StartSuperFileTransaction / AddSuperFile / RemoveSuperFile / SwapSuperFile /
FinishSuperFileTransaction with rollback). The reference keeps the
container membership in Dali (its metadata store); the Spark-first analogue
is a manifest catalog: one JSON manifest per superfile listing ordered
sub-file paths, updated via atomic rename so readers never observe a
half-applied membership change.

Scale note: a superfile read is a multi-path parquet scan — Spark merges
file listings and plans splits across ALL sub-files in one job, so an
N-sub-file container costs the same as one directory of the union size
(no per-sub-file jobs, predicate pushdown and partition pruning intact).
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


class SuperFileCatalog:
    """Manifest-backed superfile membership with ECL-style transactions."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._txn: dict[str, list[str]] | None = None

    # -- manifest I/O -----------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.superfile.json")

    def _load(self, name: str) -> list[str]:
        if self._txn is not None and name in self._txn:
            return list(self._txn[name])
        try:
            with open(self._path(name)) as f:
                return json.load(f)["subfiles"]
        except FileNotFoundError:
            raise KeyError(f"superfile {name!r} does not exist") from None

    def _store(self, name: str, subs: list[str]) -> None:
        if self._txn is not None:
            self._txn[name] = list(subs)
            return
        # Atomic publish: write sidecar, rename over the manifest — readers
        # see the old or the new membership, never a partial write (the
        # reference's Dali commit plays the same role).
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"name": name, "subfiles": subs}, f)
        os.replace(tmp, self._path(name))

    # -- membership ops (Std.File surface) --------------------------------
    def create(self, name: str, subfiles: Sequence[str] = ()) -> None:
        """CreateSuperFile — overwrites an existing manifest."""
        self._store(name, list(subfiles))

    def exists(self, name: str) -> bool:
        if self._txn is not None and name in self._txn:
            return True
        return os.path.exists(self._path(name))

    def sub_files(self, name: str) -> list[str]:
        """GetSuperFileSubName iteration — ordered membership."""
        return self._load(name)

    def add_sub_file(
        self,
        name: str,
        path: str,
        before: bool = False,
        other: str | None = None,
    ) -> None:
        """AddSuperFile (addSubFile dadfs.hpp:504-509): append by default;
        ``before``/``other`` give the reference's positional insert."""
        subs = self._load(name)
        if path in subs:
            raise ValueError(f"{path!r} already in superfile {name!r}")
        if other is not None:
            i = subs.index(other)
            subs.insert(i if before else i + 1, path)
        elif before:
            subs.insert(0, path)
        else:
            subs.append(path)
        self._store(name, subs)

    def remove_sub_file(self, name: str, path: str | None = None) -> None:
        """RemoveSuperFile (removeSubFile: NULL path removes all)."""
        subs = self._load(name)
        if path is None:
            subs = []
        else:
            subs.remove(path)
        self._store(name, subs)

    def swap(self, name1: str, name2: str) -> None:
        """SwapSuperFile (File.ecl:1046) — exchange memberships."""
        s1, s2 = self._load(name1), self._load(name2)
        self._store(name1, s2)
        self._store(name2, s1)

    # -- transactions ------------------------------------------------------
    def transaction(self) -> "_SuperFileTransaction":
        """StartSuperFileTransaction … FinishSuperFileTransaction: ops in
        the ``with`` block stage in memory and publish together on exit;
        an exception rolls back everything (rollback=TRUE)."""
        return _SuperFileTransaction(self)

    # -- data plane --------------------------------------------------------
    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """Superfile scan: one multi-path parquet read over the ordered
        membership; schemas union by name (mergeSchema) so old and new
        layout generations coexist — the reference's same-layout rule
        relaxed to Spark's schema-merge semantics."""
        subs = self._load(name)
        if not subs:
            raise ValueError(f"superfile {name!r} is empty")
        return spark.read.option("mergeSchema", "true").parquet(*subs)


class _SuperFileTransaction:
    def __init__(self, catalog: SuperFileCatalog):
        self.catalog = catalog

    def __enter__(self) -> SuperFileCatalog:
        if self.catalog._txn is not None:
            raise RuntimeError("superfile transaction already active")
        self.catalog._txn = {}
        return self.catalog

    def __exit__(self, exc_type, exc, tb) -> bool:
        staged, self.catalog._txn = self.catalog._txn, None
        if exc_type is None:
            for name, subs in staged.items():
                self.catalog._store(name, subs)
        return False  # propagate exceptions (rollback = discard staged)
