"""Std.System.Store analogue: namespaced durable key-value stores.

Reference: ecllibrary/std/system/Store.ecl:31 — the Store() module backed
by Dali via the ESP KVStore service (CreateStore / SetKeyValue /
GetKeyValue / DeleteKeyValue / GetAllKeys / ListStores), used by ECL jobs
for small cross-workunit state: cursors, high-water marks, feature flags.

The Spark-side analogue keeps the same namespace/key/value contract on a
filesystem directory (one JSON file per store, atomic tmp+rename
writes) — the volume is tiny by design (control state, not data), so a
distributed store would be overkill; on a real cluster the base dir
lives on the shared filesystem the metastore uses. Single-writer per
store is the documented discipline, same as the reference's
last-write-wins ESP calls.
"""

from __future__ import annotations

import json
import os
import tempfile


class KVStore:
    """One namespace root holding named stores of string key/values."""

    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    def _path(self, store: str) -> str:
        if not store or "/" in store or store.startswith("."):
            raise ValueError(f"bad store name {store!r}")
        return os.path.join(self.base_dir, f"{store}.json")

    def _load(self, store: str) -> dict[str, str]:
        try:
            with open(self._path(store)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _save(self, store: str, data: dict[str, str]) -> None:
        # atomic replace: readers never observe a torn file
        fd, tmp = tempfile.mkstemp(dir=self.base_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(data, f, sort_keys=True)
            os.replace(tmp, self._path(store))
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    # --- Store.ecl service surface ---
    def create_store(self, store: str) -> bool:
        """CreateStore (Store.ecl CreateStoreResponseRec): True if newly
        created, False if it already existed."""
        path = self._path(store)
        if os.path.exists(path):
            return False
        self._save(store, {})
        return True

    def list_stores(self) -> list[str]:
        """ListStores (ListStoresResponseRec)."""
        return sorted(
            f[: -len(".json")]
            for f in os.listdir(self.base_dir)
            if f.endswith(".json")
        )

    def set_value(self, store: str, key: str, value: str) -> None:
        """SetKeyValue (SetKeyValueResponseRec) — last write wins."""
        data = self._load(store)
        data[key] = str(value)
        self._save(store, data)

    def get_value(self, store: str, key: str, default: str | None = None) -> str | None:
        """GetKeyValue (GetKeyValueResponseRec)."""
        return self._load(store).get(key, default)

    def delete_key(self, store: str, key: str) -> bool:
        """DeleteKeyValue (DeleteKeyValueResponseRec): True if the key
        existed."""
        data = self._load(store)
        if key not in data:
            return False
        del data[key]
        self._save(store, data)
        return True

    def get_all_keys(self, store: str) -> list[str]:
        """GetAllKeys (GetAllKeysResponseRec)."""
        return sorted(self._load(store))

    def fetch_and_increment(self, store: str, key: str, start: int = 0) -> int:
        """Monotonic counter convenience (the common cursor/high-water
        use of the reference store): returns the pre-increment value."""
        data = self._load(store)
        cur = int(data.get(key, start))
        data[key] = str(cur + 1)
        self._save(store, data)
        return cur
