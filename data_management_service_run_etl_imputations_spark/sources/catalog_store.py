"""Cross-session table catalog: a persisted name→path registry at the
WAREHOUSE level, so a fresh SparkSession can reach every manifest table
by SQL name without re-registering each path by hand.

The reference leans on SQL Server's persistent catalog for every read
(``function_app.py:192-196`` resolves table names server-side); the
engine's session-level ``manifest_sql_register`` had no durable
counterpart — this module is that counterpart.

Storage model — the same optimistic-concurrency commit primitive as the
table manifests themselves: the catalog is a directory
``<warehouse>/_catalog/`` of immutable ``<version>.json`` full snapshots
(the registry is tiny — names and paths only, never file lists), each
published with :func:`sinks.get_commit_backend`'s ``put_if_absent``.
Two sessions racing to register get exactly one winner; the loser
re-reads and re-merges (:func:`sinks.with_commit_retry`), so
register/unregister are linearizable without any cross-process lock.
Full snapshots keep reads O(1) version files (no delta chain): a
catalog with 10⁵ tables is a few MB of JSON, read once per attach.

Relocatability: a table path UNDER the warehouse directory is stored
RELATIVE, so moving/mounting the warehouse elsewhere keeps the catalog
valid; paths outside the warehouse are stored absolute (external
tables, Delta's EXTERNAL semantics).

Entry model (round 12): one namespace, two kinds. A snapshot value that
is a STRING is a table path (the r11 format — every legacy snapshot
parses unchanged); a value that is a DICT is a VIEW definition
``{"view": <sql text>, "seq": <n>}``. Tables and views share the
namespace exactly as SQL does (``CREATE VIEW x`` over an existing table
``x`` refuses), and ``seq`` preserves creation order so an attach can
re-create views that reference other views in a working order.
"""

from __future__ import annotations

import json
import os
import threading

_CATALOG_SUBDIR = "_catalog"

# The warehouse a session attached with manifest_catalog_attach — the
# SQL dispatcher (manifest_batch) consults this so CREATE/DROP TABLE
# statements keep the persisted registry in sync with the session one.
# Process-global by design: a SparkSession is process-global in the
# local/driver model too, and the attach verb is explicit.
_ATTACHED: dict = {"warehouse": None}
_ATTACH_LOCK = threading.RLock()


def _catalog_dir(warehouse_dir: str) -> str:
    return os.path.join(warehouse_dir, _CATALOG_SUBDIR)


def _latest_catalog(warehouse_dir: str) -> "tuple[int, dict]":
    """(version, {name: stored_path}) of the newest snapshot; (0, {})
    for a warehouse with no catalog yet."""
    d = _catalog_dir(warehouse_dir)
    if not os.path.isdir(d):
        return 0, {}
    versions = [
        int(n[:-5])
        for n in os.listdir(d)
        if n.endswith(".json") and n[:-5].isdigit()
    ]
    if not versions:
        return 0, {}
    v = max(versions)
    with open(os.path.join(d, f"{v}.json")) as fh:
        return v, json.load(fh)


def _store_path(warehouse_dir: str, path: str) -> str:
    """Relative when under the warehouse (relocatable), else absolute."""
    wh = os.path.abspath(warehouse_dir)
    ap = os.path.abspath(path)
    if ap == wh or ap.startswith(wh + os.sep):
        return os.path.relpath(ap, wh)
    return ap


def _resolve_path(warehouse_dir: str, stored: str) -> str:
    if os.path.isabs(stored):
        return stored
    return os.path.join(os.path.abspath(warehouse_dir), stored)


def _publish(warehouse_dir: str, version: int, tables: dict) -> None:
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        CommitConflict,
        get_commit_backend,
    )

    d = _catalog_dir(warehouse_dir)
    os.makedirs(d, exist_ok=True)
    target = os.path.join(d, f"{version}.json")
    if not get_commit_backend().put_if_absent(
        target, json.dumps(tables, sort_keys=True).encode()
    ):
        raise CommitConflict(
            f"catalog version {version} already committed at {d}; "
            "re-read the latest catalog and retry"
        )


def catalog_tables(warehouse_dir: str) -> dict[str, str]:
    """{name: resolved_table_path} of the newest catalog snapshot
    (TABLE entries only — view definitions via :func:`catalog_views`)."""
    _, tables = _latest_catalog(warehouse_dir)
    return {
        n: _resolve_path(warehouse_dir, p)
        for n, p in sorted(tables.items())
        if isinstance(p, str)
    }


def catalog_views(warehouse_dir: str) -> "dict[str, dict]":
    """{name: {"view": sql, "seq": n}} of the newest snapshot, in
    creation (``seq``) order — re-creating them in iteration order is
    always sound for views that reference earlier views."""
    _, tables = _latest_catalog(warehouse_dir)
    views = {
        n: e for n, e in tables.items() if isinstance(e, dict)
    }
    return dict(
        sorted(views.items(), key=lambda kv: (kv[1].get("seq", 0), kv[0]))
    )


def catalog_set(warehouse_dir: str, name: str, path: str) -> int:
    """Register (or re-point) table ``name`` → ``path`` durably. Returns
    the committed catalog version. Conflict-safe: a racing writer forces
    a re-read + re-merge, never a lost update. Refuses to overwrite a
    VIEW entry — one namespace, SQL's rule (DROP VIEW first)."""
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        with_commit_retry,
    )

    key = name.lower()

    def op():
        v, tables = _latest_catalog(warehouse_dir)
        tables = dict(tables)
        if isinstance(tables.get(key), dict):
            raise ValueError(
                f"catalog name {name!r} is a VIEW — cannot re-point it "
                "at a table path (DROP VIEW first)"
            )
        tables[key] = _store_path(warehouse_dir, path)
        _publish(warehouse_dir, v + 1, tables)
        return v + 1

    return with_commit_retry(op)


def catalog_set_view(warehouse_dir: str, name: str, sql_text: str) -> int:
    """Store (or replace) a durable VIEW definition — the SQL text, not
    a materialization; an attach re-creates it as a session view.
    Replacing keeps the original ``seq`` (dependency order is defined by
    creation time; a replaced definition keeps its slot so views created
    after it that reference it still re-create in a working order).
    Refuses to shadow a TABLE entry."""
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        with_commit_retry,
    )

    key = name.lower()

    def op():
        v, tables = _latest_catalog(warehouse_dir)
        tables = dict(tables)
        cur = tables.get(key)
        if isinstance(cur, str):
            raise ValueError(
                f"catalog name {name!r} is a TABLE — CREATE VIEW cannot "
                "shadow it (DROP TABLE first)"
            )
        seq = (
            cur["seq"]
            if isinstance(cur, dict) and "seq" in cur
            else 1
            + max(
                (
                    e.get("seq", 0)
                    for e in tables.values()
                    if isinstance(e, dict)
                ),
                default=0,
            )
        )
        tables[key] = {"view": sql_text, "seq": seq}
        _publish(warehouse_dir, v + 1, tables)
        return v + 1

    return with_commit_retry(op)


def catalog_remove(warehouse_dir: str, name: str) -> bool:
    """Remove ``name`` (table or view) from the durable catalog. True
    when it existed."""
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        with_commit_retry,
    )

    key = name.lower()

    def op():
        v, tables = _latest_catalog(warehouse_dir)
        if key not in tables:
            return False
        tables = {k: p for k, p in tables.items() if k != key}
        _publish(warehouse_dir, v + 1, tables)
        return True

    return with_commit_retry(op)


def catalog_rename(warehouse_dir: str, old: str, new: str) -> int:
    """Re-point ``old`` → ``new`` (table or view) as ONE snapshot
    commit — remove-old and add-new can never be observed separately,
    so a concurrent attach sees either the old name or the new, never
    both and never neither (the two-commit spelling would expose both
    intermediate states). Returns the committed catalog version.
    Refuses loudly when ``old`` is absent or ``new`` already exists."""
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        with_commit_retry,
    )

    ko, kn = old.lower(), new.lower()

    def op():
        v, tables = _latest_catalog(warehouse_dir)
        if ko not in tables:
            raise ValueError(
                f"RENAME: {old!r} is not in the durable catalog at "
                f"{warehouse_dir!r}"
            )
        if kn in tables:
            raise ValueError(
                f"RENAME: target name {new!r} already exists in the "
                "durable catalog — renames never overwrite (DROP the "
                "target first)"
            )
        tables = dict(tables)
        tables[kn] = tables.pop(ko)
        _publish(warehouse_dir, v + 1, tables)
        return v + 1

    return with_commit_retry(op)


def attached_warehouse() -> "str | None":
    """The warehouse this session attached, or None. The SQL dispatcher
    uses it to mirror CREATE/DROP TABLE into the durable catalog."""
    with _ATTACH_LOCK:
        return _ATTACHED["warehouse"]


def manifest_catalog_detach() -> "str | None":
    """Stop mirroring SQL DDL into the attached warehouse (session
    views stay registered). Returns the previously attached dir."""
    with _ATTACH_LOCK:
        prev = _ATTACHED["warehouse"]
        _ATTACHED["warehouse"] = None
    return prev


def manifest_catalog_attach(
    spark,
    warehouse_dir: str,
    follow_head: bool = True,
    prune: bool = True,
    missing: str = "strict",
) -> dict[str, str]:
    """Attach a warehouse: read the durable catalog and register every
    table as a SQL view in THIS session (follow_head by default — an
    attached table tracks its moving head per-statement, the behavior a
    catalog table has in Delta). Subsequent ``CREATE TABLE``/
    ``DROP TABLE`` statements through :func:`manifest_sql` keep the
    durable catalog in sync; ``SHOW TABLES`` lists it. Also resolves
    ``CREATE`` statements WITHOUT a ``LOCATION`` to managed tables at
    ``<warehouse>/<name>`` while attached. Returns {name: path} of the
    attached tables. Attaching an empty/new warehouse is valid (creates
    the registry on first CREATE).

    ``missing``: a catalog entry whose table no longer exists on disk
    (deleted outside ``DROP TABLE``) is a STALE entry. ``"strict"``
    (default) refuses the whole attach with the entry named — a
    half-attached session is worse than a loud inventory problem;
    ``"skip"`` registers every healthy table and leaves the stale names
    out of the returned mapping (they stay in the catalog for repair —
    ``DROP TABLE name`` removes them)."""
    from data_management_service_run_etl_imputations_spark.sources.manifest_batch import (
        manifest_sql_register,
    )

    if missing not in ("strict", "skip"):
        raise ValueError(f"missing must be strict|skip, got {missing!r}")
    tables = catalog_tables(warehouse_dir)
    stale = {
        n: p
        for n, p in tables.items()
        if not os.path.isdir(os.path.join(p, "_commits"))
    }
    if stale and missing == "strict":
        raise ValueError(
            f"manifest_catalog_attach: stale catalog entr"
            f"{'ies' if len(stale) > 1 else 'y'} (no table on disk): "
            f"{sorted(stale.items())} — the table(s) were removed "
            "outside DROP TABLE. Re-attach with missing='skip' to "
            "register the healthy tables, then DROP TABLE the stale "
            "names to repair the catalog"
        )
    attached = {n: p for n, p in tables.items() if n not in stale}
    for name, path in attached.items():
        manifest_sql_register(
            spark, name, path, follow_head=follow_head, prune=prune
        )
    # Views after tables (they reference them), ascending seq (they can
    # reference earlier views). Re-creation VALIDATES each definition; a
    # view over a table that no longer attaches is as stale as a stale
    # table entry — same strict/skip policy.
    from data_management_service_run_etl_imputations_spark.sources.manifest_batch import (
        manifest_sql_view_register,
    )

    for name, entry in catalog_views(warehouse_dir).items():
        try:
            manifest_sql_view_register(
                spark, name, entry["view"], seq=entry.get("seq")
            )
        except Exception as e:  # noqa: BLE001 — definition won't analyze
            if missing == "strict":
                raise ValueError(
                    f"manifest_catalog_attach: durable view {name!r} "
                    f"failed to re-create ({e}) — its definition no "
                    "longer analyzes (a base table was dropped outside "
                    "DROP TABLE?). Re-attach with missing='skip' to "
                    "register everything else, then DROP VIEW "
                    f"{name} to repair the catalog"
                ) from e
    with _ATTACH_LOCK:
        _ATTACHED["warehouse"] = os.path.abspath(warehouse_dir)
    return attached
