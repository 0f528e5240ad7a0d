"""Table integrity checker (``manifest_fsck``) — the operational
completeness tool every lakehouse format ships in some form (Delta's
FSCK / Iceberg's validation actions): verify that a manifest table's
on-disk state honors every PROTOCOL.md invariant a reader depends on,
WITHOUT reading data pages.

The reference has no equivalent (its "tables" are an external RDBMS,
`function_app.py:296-312`); this is part of the engine-extension
surface. Cost model: O(versions) commit-log JSON reads + O(files)
``stat`` calls + O(sidecars) parquet FOOTER reads — metadata only,
never a data scan, so it is safe to run against a 100 TB table as a
routine health check.
"""

from __future__ import annotations

from data_management_service_run_etl_imputations_spark.sources.sinks import (
    PROTOCOL_VERSION,
    _checkpoint_dir,
    _commit_meta,
    _has_checkpoint,
    _latest_manifest,
    _live_dirs,
    _load_checkpoint,
    _manifest_dir,
    _materialize,
    _partition_cols,
    _read_commit_file,
    _required_protocol,
)


def manifest_fsck(path: str, check_sizes: bool = True) -> dict:
    """Validate a manifest table's invariants from metadata alone and
    return ``{"ok": bool, "errors": [...], "warnings": [...],
    "versions": n, "files_checked": n}``. Checks, in PROTOCOL.md order:

    1. **Log shape** — version files dense from the oldest kept to the
       head; every kept version materializes (anchor + delta chain).
    2. **Protocol** — each version's stamped protocol covers the
       features it actually uses (column mapping / multi-column
       partitioning) and does not exceed what this engine supports.
    3. **Liveness** — every file the HEAD lists exists on disk, with
       the recorded size (``check_sizes``); every live dir has a
       ``dir_schemas`` entry; on a mapped table every live dir has a
       ``dir_col_ids`` entry and every mapped id resolves to at most
       one logical column.
    4. **Delete entries** — every sidecar exists; positional entries
       carry the positional schema (``file``/``pos``) and scope at
       least one live file; equality entries' match columns exist in
       the current schema.
    5. **Index sidecars** — ``stats_ref`` / ``bloom_ref`` files exist
       (their entries may lawfully mention dead files: loaders
       intersect with the live list).
    6. **Checkpoints** — the newest parquet checkpoint at or below the
       head materializes to EXACTLY the same content as the commit-log
       replay of that version (the anchor-equivalence invariant).
    7. **Declared metadata** — ``schema_json`` parses; generated
       columns name partition columns; constraint expressions are
       non-empty strings.

    Errors are invariant violations a reader would hit; warnings are
    legal-but-noteworthy states (e.g. orphaned stage dirs awaiting
    vacuum — those are NOT errors: immutability makes them invisible
    to every reader)."""
    import json
    import os

    errors: list[str] = []
    warnings: list[str] = []

    head, content = _latest_manifest(path)
    if head == 0:
        return {
            "ok": False,
            "errors": [f"no manifest table at {path}"],
            "warnings": [],
            "versions": 0,
            "files_checked": 0,
        }

    # 1. log shape: dense kept versions, each materializable
    mdir = _manifest_dir(path)
    versions = sorted(
        int(n[:-5])
        for n in os.listdir(mdir)
        if n.endswith(".json") and n[:-5].isdigit()
    )
    if versions[-1] != head:
        errors.append(
            f"head resolution drift: newest log file v{versions[-1]} vs "
            f"resolved head v{head}"
        )
    dense = list(range(versions[0], versions[-1] + 1))
    if versions != dense:
        errors.append(
            f"commit log has gaps: kept versions {versions[:5]}… are not "
            "dense (vacuum must keep delta chains whole)"
        )
    for v in versions:
        try:
            c = _materialize(path, v)
        except Exception as e:  # noqa: BLE001 — report, don't crash fsck
            errors.append(f"version {v} does not materialize: {e}")
            continue
        # 2. protocol stamping
        stamped = c.get("protocol", 1)
        needed = _required_protocol(c)
        if stamped > PROTOCOL_VERSION:
            errors.append(
                f"v{v} stamps protocol {stamped} > supported "
                f"{PROTOCOL_VERSION}"
            )
        if stamped < needed:
            errors.append(
                f"v{v} uses protocol-{needed} features but stamps "
                f"{stamped} — old readers would misread it"
            )

    # 3. head liveness
    files: dict = content.get("files", {})
    n_checked = 0
    for part, entries in files.items():
        for e in entries:
            rel, size = e[0], e[1]
            fp = os.path.join(path, *rel.split("/"))
            if not os.path.isfile(fp):
                errors.append(f"live file missing on disk: {rel} ({part})")
                continue
            n_checked += 1
            if check_sizes and size is not None:
                actual = os.path.getsize(fp)
                if actual != size:
                    errors.append(
                        f"size drift for {rel}: manifest {size} vs disk "
                        f"{actual} (immutability violated)"
                    )
    live_dirs = _live_dirs(content)
    dir_schemas = content.get("dir_schemas", {})
    for d in sorted(live_dirs):
        if d not in dir_schemas:
            errors.append(f"live dir without dir_schemas entry: {d}")
    col_ids = content.get("col_ids")
    if col_ids:
        by_id: dict[int, list[str]] = {}
        for name, cid in col_ids.items():
            by_id.setdefault(cid, []).append(name)
        dupes = {i: ns for i, ns in by_id.items() if len(ns) > 1}
        if dupes:
            errors.append(f"column ids mapped to multiple names: {dupes}")
        dci = content.get("dir_col_ids", {})
        for d in sorted(live_dirs):
            if d not in dci:
                warnings.append(
                    f"mapped table has unmapped live dir {d} (legacy "
                    "by-name reads still apply)"
                )

    # 4. delete entries
    import pyarrow.parquet as pq

    def _sidecar_schema_names(fp: str) -> "set[str] | None":
        """Column names of a parquet sidecar. Spark writes sidecars as
        DIRECTORIES of part files; driver-side writers may produce a
        single file — accept both. None = unreadable."""
        try:
            if os.path.isdir(fp):
                parts = [
                    n
                    for n in os.listdir(fp)
                    if n.endswith(".parquet") and not n.startswith((".", "_"))
                ]
                if not parts:
                    return None
                fp = os.path.join(fp, parts[0])
            return set(pq.read_schema(fp).names)
        except Exception:  # noqa: BLE001
            return None

    live_files = {e[0] for es in files.values() for e in es}
    rows_by_rel = {
        e[0]: (e[2] if len(e) > 2 else None)
        for es in files.values()
        for e in es
    }
    try:
        schema_fields = {
            f["name"]
            for f in json.loads(content.get("schema_json") or "{}").get(
                "fields", []
            )
        }
    except (ValueError, AttributeError):
        schema_fields = set()
        errors.append("schema_json does not parse")
    for entry in content.get("deletes") or []:
        ref = entry["ref"]
        fp = os.path.join(path, *ref.split("/"))
        if not os.path.exists(fp):
            errors.append(f"pending delete sidecar missing: {ref}")
            continue
        names = _sidecar_schema_names(fp)
        if names is None:
            errors.append(f"pending delete sidecar unreadable: {ref}")
            continue
        if entry.get("kind") == "pos":
            if not {"file", "pos"} <= names:
                errors.append(
                    f"positional sidecar {ref} lacks file/pos columns "
                    f"(has {sorted(names)})"
                )
                continue
            if not any(f in live_files for f in entry.get("files", [])):
                errors.append(
                    f"positional entry {ref} scopes no live file — "
                    "purge missed it"
                )
            # every address must fall inside its file's recorded row
            # count — an out-of-range position masks nothing today but
            # would silently mask the WRONG row after any tool that
            # renumbers (none exists; the check pins that)
            t = pq.read_table(fp, columns=["file", "pos"])
            by_file: dict[str, int] = {}
            for f_, p_ in zip(
                t.column("file").to_pylist(), t.column("pos").to_pylist()
            ):
                if p_ is not None and p_ >= by_file.get(f_, -1):
                    by_file[f_] = p_
            for f_, max_pos in sorted(by_file.items()):
                n_rows = rows_by_rel.get(f_)
                if n_rows is not None and max_pos >= n_rows:
                    errors.append(
                        f"positional sidecar {ref} addresses row "
                        f"{max_pos} of {f_}, which records only "
                        f"{n_rows} rows"
                    )
        else:
            file_cols = entry.get("key_cols", entry["cols"])
            missing = sorted(set(file_cols) - names)
            if missing:
                errors.append(
                    f"equality sidecar {ref} lacks key column(s) {missing}"
                )
            gone = sorted(set(entry["cols"]) - schema_fields)
            if gone:
                errors.append(
                    f"equality entry {ref} matches on dropped column(s) "
                    f"{gone}"
                )

    # 5. index sidecars
    for key in ("stats_ref", "bloom_ref"):
        ref = content.get(key)
        if ref and not os.path.exists(os.path.join(path, *ref.split("/"))):
            errors.append(f"{key} missing on disk: {ref}")

    # 6. newest checkpoint ≡ log replay
    ckdir = _checkpoint_dir(path)
    ck_versions = (
        sorted(
            int(n.split(".")[0])
            for n in os.listdir(ckdir)
            if n.endswith(".meta.json")
        )
        if os.path.isdir(ckdir)
        else []
    )
    for cv in ck_versions[-1:]:
        if cv < versions[0]:
            continue  # below the retention floor; log replay impossible
        try:
            from_ck = _load_checkpoint(path, cv)
        except Exception as e:  # noqa: BLE001
            errors.append(f"checkpoint v{cv} unreadable: {e}")
            continue
        # replay the same version through the LOG alone. After vacuum's
        # log compaction the chain below the checkpoint may be gone —
        # then the checkpoint IS the designed anchor and there is
        # nothing to cross-check (FileNotFoundError → skip, not error).
        try:
            chain = []
            v = cv
            c = _read_commit_file(path, v)
            while "delta_from" in c:
                chain.append(c)
                v = c["delta_from"]
                c = _read_commit_file(path, v)
        except FileNotFoundError:
            continue
        from data_management_service_run_etl_imputations_spark.sources.sinks import (
            _apply_actions,
        )

        from_log = c
        for delta in reversed(chain):
            from_log = _apply_actions(from_log, delta["actions"])
        if from_ck != from_log:
            diff_keys = sorted(
                k
                for k in set(from_ck) | set(from_log)
                if from_ck.get(k) != from_log.get(k)
            )
            errors.append(
                f"checkpoint v{cv} diverges from log replay on keys "
                f"{diff_keys}"
            )

    # 7. declared metadata
    gen = content.get("generated_cols") or {}
    pcols = set(_partition_cols(content)) if content.get(
        "partition_col"
    ) or content.get("partition_cols") else set()
    bad_gen = sorted(set(gen) - pcols)
    if bad_gen:
        errors.append(
            f"generated column(s) {bad_gen} are not partition columns"
        )
    for name, expr in (content.get("constraints") or {}).items():
        if not isinstance(expr, str) or not expr.strip():
            errors.append(f"constraint {name!r} has an empty expression")

    # orphaned stage dirs (crashed writers / lost commit races) are
    # legal — readers resolve files from the manifest alone — but worth
    # surfacing so operators know vacuum has work to do
    data_root = os.path.join(path, "data")
    if os.path.isdir(data_root):
        live_stages = {d.split("/")[1] for d in live_dirs}
        # stages referenced by ANY kept version stay legal until vacuum
        kept_stages: set[str] = set()
        for v in versions:
            try:
                kc = _materialize(path, v)
            except Exception:  # noqa: BLE001 — already reported above
                continue
            kept_stages |= {d.split("/")[1] for d in _live_dirs(kc)}
        orphans = sorted(
            s
            for s in os.listdir(data_root)
            if s not in kept_stages and s not in live_stages
        )
        if orphans:
            warnings.append(
                f"{len(orphans)} orphaned stage dir(s) await vacuum "
                f"(e.g. {orphans[:2]})"
            )

    # head commit provenance present (history contract)
    meta = _commit_meta(_read_commit_file(path, head))
    if not meta.get("op"):
        warnings.append(f"head v{head} records no op provenance")

    return {
        "ok": not errors,
        "errors": errors,
        "warnings": warnings,
        "versions": len(versions),
        "files_checked": n_checked,
    }
