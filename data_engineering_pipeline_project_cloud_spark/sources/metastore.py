"""Name → path catalog (metastore-lite, round 10 — VERDICT r9 task 4).

The engine is path-native like Delta's ``delta.`/path``` form, but
real SQL users type ``orders``, not `` `/data/orders` `` (the
reference's own statements are all name-addressed, reference
``transform-complex-full.py:16-223``).  This module is the smallest
catalog that closes the idiom: a NAME → TABLE LOCATION mapping, with
the same durability and concurrency discipline as every other piece
of engine metadata —

* State is a directory of immutable ``catalog-v{N}.json`` snapshots,
  published with the identical put-if-absent CAS the manifest writer
  uses (``_claim`` — POSIX hard-link locally, conditional PUT on an
  object store).  Mutations rebase and retry; history is free (the
  catalog itself time-travels), and a fresh process sees the latest
  snapshot — the driver-restart contract.
* Names are CASE-INSENSITIVE (normalized to lowercase), single-part.
* A table created WITHOUT an explicit location is MANAGED: its data
  lives under ``<catalog>/tables/<name>`` and ``DROP TABLE`` removes
  it; a table registered AT a location is EXTERNAL: ``DROP TABLE``
  only forgets the name (Spark/Delta's own managed-vs-external
  contract).

The catalog directory resolves from (first hit wins)
``spark.graft.catalogDir`` (session conf), ``GRAFT_CATALOG_DIR``
(environment), then ``~/.graft/catalog``.

100 TB shape: snapshots are O(tables) driver metadata — data paths
never copy; resolution is one JSON read, cached per (dir, mtime) is
unnecessary at this size.
"""

from __future__ import annotations

import json
import os
import re

from .manifest_source import _claim

_C_RE = re.compile(r"catalog-v(\d{8})\.json")


def catalog_dir(spark=None) -> str:
    if spark is not None:
        try:
            d = spark.conf.get("spark.graft.catalogDir", None)
        except Exception:
            d = None
        if d:
            return d
    d = os.environ.get("GRAFT_CATALOG_DIR")
    if d:
        return d
    return os.path.join(os.path.expanduser("~"), ".graft", "catalog")


def _snapshots(cdir: str) -> dict[int, str]:
    out: dict[int, str] = {}
    try:
        names = os.listdir(cdir)
    except FileNotFoundError:
        return out
    for name in names:
        m = _C_RE.fullmatch(name)
        if m:
            out[int(m.group(1))] = os.path.join(cdir, name)
    return out


def load_catalog(cdir: str, version: int | None = None) -> dict:
    """The catalog snapshot ``{"version", "tables": {name:
    {"location", "managed"}}, "committedAt"}``; an empty catalog is
    version -1 with no tables (the first publish claims v0)."""
    snaps = _snapshots(cdir)
    if version is not None:
        p = snaps.get(version)
        if p is None:
            raise ValueError(
                f"catalog version {version} is not available under "
                f"{cdir} (have {sorted(snaps)})")
        with open(p) as fh:
            return json.load(fh)
    if not snaps:
        return {"version": -1, "tables": {}}
    with open(snaps[max(snaps)]) as fh:
        return json.load(fh)


def _publish(cdir: str, snap: dict) -> bool:
    os.makedirs(cdir, exist_ok=True)
    return _claim(cdir, f"catalog-v{snap['version']:08d}.json",
                  json.dumps(snap))


def _mutate(cdir: str, fn) -> dict:
    """CAS mutation loop: ``fn(tables_dict)`` edits in place (or
    raises); retry on a lost publish race."""
    import time as _time

    while True:
        cur = load_catalog(cdir)
        tables = {k: dict(v) for k, v in cur["tables"].items()}
        fn(tables)
        snap = {"version": cur["version"] + 1, "tables": tables,
                "committedAt": _time.time()}
        if _publish(cdir, snap):
            return snap


def _norm(name: str) -> str:
    n = name.lower()
    if not re.fullmatch(r"[a-z_][a-z0-9_]*", n):
        raise ValueError(
            f"invalid table name {name!r} (single-part "
            "letters/digits/underscores)")
    return n


def managed_location(cdir: str, name: str) -> str:
    return os.path.join(cdir, "tables", _norm(name))


def create_table_entry(spark, name: str, location: str | None,
                       or_replace: bool = False,
                       if_not_exists: bool = False) -> dict:
    """Register ``name``.  ``location=None`` → managed (data under
    the catalog).  Plain CREATE refuses an existing name; OR REPLACE
    repoints it; IF NOT EXISTS no-ops.  Returns ``{"name",
    "location", "managed", "created": bool}``."""
    import shutil

    cdir = catalog_dir(spark)
    n = _norm(name)
    managed = location is None
    loc = managed_location(cdir, n) if managed \
        else (location if "://" in location
              else os.path.abspath(location))
    out = {"name": n, "location": loc, "managed": managed,
           "created": True}
    orphaned: dict = {}

    def fn(tables: dict) -> None:
        orphaned.clear()
        if n in tables:
            if if_not_exists:
                out["location"] = tables[n]["location"]
                out["managed"] = tables[n].get("managed", False)
                out["created"] = False
                return
            if not or_replace:
                raise ValueError(
                    f"table name {n!r} already exists "
                    f"(at {tables[n]['location']}) — use CREATE OR "
                    "REPLACE or DROP TABLE first")
            # OR REPLACE repointing a MANAGED table elsewhere: the
            # old managed data directory loses its only catalog
            # reference — remove it, matching drop_table_entry's
            # managed-data contract (otherwise it leaks, unfindable)
            if (tables[n].get("managed")
                    and tables[n].get("location") != loc):
                orphaned.update(tables[n])
        tables[n] = {"location": loc, "managed": managed}

    _mutate(cdir, fn)
    if orphaned:
        shutil.rmtree(orphaned["location"], ignore_errors=True)
    return out


def create_view_entry(spark, name: str, sql: str,
                      or_replace: bool = False) -> dict:
    """Register a NAMED VIEW: stored SQL text, expanded at query time
    by the statement front-end (``graft.<name>`` references resolve
    to the view's rewritten SELECT).  Views share the catalog
    namespace with tables — a name is one or the other."""
    cdir = catalog_dir(spark)
    n = _norm(name)

    def fn(tables: dict) -> None:
        cur = tables.get(n)
        if cur is not None and not or_replace:
            kind = "view" if "view" in cur else "table"
            raise ValueError(
                f"name {n!r} already exists (a {kind}) — use CREATE "
                "OR REPLACE VIEW or DROP it first")
        if cur is not None and "view" not in cur:
            raise ValueError(
                f"name {n!r} is a TABLE — CREATE OR REPLACE VIEW "
                "cannot repoint it (DROP TABLE first)")
        tables[n] = {"view": sql}

    _mutate(cdir, fn)
    return {"name": n, "view": sql}


def resolve_ref(spark, name: str) -> tuple[str, str]:
    """Resolve a catalog name to ``("table", location)`` or
    ``("view", sql)`` — the query rewriter's hook (DML targets use
    ``resolve_table``, which refuses views)."""
    cdir = catalog_dir(spark)
    n = _norm(name)
    t = load_catalog(cdir)["tables"].get(n)
    if t is None:
        raise ValueError(
            f"unknown table name {name!r} (catalog {cdir} has "
            f"{sorted(load_catalog(cdir)['tables']) or 'no tables'})")
    if "view" in t:
        return "view", t["view"]
    return "table", t["location"]


def drop_table_entry(spark, name: str, if_exists: bool = False,
                     kind: str | None = None) -> dict | None:
    """Forget ``name``; a MANAGED table's data directory is removed
    with it (external locations are never touched).  ``kind`` of
    "table"/"view" refuses dropping the other (ANSI DROP TABLE vs
    DROP VIEW).  Returns the dropped entry, or None under IF EXISTS
    on a missing name."""
    import shutil

    cdir = catalog_dir(spark)
    n = _norm(name)
    dropped: dict = {}

    def fn(tables: dict) -> None:
        if n not in tables:
            if if_exists:
                return
            raise ValueError(
                f"unknown table name {n!r} "
                f"(have {sorted(tables)})")
        actual = "view" if "view" in tables[n] else "table"
        if kind is not None and actual != kind:
            raise ValueError(
                f"{n!r} is a {actual}, not a {kind} — use DROP "
                f"{actual.upper()}")
        dropped.update(tables.pop(n))

    _mutate(cdir, fn)
    if not dropped:
        return None
    if dropped.get("managed"):
        shutil.rmtree(dropped["location"], ignore_errors=True)
    return {"name": n, **dropped}


def resolve_table(spark, name: str) -> str:
    """The location registered for ``name`` — the hook every
    statement's table reference goes through when it is a bare
    identifier instead of a backtick path."""
    cdir = catalog_dir(spark)
    n = _norm(name)
    tables = load_catalog(cdir)["tables"]
    t = tables.get(n)
    if t is None:
        raise ValueError(
            f"unknown table name {name!r} (catalog {cdir} has "
            f"{sorted(tables) or 'no tables'}); register it with "
            "CREATE TABLE <name> LOCATION '<path>' or use a "
            "backtick-quoted path")
    if "view" in t:
        raise ValueError(
            f"{name!r} is a VIEW — it can be queried "
            f"(graft.{n}) but not used as a DML/DDL target")
    return t["location"]


def restore_catalog(spark, version: int) -> dict:
    """Publish a NEW snapshot whose tables map equals the one at
    ``version`` — the catalog's compensating rollback (same
    append-only discipline as ``restore_manifest``: history is never
    rewritten).  ``version=-1`` restores the empty pre-catalog
    state."""
    cdir = catalog_dir(spark)
    old = ({"tables": {}} if version == -1
           else load_catalog(cdir, version))

    def fn(tables: dict) -> None:
        tables.clear()
        tables.update({k: dict(v) for k, v in old["tables"].items()})

    return _mutate(cdir, fn)


def list_tables(spark) -> list[dict]:
    """Every catalog entry, name-sorted: ``{"name", "kind",
    "location", "managed"}`` — the SHOW TABLES surface (views list
    their stored SQL as the location)."""
    tables = load_catalog(catalog_dir(spark))["tables"]
    return [{"name": n,
             "kind": "view" if "view" in t else "table",
             "location": t.get("location", t.get("view", "")),
             "managed": bool(t.get("managed"))}
            for n, t in sorted(tables.items())]
