"""YAML config entry point for the multi-database engine manager.

The reference server is deployed from a viper YAML config
(/root/reference/cmd/server/main.go:147-180; examples at
/root/reference/config.yaml and config.multi-database.yaml): a
``mongodb.databases`` list of {name, collections} plus server/logging
blocks. This module accepts the SAME shape — a reference user's config
file loads unchanged — and adds an ``engine`` block for the Spark-side
knobs (feed/table/checkpoint paths, buckets, trigger) plus a
``subscriptions`` list (the reference expresses subscriptions over the
wire per client; a batch/streaming engine declares them up front).

Example::

    mongodb:
      databases:
        - name: aktuell
          collections: [transcripts]
    engine:
      feed_dir: /data/feed
      root: /data/tables
      checkpoint_dir: /data/ckpt
      n_buckets: 64
    subscriptions:
      - name: user_turns
        database: aktuell
        collection: transcripts
        predicate: "role = 'user'"

``load_manager(spark, path)`` returns a ready-to-run ``EngineManager``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from aktuell_spark.streaming.bootstrap import EngineConfig
from aktuell_spark.streaming.fanout import EngineManager, Subscription


@dataclass
class EngineSettings:
    """The ``engine:`` block — Spark-side deployment knobs."""

    feed_dir: str = ""
    root: str = ""
    checkpoint_dir: str = ""
    n_buckets: int = 32
    max_files_per_trigger: int | None = None
    # sink modes: delta-only feeds (no UpdateLookup post-images — the
    # reference's common stream shape, pkg/models/types.go:17-18) and
    # LSM-style merge-on-read ingest; same knobs as jobs/run_pipeline.py
    partial_updates: bool = False
    merge_on_read: bool = False
    quarantine: bool = False
    subscriptions: list[Subscription] = field(default_factory=list)
    databases: EngineConfig = field(default_factory=EngineConfig)


def parse_config(doc: dict) -> EngineSettings:
    """Validate + normalize a parsed YAML document.

    Accepts both reference forms: the multi-database list
    (``mongodb.databases: [{name, collections}]``) and the legacy
    single-database pair (``mongodb.database`` + ``mongodb.collections``,
    /root/reference/config.single-database.yaml). Unknown top-level
    blocks (server, logging) are ignored — they configure the WebSocket
    transport, which is out of scope (SURVEY §7 non-goals).
    """
    if not isinstance(doc, dict):
        raise ValueError("config root must be a mapping")
    mongo = doc.get("mongodb") or {}
    dbs: dict[str, list[str]] = {}
    for d in mongo.get("databases") or []:
        name = d.get("name")
        if not name:
            raise ValueError("mongodb.databases entries need a 'name'")
        dbs[name] = list(d.get("collections") or [])
    if not dbs and mongo.get("database"):
        dbs[mongo["database"]] = list(mongo.get("collections") or [])
    if not dbs:
        raise ValueError("config declares no databases (mongodb.databases)")

    eng = doc.get("engine") or {}
    subs = [
        Subscription(
            name=s.get("name") or f"sub{i}",
            database=s.get("database", ""),
            collection=s.get("collection", ""),
            predicate=s.get("predicate"),
        )
        for i, s in enumerate(doc.get("subscriptions") or [])
    ]
    if not subs:
        # no explicit subscriptions: one wildcard subscription per
        # configured database/collection pair (the reference default —
        # every configured namespace is streamed)
        for db, cols in dbs.items():
            for col in cols or [""]:
                subs.append(
                    Subscription(
                        name=f"{db}.{col}" if col else db,
                        database=db,
                        collection=col,
                    )
                )
    mft = eng.get("max_files_per_trigger")
    return EngineSettings(
        feed_dir=eng.get("feed_dir", ""),
        root=eng.get("root", ""),
        checkpoint_dir=eng.get("checkpoint_dir", ""),
        n_buckets=int(eng.get("n_buckets", 32)),
        max_files_per_trigger=int(mft) if mft else None,
        partial_updates=bool(eng.get("partial_updates", False)),
        merge_on_read=bool(eng.get("merge_on_read", False)),
        quarantine=bool(eng.get("quarantine", False)),
        subscriptions=subs,
        databases=EngineConfig(databases=dbs),
    )


def load_settings(path: str) -> EngineSettings:
    import yaml

    with open(path) as f:
        return parse_config(yaml.safe_load(f))


def load_manager(
    spark: SparkSession,
    path: str,
    feed_dir: str | None = None,
    root: str | None = None,
    checkpoint_dir: str | None = None,
    partial_updates: bool | None = None,
    merge_on_read: bool | None = None,
    quarantine: bool | None = None,
) -> tuple[EngineManager, EngineSettings]:
    """Build an ``EngineManager`` from a YAML config file.

    CLI flags may override the path-like settings and the sink modes
    (the reference's viper env-var override layer, main.go:156-159).
    """
    s = load_settings(path)
    if partial_updates is not None:
        s.partial_updates = partial_updates
    if merge_on_read is not None:
        s.merge_on_read = merge_on_read
    if quarantine is not None:
        s.quarantine = quarantine
    feed = feed_dir or s.feed_dir
    tbl = root or s.root
    ckpt = checkpoint_dir or s.checkpoint_dir
    for what, v in (("feed_dir", feed), ("root", tbl), ("checkpoint_dir", ckpt)):
        if not v:
            raise ValueError(f"{what} missing: set engine.{what} or pass --{what}")
    os.makedirs(ckpt, exist_ok=True)
    mgr = EngineManager(
        spark,
        feed,
        tbl,
        ckpt,
        config=s.databases,
        subscriptions=s.subscriptions,
        n_buckets=s.n_buckets,
        partial_updates=s.partial_updates,
        merge_on_read=s.merge_on_read,
        quarantine=s.quarantine,
    )
    return mgr, s
