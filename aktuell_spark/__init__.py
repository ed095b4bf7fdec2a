"""aktuell_spark — a PySpark-native Structured Streaming CDC/CEP engine.

A from-scratch reimplementation of the *capabilities* of pzitzman/Aktuell
(reference, read-only at /root/reference: a Go MongoDB change-stream →
WebSocket sync server) as an idiomatic Spark engine:

- change events over conversation-transcript tables are ingested as a
  stream, deduplicated by resume-token semantics (watermarked
  ``dropDuplicates`` on the event key), and materialized exactly-once into
  a keyed table via an idempotent ``foreachBatch`` MERGE
  (reference client merge: react-client/src/hooks/useAktuellStream.ts:125-171);
- tumbling/sliding/session windows give the per-conversation rollups the
  reference dashboard computes client-side
  (react-client/src/components/Stats.tsx:54-94);
- a stateful stream-stream join (turns vs tool-call events) replaces the
  reference's hub fan-out state (pkg/server/websocket.go:226-293);
- snapshot-then-tail bootstrap (pkg/sync/database.go:225-333) becomes a
  bounded read unioned ahead of the stream.

Everything is DataFrame/SQL-first: Catalyst handles pushdown and pruning;
Python appears only as vectorized Arrow/pandas UDFs.
"""

from aktuell_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
