from aktuell_spark.fixtures.generator import (
    gen_tool_events,
    gen_transcript_changes,
    gen_transcripts,
    inject_collection_op,
)

__all__ = [
    "gen_transcripts",
    "gen_transcript_changes",
    "gen_tool_events",
    "inject_collection_op",
]
