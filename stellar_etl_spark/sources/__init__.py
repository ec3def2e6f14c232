from stellar_etl_spark.sources.transcripts import (
    TRANSCRIPTS_CTE,
    TRANSCRIPT_SCHEMA,
    load_transcripts,
)

__all__ = ["TRANSCRIPTS_CTE", "TRANSCRIPT_SCHEMA", "load_transcripts"]
