"""Structured-Streaming extension (SURVEY.md §2.10).

The reference pipeline is batch; the streaming path is the incremental-crawl
extension: new page files arriving in a directory are picked up by a file
source, run through the same extract→assign→clip pipeline per micro-batch,
and appended to the tile store. Watermarked windowed aggregations and
stateful dedup cover the events-stream shapes in the driver testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.synth import PAGES_SCHEMA


def incremental_tiles(spark: SparkSession, pages_dir: str, out_dir: str,
                      checkpoint_dir: str, zooms: list[int]):
    """readStream over a pages directory → per-batch tile pipeline → append.

    foreachBatch reuses the exact batch operators (one code path, two
    execution modes) — the idiomatic Spark answer to incremental refresh.
    """
    from ..operators.extract import parse_geo_features, validity_filter
    from ..operators.tiles import build_tile_features

    stream = (spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir))

    def process(batch: DataFrame, batch_id: int) -> None:
        feats = validity_filter(parse_geo_features(batch))
        tiles = build_tile_features(feats, zooms)
        (tiles.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    return (stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def windowed_event_counts(events: DataFrame, window: str = "10 minutes",
                          watermark: str = "1 hour") -> DataFrame:
    """Tumbling-window counts with late-data watermark (streaming or batch)."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "sum_value"))


def sessionized_events(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based), streaming-capable."""
    return (events.withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "user_id", "n_events"))


def dedup_stream(pages: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful url dedup within the watermark (recrawl suppression)."""
    return (pages.withWatermark("warc_ts", watermark)
            .dropDuplicatesWithinWatermark(["url"]))
