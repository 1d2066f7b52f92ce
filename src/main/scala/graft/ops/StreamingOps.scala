package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming surface of the engine: the same windowed validation
  * aggregations, expressed over an unbounded source with watermarks. The
  * reference is pure batch (each HTTP call = one complete batch,
  * detector_api/app/api.py:27); this extends the engine to continuous
  * ingestion — the "window" maps to an event-time tumbling window instead of
  * a static partition. */
object StreamingOps {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour event-time windows with a 2-hour watermark: counts and
    * value sums per (window, event_type) — the streaming twin of
    * TpchQueries.eventsHourlyAgg. */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_v"))
      .select(col("w.start").as("hr"), col("event_type"), col("cnt"), col("sum_v"))

  /** Run the streaming aggregation over a parquet path as a file stream,
    * draining everything available into an in-memory table; returns the
    * result. (The local harness for tests/demos — a deployment would point
    * readStream at the live landing zone and writeStream at the results
    * table.) */
  def runFileStream(spark: SparkSession, parquetPath: String,
                    queryName: String = "stream_out"): DataFrame = {
    // file-stream sources need a DIRECTORY; stage a single-file input
    val p = java.nio.file.Paths.get(parquetPath)
    val dir =
      if (java.nio.file.Files.isDirectory(p)) parquetPath
      else {
        val d = java.nio.file.Files.createTempDirectory("graft-stream")
        java.nio.file.Files.copy(p, d.resolve(p.getFileName))
        d.toString
      }
    val src = spark.readStream.schema(eventSchema).parquet(dir)
    val q: StreamingQuery = hourlyEventCounts(src)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
