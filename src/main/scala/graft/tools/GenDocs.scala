package graft.tools

import org.apache.spark.sql.SparkSession
import graft.model.{DocsGen, DocsGenFast}

/** Write a golden-scenario docs table for probes.
  * Usage: GenDocs <outDir> <nDocs> [cores] */
object GenDocs {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val n = args(1).toLong
    val cores = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    DocsGenFast.docs(spark, n, DocsGen.goldenScenario)
      .write.mode("overwrite").option("compression", "zstd")
      .partitionBy("part").parquet(out)
    println(s"wrote $n docs to $out")
    spark.stop()
  }
}
