package graft.tools

import org.apache.spark.sql.SparkSession
import graft.model.{DocsGen, DocsGenFast}

/** Generator throughput probe: expression spec vs compiled twin, identical
  * output (DocsGenSpec equality test). Usage: GenProbe <nDocs> [cores] */
object GenProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5400000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Files.createTempDirectory("genprobe").toString
    def timeIt(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").option("compression", "zstd")
        .partitionBy("part").parquet(s"$out/$name")
      println(f"$name%-6s ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    timeIt("fast")(DocsGenFast.docs(spark, n, DocsGen.goldenScenario))
    timeIt("expr")(DocsGen.docs(spark, n, DocsGen.goldenScenario))
    timeIt("fast2")(DocsGenFast.docs(spark, n, DocsGen.goldenScenario))
    spark.stop()
  }
}
