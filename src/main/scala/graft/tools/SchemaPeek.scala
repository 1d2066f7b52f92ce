package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot diagnostic: print each testdata table's flattened (path, SQL
  * type) pairs as the engine sees them — the strings the schema-contract
  * oracle must mirror. */
object SchemaPeek {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[2]")
      .appName("schema-peek").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("orders", "documents", "events", "embeddings")) {
      val sch = spark.read.parquet(s"$dir/$t.parquet").schema
      println(s"== $t")
      graft.checks.SchemaCheck.flatten(sch).foreach { case (p, ty) => println(s"  $p -> $ty") }
    }
    spark.stop()
  }
}
