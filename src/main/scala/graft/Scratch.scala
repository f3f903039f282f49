package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement experiments (deleted before round close). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val raw = spark.read.parquet(s"$d/documents.parquet")
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), explode(filter(split(col("text"), "\\s+"),
        t => length(t) > 0)).as("word"))
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    noop(toks(raw)) // warm
    for (np <- Seq("32", "8", "4", "2")) {
      spark.conf.set("spark.sql.shuffle.partitions", np)
      for (i <- 1 to 3) time(s"agg-p$np-$i") { noop(toks(raw)) }
      // two chained shuffles: agg then re-agg by word
      for (i <- 1 to 2) time(s"agg2-p$np-$i") { noop(toks(raw).groupBy(col("word")).agg(sum(col("tf")))) }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    for (fl <- Seq("16k", "1m", "64k")) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", fl)
      for (i <- 1 to 3) time(s"agg-fl$fl-$i") { noop(toks(raw)) }
      for (i <- 1 to 2) time(s"agg2-fl$fl-$i") { noop(toks(raw).groupBy(col("word")).agg(sum(col("tf")))) }
    }
    spark.stop()
  }
}
