package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool: dump `.explain("formatted")` for
  * declared queries to `plans/<round>/<name>_<tag>.txt` so plan-shape
  * claims in OPTIMIZATION_r*.md are checkable artifacts, not prose.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> [query names...]
  * (no names = all declared queries). Reads the same env contract as
  * [[Bench]] (`SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_CPUS`).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <tag> [names...]")
    val outDir = args(0)
    val tag = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    for (n <- names) {
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$outDir/${n}_$tag.txt")
        try w.println(plan) finally w.close()
        println(s"PLANDUMP ok $n")
      } catch {
        case scala.util.control.NonFatal(t) =>
          System.err.println(s"PLANDUMP FAIL $n: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
