package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-19 measurement harness (optimization-guide §1.1/§7.2): dumps
  * `.explain("formatted")` for a set of registered queries to one file per
  * query, so plan claims in OPTIMIZATION_r19.md are checkable against
  * committed artifacts (plans/r19/<name>_before.txt / _after.txt).
  *
  * Usage: `runMain graft.PlanSnap <sfDir> <outDir> <suffix> [names...]`
  * (names default to Bench.headline). Unlike PlanDump (which curates
  * PLANS.md prose), this is a raw snapshot tool: same session config as
  * Bench so the captured initial plans match what the benchmark executes.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r19")
    val suffix = args.lift(2).getOrElse("before")
    val names =
      if (args.length > 3 && args(3) == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 3) args.drop(3).toSeq
      else Bench.headline
    sys.props("graft.ann.recall") = "0"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
        println(s"[plansnap] wrote $outDir/${n}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plansnap] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
