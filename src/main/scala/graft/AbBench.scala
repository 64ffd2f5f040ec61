package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Dev-only A/B decomposition harness (round-8 verdict item 8): split
  * `project_select`'s cost into scan / derived-column compute / global sort /
  * output materialization, same session config and best-of-N protocol as
  * [[Bench]], so the "persistently ≥2× warm DuckDB" ratio can be attributed
  * to plan fat vs the irreducible work both engines share. NOT part of the
  * shipped library surface and not registered in [[SparkEntry]].
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.Relational
    val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val cleanVariants: Seq[(String, SparkSession => DataFrame)] = Seq(
      // the registered query: scan → derive → global sort → materialize
      "full" -> (s => Relational.projectSelect(s, sfDir)),
      // drop the global sort: scan → derive → materialize
      "no_sort" -> (s => Relational.projectSelectNoSort(s, sfDir)),
      // sort without the derived columns: scan keys → global sort
      "sort_keys_only" -> (s => Tables.lineitem(s, sfDir)
        .select(keys.map(col): _*)
        .orderBy(keys.head, keys.tail: _*)),
      // bare scan of the same 4 key columns
      "scan_keys_only" -> (s => Tables.lineitem(s, sfDir)
        .select(keys.map(col): _*))
    )

    // warmup (JIT + page cache), untimed
    cleanVariants.foreach { case (_, q) =>
      try q(spark).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val attempts = 6
    val timed = scala.collection.mutable.Map.empty[String, List[Double]]
    for (pass <- 1 to attempts; (n, q) <- cleanVariants) {
      val _ = pass
      val t0 = System.nanoTime()
      q(spark).write.format("noop").mode("overwrite").save()
      timed(n) = ((System.nanoTime() - t0) / 1e9) :: timed.getOrElse(n, Nil)
    }
    val out = cleanVariants.map { case (n, _) =>
      "\"" + n + "\":" + f"${timed(n).min}%.3f"
    }.mkString("{", ",", "}")
    println(s"""{"ab":"project_select","best_of":$attempts,"sf":"$sfDir","variants":$out}""")
    spark.stop()
  }
}
