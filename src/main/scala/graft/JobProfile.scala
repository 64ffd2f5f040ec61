package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev-only per-job/per-stage wall-clock profiler for one registered query.
  *
  * The bench totals say WHICH query is slow; this says WHERE inside it the
  * time goes — scheduling floor vs shuffle vs compute — by listening to
  * job/stage events over a few warm passes. NOT part of the shipped library.
  *
  * Usage: JobProfile <name> [passes]   (env: SPARK_GRAFT_SF_DIR, _CPUS)
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    sys.props("graft.ann.recall") = "0"
    val name = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, start: Long, var end: Long = 0L,
                      stages: mutable.Buffer[String] = mutable.Buffer())
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageJob = mutable.Map.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs(e.jobId) = JobRec(e.jobId, e.time)
        e.stageIds.foreach(sid => stageJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = for (a <- si.submissionTime; b <- si.completionTime) yield b - a
        val rec = f"    stage ${si.stageId}%3d ${dur.getOrElse(-1L)}%5d ms " +
          f"tasks=${si.numTasks}%3d  ${si.name.take(90)}"
        jobs.get(stageJob.getOrElse(si.stageId, -1)).foreach(_.stages += rec)
      }
    })

    val fn = SparkEntry.queries(name)
    for (p <- 1 to passes) {
      jobs.clear(); stageJob.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300) // let the async listener bus drain
      println(f"== $name pass $p: $wall%.0f ms, ${jobs.size} jobs ==")
      var covered = 0L
      jobs.values.foreach { j =>
        val d = j.end - j.start
        covered += d
        println(f"  job ${j.id}%3d  $d%5d ms")
        j.stages.foreach(println)
      }
      println(f"  [job-covered $covered ms; gaps (driver/plan/analysis) ${wall - covered}%.0f ms]")
    }
    spark.stop()
  }
}
