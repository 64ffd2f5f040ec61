package graft

import org.apache.spark.sql.SparkSession

/** Dev check for the round-17 IVF locality advisory on REAL probe corpora
  * (the synthetic fire/silent regimes are spec-pinned in VectorSpec; this
  * main closes the verdict's done-criteria on the actual 64× corpora):
  * prints the derived probe count and the advisory outcome per corpus dir.
  *
  * Usage: runMain graft.IvfAdvisoryCheck <dir> [<dir> ...]
  * Or with SPARK_GRAFT_SCALE_BUILD_K=<k> set, builds/reuses the k× corpus
  * via [[ScaleProbe.buildCorpus]] first (honors SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_SCALE_DIR / SPARK_GRAFT_SCALE_TABLES /
  * SPARK_GRAFT_SCALE_TRANSFORM / SPARK_GRAFT_SCALE_REUSE) and checks its
  * k× dir. NOT part of the shipped library surface. */
object IvfAdvisoryCheck {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Confs.applyExtraConf(spark)
    val dirs: Seq[String] = sys.env.get("SPARK_GRAFT_SCALE_BUILD_K") match {
      case Some(k) =>
        val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val scratch = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scaleprobe")
        Seq(ScaleProbe.buildCorpus(spark, base, k.toInt, scratch)._2)
      case None => args.toSeq
    }
    // timing runs measure the ANN path alone, same rationale as graft.Bench
    sys.props("graft.ann.recall") = "0"
    dirs.foreach { d =>
      val stride = graft.llm.AnnIvf.strideFor(spark, d)
      val np = graft.llm.AnnIvf.numProbeFor(spark, d, stride)
      val n = Tables.countOf(spark, d, "embeddings")
      val t0 = System.nanoTime()
      val res = graft.llm.AnnIvf.adviseLocality(spark, d)
      println(f"[ivfadvise] dir=$d n=$n stride=$stride derivedNp=$np " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs -> " +
        res.fold("SILENT (derived np earning its cost)")(m => s"FIRES: $m"))
      // SPARK_GRAFT_IVF_TIME=1: round-18 apply-mode end-to-end measurement —
      // the full registered probe (index + probe + rank) timed under
      // advise (derived np) vs apply (np=2 when sampled agreement is 1.0)
      if (sys.env.get("SPARK_GRAFT_IVF_TIME").contains("1")) {
        def timed(mode: Option[String]): Double = {
          mode match {
            case Some(v) => spark.conf.set(graft.llm.AnnIvf.AutoProbeConf, v)
            case None => spark.conf.unset(graft.llm.AnnIvf.AutoProbeConf)
          }
          val t = System.nanoTime()
          graft.llm.AnnIvf.ivfTopk(spark, d)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t) / 1e9
        }
        timed(None) // warmup (JIT + page cache + advisory memo)
        val adv = math.min(timed(None), timed(None))
        val app = math.min(timed(Some("apply")), timed(Some("apply")))
        spark.conf.unset(graft.llm.AnnIvf.AutoProbeConf)
        val effNp = {
          spark.conf.set(graft.llm.AnnIvf.AutoProbeConf, "apply")
          try graft.llm.AnnIvf.effectiveNumProbe(spark, d, stride, 5)
          finally spark.conf.unset(graft.llm.AnnIvf.AutoProbeConf)
        }
        println(f"[ivfadvise] timed (best-of-2) advise=$adv%.2fs " +
          f"apply=$app%.2fs applyNp=$effNp (derived $np)")
      }
    }
    spark.stop()
  }
}
