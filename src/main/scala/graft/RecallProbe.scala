package graft

import org.apache.spark.sql.functions._

/** Dev-only ANN recall-at-scale audit (round-15 validation item 1).
  *
  * [[ScaleProbe]] deliberately times the ANN operators with the recall
  * audit OFF (timing ANN + the brute-force scan would charge the index the
  * cost it exists to avoid), so through round 14 recall had only ever been
  * read at fixture scale (500-2000 vectors, VectorSpec). This probe is the
  * missing half: scale the embeddings corpus k× with [[ScaleProbe]]'s
  * shape-preserving transform, run `llm_simsearch_lsh` / `llm_simsearch_ivf`
  * with the recall audit ON, and READ the per-query `recall_at_k` column the
  * operators already emit — aggregated to mean / p10 / min over the full
  * scaled query set (label=0, scales with the corpus).
  *
  * The open question this answers: the √n sizing (LSH planes = ⌈log₂√n⌉,
  * IVF stride ≈ √n) provably keeps RUNTIME linear, but both shrink the
  * probed fraction of the corpus as it grows (one bucket of ~√n, two cells
  * of ~√n), so recall could decay with scale. Corpus note: the k× transform
  * perturbs one coordinate by i·1e-4 per copy, so every vector gains k-1
  * near-identical cross-copy twins — near-dup-heavy, the easy-recall regime
  * a crawl corpus actually has; the probe measures the sizing's recall
  * trend, not an adversarial worst case (recorded with the numbers in
  * BASELINE.md).
  *
  * Usage: runMain graft.RecallProbe [k,k,...] [name,name,...]
  * Env: SPARK_GRAFT_SF_DIR (base fixtures, default sf0.1),
  *      SPARK_GRAFT_SCALE_DIR (scratch, default /tmp/graft_scaleprobe),
  *      SPARK_GRAFT_SCALE_TABLES (default embeddings — the only table the
  *      ANN rows read; everything else lands 1×), SPARK_GRAFT_SCALE_REUSE.
  * NOT part of the shipped library surface.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args(0).split(",").map(_.trim.toInt).toSeq
             else Seq(64, 128)
    val names = if (args.length > 1) args(1).split(",").map(_.trim).toSeq
                else Seq("llm_simsearch_lsh", "llm_simsearch_ivf")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scratch = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scaleprobe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // recall stays ON — reading it is this probe's whole purpose; the exact
    // ground-truth kernel sizes its own blocks adaptively (vectorBlocksFor:
    // B = ⌈n/4096⌉ when spark.graft.vector.blocks is unset)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same dev hook as graft.Bench/ScaleProbe: "k=v,k=v" session-conf
    // overrides — here the recall-vs-knob A/Bs (lsh.multiProbe, ivf.numProbe)
    graft.Confs.applyExtraConf(spark)
    if (sys.env.get("SPARK_GRAFT_SCALE_TABLES").isEmpty)
      sys.error("set SPARK_GRAFT_SCALE_TABLES (normally =embeddings): " +
        "building every table k× for an embeddings-only probe wastes minutes")
    // reading recall_at_k IS this probe's purpose — an inherited audit-off
    // switch (e.g. from a ScaleProbe shell) would otherwise surface as an
    // opaque missing-column AnalysisException deep in the first query
    // (round-16 ADVICE: mirror the SCALE_TABLES guard)
    if (sys.props.get("graft.ann.recall").orElse(
          sys.env.get("SPARK_GRAFT_ANN_RECALL")).contains("0"))
      sys.error("the recall audit is disabled (graft.ann.recall=0 / " +
        "SPARK_GRAFT_ANN_RECALL=0) — unset it: RecallProbe reads recall_at_k")

    case class Stat(scale: Int, n: Long, nQueries: Long, lost: Long,
                    mean: Double, p10: Double, min: Double, secs: Double)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Stat)]
    def audit(name: String, dir: String, scale: Int): Unit = {
      val t0 = System.nanoTime()
      // one recall value per query (the column repeats across the k result
      // rows of a query), RIGHT-joined onto the full query set: a query
      // whose bucket/cells hold no other member emits ZERO result rows, so
      // aggregating only emitted rows would silently drop exactly the
      // worst-recall (recall=0) queries from the audit (seen at 1×: 49 of
      // 50 LSH queries emitted). Aggregate exactly — the set is ≤ ~25k rows.
      val allQ = Tables.embeddings(spark, dir).where(col("label") === 0)
        .select(col("vec_id").as("q_id"))
      val per = SparkEntry.queries(name)(spark, dir)
        .select(col("q_id"), col("recall_at_k")).distinct()
        .join(allQ, Seq("q_id"), "right")
        .select(coalesce(col("recall_at_k"), lit(0.0)).as("r"),
                col("recall_at_k").isNull.cast("long").as("lostq"))
        .agg(count(lit(1)).as("nq"), sum("lostq").as("lost"),
             avg("r").as("mean"),
             expr("percentile(r, 0.10)").as("p10"), min("r").as("min"))
        .head()
      val secs = (System.nanoTime() - t0) / 1e9
      val n = Tables.countOf(spark, dir, "embeddings")
      val stat = Stat(scale, n, per.getLong(0), per.getLong(1),
                      per.getDouble(2), per.getDouble(3), per.getDouble(4), secs)
      rows += name -> stat
      println(f"[recall] $name%-20s k=$scale%4d n=$n%8d q=${stat.nQueries}%6d " +
        f"lost=${stat.lost}%d mean=${stat.mean}%.4f p10=${stat.p10}%.4f " +
        f"min=${stat.min}%.4f (${secs}%.1f s incl. exact ground truth)")
    }

    var didOne = false
    ks.foreach { k =>
      val (oneDir, kDir) = ScaleProbe.buildCorpus(spark, base, k, scratch)
      if (!didOne) { names.foreach(audit(_, oneDir, 1)); didOne = true }
      names.foreach(audit(_, kDir, k))
    }
    println(f"%n== RecallProbe base=$base ==")
    println(f"${"query"}%-22s ${"k"}%5s ${"n"}%9s ${"queries"}%8s ${"lost"}%5s " +
      f"${"mean"}%7s ${"p10"}%7s ${"min"}%7s ${"secs"}%7s")
    rows.foreach { case (name, s) =>
      println(f"$name%-22s ${s.scale}%5d ${s.n}%9d ${s.nQueries}%8d ${s.lost}%5d " +
        f"${s.mean}%7.4f ${s.p10}%7.4f ${s.min}%7.4f ${s.secs}%7.1f")
    }
    spark.stop()
  }
}
