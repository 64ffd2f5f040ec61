package graft

import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Near-dup candidate budget (round 12, verdict item 1).
  *
  * The one measured failure boundary in the repo is the mega-cluster regime
  * (BASELINE.md round-11 memory probe): a corpus where every doc has c
  * near-identical copies makes candidate pairs — and pair OUTPUT — grow as
  * c²/2, which at k=128 exhausted disk in the exact-verify sort. The budget
  * (spark.graft.neardup.maxPairsPerDoc) keeps each doc's top-m candidates by
  * overlap weight, bounding verified pairs ≤ 2·m·|docs|.
  *
  * Contract pinned here:
  *  - cap OFF (default): operator output is the exact semantics (unchanged);
  *  - cap m large: output EQUALS the uncapped operator (no silent drops);
  *  - cap m small: output is a SUBSET of the uncapped operator's pairs, with
  *    every surviving row bit-identical to its uncapped twin;
  *  - on a planted c-member duplicate cluster, the capped pair count is
  *    ≤ 2·m·c instead of c·(c-1)/2, and every cluster member still appears.
  */
class DedupCapSpec extends SparkSpec {

  private def key(r: org.apache.spark.sql.Row): (Long, Long) =
    (r.getAs[Long]("d1"), r.getAs[Long]("d2"))

  test("cap off by default: conf unset leaves neardup_pairs on the exact path") {
    assert(spark.conf.getOption(Dedup.NeardupCapConf).isEmpty)
    val viaOp = Dedup.neardupPairs(spark, sfDir).collect().map(key).toSet
    val exact = Dedup.neardupPairsAllPairs(spark, sfDir).collect().map(key).toSet
    assert(viaOp === exact)
  }

  test("large cap equals uncapped; small cap is a row-identical subset") {
    val uncapped = Dedup.neardupPairs(spark, sfDir).collect()
      .map(r => key(r) -> r.toSeq).toMap
    assert(uncapped.nonEmpty, "fixture must have true near-dup pairs")
    val large = Dedup.neardupPairsCapped(spark, sfDir, 10000).collect()
      .map(r => key(r) -> r.toSeq).toMap
    assert(large === uncapped)
    val small = Dedup.neardupPairsCapped(spark, sfDir, 1).collect()
      .map(r => key(r) -> r.toSeq).toMap
    assert(small.nonEmpty)
    small.foreach { case (k, row) =>
      assert(uncapped.contains(k), s"capped pair $k not in uncapped output")
      assert(uncapped(k) === row, s"capped row for $k differs from uncapped")
    }
  }

  test("registered llm_neardup_capped equals the forced entry point below the prefix threshold") {
    // below NeardupPrefixMinShingles both rank by full shared-shingle count,
    // so the oracled registered row and the conf-path formulation coincide
    val reg = Dedup.neardupCapped(spark, sfDir).collect().map(_.toSeq)
    val forced = Dedup.neardupPairsCapped(spark, sfDir, Dedup.NeardupCapDefaultM)
      .collect().map(_.toSeq)
    assert(reg === forced)
  }

  test("conf-driven cap inside the registered operator matches the forced entry point") {
    spark.conf.set(Dedup.NeardupCapConf, "2")
    try {
      val viaConf = Dedup.neardupPairs(spark, sfDir).collect().map(_.toSeq)
      val forced = Dedup.neardupPairsCapped(spark, sfDir, 2).collect().map(_.toSeq)
      assert(viaConf === forced)
    } finally spark.conf.unset(Dedup.NeardupCapConf)
  }

  test("cap composes with MinHash-LSH: capped ⊆ uncapped, default path unchanged") {
    val uncapped = Dedup.neardupMinhashLsh(spark, sfDir).collect()
      .map(r => key(r) -> r.toSeq).toMap
    assert(uncapped.nonEmpty)
    spark.conf.set(Dedup.NeardupCapConf, "1")
    try {
      val capped = Dedup.neardupMinhashLsh(spark, sfDir).collect()
        .map(r => key(r) -> r.toSeq).toMap
      assert(capped.nonEmpty)
      capped.foreach { case (k, row) =>
        assert(uncapped.contains(k) && uncapped(k) === row,
          s"capped LSH pair $k missing or differs from uncapped")
      }
    } finally spark.conf.unset(Dedup.NeardupCapConf)
    val again = Dedup.neardupMinhashLsh(spark, sfDir).collect()
      .map(r => key(r) -> r.toSeq).toMap
    assert(again === uncapped, "unsetting the conf must restore exact LSH semantics")
  }

  test("10 seeded random corpora: capped ⊆ uncapped, rows identical, bound holds") {
    import spark.implicits._
    val vocab = Array("alpha", "beta", "gamma", "delta", "kappa", "sigma",
      "omega", "zeta", "theta", "lambda", "mu", "nu")
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // base docs of 8-20 tokens; each spawns 0-5 near-copies with the last
      // token swapped (random cluster sizes, random overlap elsewhere)
      val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      var id = 0L
      (0 until 12).foreach { _ =>
        val base = Seq.fill(8 + rnd.nextInt(13))(vocab(rnd.nextInt(vocab.length)))
        (0 to rnd.nextInt(6)).foreach { c =>
          docs += ((id, (base.init :+ s"tail$c").mkString(" ")))
          id += 1
        }
      }
      val df = docs.toSeq.map { case (i, t) =>
        (i, t, "en", "src0", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val dir = java.nio.file.Files.createTempDirectory(s"graft_capprop$seed").toString
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      try {
        val uncapped = Dedup.neardupPairsAllPairs(spark, dir).collect()
          .map(r => key(r) -> r.toSeq).toMap
        val m = 1 + rnd.nextInt(3)
        val capped = Dedup.neardupPairsCapped(spark, dir, m).collect()
          .map(r => key(r) -> r.toSeq).toMap
        capped.foreach { case (k, row) =>
          assert(uncapped.contains(k), s"seed $seed: capped pair $k not in uncapped")
          assert(uncapped(k) === row, s"seed $seed: row for $k differs")
        }
        assert(capped.size <= 2 * m * docs.size,
          s"seed $seed: ${capped.size} pairs exceed the 2·m·|docs| bound")
      } finally deleteDir(dir)
    }
  }

  test("planted mega-cluster: capped output is linear in cluster size, not quadratic") {
    import spark.implicits._
    val c = 12 // one duplicate cluster of 12 near-identical docs
    val base = "key agg row scan hash sort join group shuffle spill " * 4
    val docs = (0 until c).map { i =>
      // one trailing token differs per copy — the old probe transform's
      // shape: J ≈ 1 between every pair, a c-member clique
      (i.toLong, s"$base tag$i", "en", "src0", (base.length + 6).toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_mega").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val uncapped = Dedup.neardupPairs(spark, dir).collect().map(key).toSet
      assert(uncapped.size === c * (c - 1) / 2, "clique expected uncapped")
      val m = 2
      val capped = Dedup.neardupPairsCapped(spark, dir, m).collect().map(key).toSet
      assert(capped.subsetOf(uncapped))
      assert(capped.size <= 2 * m * c, s"budget violated: ${capped.size} pairs")
      assert(capped.size < uncapped.size, "cap must actually prune a clique")
      val touched = capped.flatMap(p => Seq(p._1, p._2))
      assert(touched === (0L until c.toLong).toSet,
        "every cluster member keeps at least one partner")
    } finally deleteDir(dir)
  }

  test("mega-clique guardrail: diagnostic fires on a planted cluster, silent on the fixture") {
    import spark.implicits._
    val c = 12
    val base = "key agg row scan hash sort join group shuffle spill " * 4
    val docs = (0 until c).map { i =>
      (i.toLong, s"$base tag$i", "en", "src0", (base.length + 6).toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_guard").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      // budget 50 pairs/doc sits between the regimes: the 12-member clique
      // shares ~40 5-gram shingles per pair (~200+ candidate pairs per doc),
      // the fixture corpus's shared-shingle bound is a couple per doc
      val mega = Dedup.shingles(spark, dir)
      assert(Dedup.candidateVolumeDiagnostic(mega, c, 50).isDefined,
        "planted mega-cluster must trip the enumeration bound")
      val fixture = Dedup.shingles(spark, sfDir)
      val nDocs = Tables.countOf(spark, sfDir, "documents")
      assert(Dedup.candidateVolumeDiagnostic(fixture, nDocs, 50).isEmpty,
        "fixture corpus must stay inside the enumeration budget")
      // fail-fast wiring: with the conf set, the operator-side guard throws
      // the actionable message instead of letting a verify join run away
      spark.conf.set(Dedup.NeardupFailPairsPerDocConf, "50")
      try {
        val e = intercept[IllegalStateException] {
          Dedup.guardCandidateVolume(spark, dir, mega)
        }
        assert(e.getMessage.contains(Dedup.NeardupCapConf),
          "diagnostic must name the budget conf as the fix")
      } finally spark.conf.unset(Dedup.NeardupFailPairsPerDocConf)
    } finally deleteDir(dir)
  }
}
