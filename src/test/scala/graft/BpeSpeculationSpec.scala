package graft

import org.apache.spark.sql.functions._
import graft.llm.TextAnalysis

/** Round 20: the BPE merge chain speculates multiple merges off ONE initial
  * pair-count job, guarded by a non-interaction proof, and falls back to the
  * exact sequential per-round jobs whenever the guard cannot certify
  * equality. These corpora are built to BREAK naive speculation — the
  * sequential reference (java.lang.String.replace, the same literal
  * left-to-right resume-after-replacement semantics both engines use) is
  * the pin:
  *
  *  - `overlap`: the pre-merge rank-2 pair shares a symbol with the top
  *    merge and is destroyed by it; the true round-2 top is a pair CREATED
  *    by merge 1 (exists only post-merge).
  *  - `residual`: overlapping repeats (` a b a b `) leave a residual count
  *    of the merged pair itself, which wins round 2 again over a
  *    symbol-disjoint runner-up.
  *  - `disjoint`: fully non-interacting merges — the speculation's accept
  *    path — must also equal the reference.
  */
class BpeSpeculationSpec extends SparkSpec {

  /** Sequential BPE reference over a bag of words (weight = occurrences). */
  private def reference(words: Seq[(String, Long)]): Seq[(Int, String, String, Long, Long, Long)] = {
    var reprs: Map[String, Long] = words
      .groupBy { case (w, _) => " " + w.toCharArray.mkString(" ") + " " }
      .map { case (repr, xs) => repr -> xs.map(_._2).sum }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long, Long)]
    for (r <- 1 to TextAnalysis.BpeRounds) {
      val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((repr, cnt) <- reprs) {
        val tk = repr.trim.split(" ")
        for (i <- 0 until tk.length - 1)
          pairCnt((tk(i), tk(i + 1))) = pairCnt.getOrElse((tk(i), tk(i + 1)), 0L) + cnt
      }
      if (pairCnt.nonEmpty) {
        val ((s1, s2), cnt) = pairCnt.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
        reprs = reprs.groupBy { case (repr, _) => repr.replace(s" $s1 $s2 ", s" $s1$s2 ") }
          .map { case (repr, xs) => repr -> xs.values.sum }
        val totalSyms = reprs.map { case (repr, c) => repr.trim.split(" ").length * c }.sum
        val vocab = reprs.keys.flatMap(_.trim.split(" ")).toSet.size.toLong
        out += ((r, s1, s2, cnt, totalSyms, vocab))
      }
    }
    out.toSeq
  }

  private def writeCorpus(dir: String, words: Seq[(String, Long)]): Unit = {
    val docs = words.zipWithIndex.flatMap { case ((w, n), i) =>
      // one doc per occurrence keeps the weighting identical to word counts
      (0L until n).map(k => (i * 1000000L + k, w))
    }
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def check(tag: String, words: Seq[(String, Long)],
                    expectSpeculated: Int): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"bpe_spec_$tag").toString
    try {
      writeCorpus(dir, words)
      val got = TextAnalysis.bpeTrain(spark, dir).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
                   r.getLong(4), r.getLong(5))).toSeq
      assert(got == reference(words), s"corpus '$tag' diverged from the sequential reference")
      assert(TextAnalysis.lastSpeculatedMerges == expectSpeculated,
        s"corpus '$tag': expected $expectSpeculated speculated merges, " +
        s"got ${TextAnalysis.lastSpeculatedMerges}")
    } finally deleteDir(dir)
  }

  test("overlap corpus: rank-2 pair is destroyed by merge 1; created pair wins round 2") {
    // C0: (a,b)=300 tied with (b,d)=300, tiebreak picks (a,b); merging it
    // destroys every (b,d) occurrence and creates (ab,d)=300 — naive
    // speculation would merge the now-count-0 (b,d).
    check("overlap", Seq("abd" -> 300L, "pq" -> 70L, "xy" -> 40L), expectSpeculated = 1)
  }

  test("residual corpus: the resume quirk keeps the merged pair on top for round 2") {
    // ` a b a b ` merges only its first occurrence per round; residual
    // (a,b)=90 ties the created (ab,a)=90 and wins the round-2 tiebreak —
    // the same pair merges twice in a row.
    check("residual", Seq("abab" -> 90L, "pq" -> 80L, "xy" -> 40L), expectSpeculated = 1)
  }

  test("disjoint corpus: the speculation accept path equals the reference") {
    check("disjoint", Seq("ab" -> 100L, "pq" -> 90L, "xy" -> 80L, "mn" -> 10L), expectSpeculated = 3)
  }

  test("fixture corpus: speculation equals the sequential reference end-to-end") {
    // the sf0.001 fixture's merges are symbol-disjoint (the accept path);
    // LlmSpec pins the same equality against its own recompute — this row
    // exists so a guard regression cannot hide behind tiny synthetic bags
    val words = llm.Dedup.tokens(spark, sfDir)
      .select(explode(col("toks")).as("w")).groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val got = TextAnalysis.bpeTrain(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).toSeq
    assert(got == reference(words))
  }
}
