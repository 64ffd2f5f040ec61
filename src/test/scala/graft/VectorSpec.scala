package graft

import org.apache.spark.sql.functions._
import graft.llm.{AnnLsh, Similarity}
import graft.multimodal.Multimodal
import graft.plans.VectorFunctions

/** Custom vector kernel + ANN scale path + multimodal stub plumbing. */
class VectorSpec extends SparkSpec {

  test("codegen DotProduct is bit-identical to the HOF fold formulation") {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val both = e.select(
      Similarity.dotHof(col("embedding"), col("embedding")).as("hof"),
      VectorFunctions.dot(col("embedding"), col("embedding")).as("native"))
    val mismatches = both.where(col("hof") =!= col("native")).count()
    assert(mismatches == 0)
  }

  test("LSH ANN finds a usable share of the exact top-5 (recall)") {
    val exact = Similarity.simsearchTopk(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = AnnLsh.annTopk(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // random-hyperplane buckets on near-random vectors: expect modest but
    // real recall; and everything ANN returns must be a valid neighbor pair
    val recall = ann.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.05, s"recall=$recall")
    ann.foreach { case (q, c) => assert(q != c) }
  }

  test("LSH bucket join examines far fewer pairs than brute force") {
    val sig = AnnLsh.signatures(spark, sfDir)
    val total = sig.count()
    val bucketPairs = sig.groupBy("bucket").count()
      .agg(sum(col("count") * col("count"))).head.getLong(0)
    assert(bucketPairs < total * total / 4,
      s"bucketed pair volume $bucketPairs vs all-pairs ${total * total}")
  }

  test("multimodal decode stub is deterministic and preserves cardinality") {
    val a = Multimodal.queries("mm_decode_stub")(spark, sfDir).collect()
    val b = Multimodal.queries("mm_decode_stub")(spark, sfDir).collect()
    assert(a.sameElements(b))
    assert(a.length == Tables.documents(spark, sfDir).count())
    // identical payloads → identical checksums (exact-dup docs exist)
    val byChecksum = a.groupBy(_.getLong(5)).view.mapValues(_.length)
    assert(byChecksum.values.sum == a.length)
  }
}
