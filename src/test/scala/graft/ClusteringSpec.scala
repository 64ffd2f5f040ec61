package graft

import org.apache.spark.sql.functions._
import graft.llm.{Clustering, Similarity, TextAnalysis}
import graft.functions.Classics

/** Structural checks for the round-4 additions: k-means, k-NN graph, DSIR
  * weights, perplexity buckets, TeraValidate, mode. Value-level equality is
  * covered by the DuckDB oracle gate; these pin the properties the oracle
  * cannot express (invariants, monotonicity, determinism across runs). */
class ClusteringSpec extends SparkSpec {

  test("kmeans: clusters partition the corpus, inertia decreases vs 1 iter") {
    val out = Clustering.kmeans(spark, sfDir).collect()
    assert(out.length <= Clustering.K && out.nonEmpty)
    val n = Tables.embeddings(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == n) // every vector assigned once
    out.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) >= 0L) // inertia_micro nonneg
    }
  }

  test("kmeans is deterministic across runs") {
    // registered sort-free (round 15): impose the compare order in-test
    val a = Clustering.kmeans(spark, sfDir).orderBy("cid").collect().toSeq
    val b = Clustering.kmeans(spark, sfDir).orderBy("cid").collect().toSeq
    assert(a == b)
  }

  test("knn graph: K edges per node, scores sorted desc, mutual is symmetric") {
    val edges = Similarity.knnGraph(spark, sfDir).collect()
    val bySrc = edges.groupBy(_.getLong(0))
    bySrc.foreach { case (_, es) =>
      assert(es.length == Similarity.KnnGraphK)
      val scores = es.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
    // mutual flag is consistent with actual reverse-edge presence
    val set = edges.map(r => (r.getLong(0), r.getLong(2))).toSet
    edges.foreach { r =>
      assert(r.getBoolean(4) == set.contains((r.getLong(2), r.getLong(0))))
    }
  }

  test("blocked knn graph equals the exact all-pairs graph (the promised swap)") {
    // the registered operator generates candidates from the blocked exact
    // per-(node, block) top-k pass; the all-pairs formulation is the
    // specification it must reproduce — structurally guaranteed (block-local
    // exact top ⊇ global top), and pinned here against implementation bugs
    // registered sort-free (round 15): impose the compare order in-test
    val blocked = Similarity.knnGraph(spark, sfDir).orderBy("src", "rk").collect().toSeq
    val exact = Similarity.knnGraphExact(spark, sfDir).orderBy("src", "rk").collect().toSeq
    assert(blocked == exact)
  }

  test("knn graph: a zero-norm vector never floats NaN to the top of a shortlist") {
    // ‖v‖=0 has no defined cosine; without the guard the score is NaN and
    // Spark's descending sort puts NaN ABOVE every real double, filling that
    // node's (and its neighbors') shortlists with arbitrary edges. The guard
    // scores such pairs -1. The fixtures contain no zero vectors, so this
    // builds a copy of the corpus with one injected — the graph must stay
    // NaN-free, keep K edges per node, and rank the zero vector's edges by
    // the -1 sentinel (ties broken by dst id, deterministically).
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_zn").toString
    val dim = Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.size(col("embedding")))
      .head.getInt(0)
    val zeroId = 1000000L // even → inside knnGraph's vec_id % 2 = 0 subset
    val zero = Seq((zeroId, Array.fill(dim)(0.0f), 9))
      .toDF("vec_id", "embedding", "label")
    Tables.embeddings(spark, sfDir).unionByName(zero)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val edges = Similarity.knnGraph(spark, tmp).collect()
    assert(edges.forall(r => !r.getDouble(3).isNaN), "NaN score leaked")
    // the zero vector still gets exactly K edges, all at the -1 sentinel,
    // deterministically the lowest dst ids (window tiebreak)
    val zn = edges.filter(_.getLong(0) == zeroId)
    assert(zn.length == Similarity.KnnGraphK)
    assert(zn.forall(_.getDouble(3) == -1.0), zn.mkString(","))
    // and no OTHER node lists the zero vector among its top-K real scores
    val others = edges.filter(r => r.getLong(0) != zeroId && r.getLong(2) == zeroId)
    assert(others.forall(_.getDouble(3) == -1.0),
      s"zero vector outranked real neighbors: ${others.mkString(",")}")
  }

  test("dsir weights: target-source docs score higher on average") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source")
    val w = TextAnalysis.dsirWeights(spark, sfDir).join(docs, "doc_id")
    val avg = w.groupBy(col("source") === "src0")
      .agg(org.apache.spark.sql.functions.avg(col("avg_logratio")))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    // the importance weight must separate the target distribution from the
    // raw pool — that is the entire point of DSIR's log-likelihood ratio
    assert(avg(true) > avg(false),
      s"target avg ${avg(true)} !> raw avg ${avg(false)}")
  }

  test("perplexity buckets: 3 per language, tercile sizes near-equal") {
    val b = TextAnalysis.perplexityBucket(spark, sfDir).collect()
    b.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(Array(1, 2, 3)), lang)
      val sizes = rows.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$lang ntile sizes ${sizes.toSeq}")
    }
  }

  test("pagerank: top-50 desc, ranks positive, total mass near conservation") {
    val out = Clustering.pagerank(spark, sfDir).collect()
    assert(out.length == 50)
    val ranks = out.map(_.getLong(1))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    // with damping 0.85 every rank sits in [0.15, ...]·1e6
    assert(ranks.forall(_ >= 150000L))
    // a kNN graph is far from regular → PageRank must actually spread mass
    assert(ranks.distinct.length > 10)
  }

  test("semdedup drops are a subset of the all-pairs embedding near-dups") {
    val clustered = Clustering.semdedup(spark, sfDir)
      .where(col("is_dup")).collect().map(_.getLong(0)).toSet
    val full = Similarity.neardupEmbedding(spark, sfDir)
      .where(col("is_dup")).collect().map(_.getLong(0)).toSet
    // within-cluster pairs ⊆ all pairs, so the leader rule can only drop a
    // subset — that subset relationship IS SemDeDup's recall trade
    assert(clustered.subsetOf(full), s"extra drops: ${clustered -- full}")
    assert(clustered.nonEmpty)
  }

  test("CMS heavy hitters: estimate is an upper bound and tight for top tokens") {
    val out = graft.llm.Sketches.heavyHittersCms(spark, sfDir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      // the count-min guarantee: never underestimate
      assert(r.getLong(2) >= r.getLong(1), s"underestimate on ${r.getString(0)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // d=4 rows × 251 buckets on a ~10⁴-token corpus: the top hitters'
    // relative error should be small (their own mass dominates the bucket)
    val top = out.head
    assert(top.getLong(3).toDouble / top.getLong(1) < 0.5,
      s"top-token overestimate ${top.getLong(3)} vs exact ${top.getLong(1)}")
  }

  test("merge upsert: matched keys update, unseen key inserts") {
    val out = graft.sources.Sources.sinkMergeUpsert(spark, sfDir).collect()
    val byAction = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(byAction("insert") == 1) // exactly the synthetic unseen key
    assert(out.filter(_.getString(2) == "insert").head.getLong(0) == 990L)
    assert(byAction.getOrElse("update", 0) > 0)
    // nation keys survive; no key lost or duplicated by the merge
    val n = Tables.nation(spark, sfDir).count()
    assert(out.length == n + 1)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
  }

  test("pii scrub: every planted email/phone/ip is counted and redacted") {
    val out = TextAnalysis.piiScrub(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).count()
    assert(out.length == n)
    out.foreach { r =>
      assert(r.getInt(1) == 1 && r.getInt(2) == 1 && r.getInt(3) == 1,
        s"doc ${r.getLong(0)}: counts ${(r.getInt(1), r.getInt(2), r.getInt(3))}")
    }
  }

  test("doc chunks: strided starts cover every token, lengths capped") {
    val rows = TextAnalysis.docChunks(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_.getInt(1))
      // starts advance by exactly the stride, beginning at token 1
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(2) == 1L + i.toLong * TextAnalysis.ChunkStride)
        assert(r.getLong(3) >= 1 && r.getLong(3) <= TextAnalysis.ChunkSize)
      }
      // with stride < size, each next chunk starts inside or adjacent to
      // the previous one's span — no token gap anywhere
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) <= a.getLong(2) + a.getLong(3), s"gap after $a")
        case _ => ()
      }
    }
  }

  test("knn triangles: counts match a brute-force recompute of the mutual graph") {
    import graft.llm.Similarity
    val mutual = Similarity.knnGraph(spark, sfDir).where(col("mutual"))
      .select("src", "dst").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
                 math.max(r.getLong(0), r.getLong(1)))).toSet
    val got = Similarity.knnTriangles(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nodes = mutual.flatMap(e => Seq(e._1, e._2))
    assert(got.map(_._1).toSet == nodes)
    def adjacent(x: Long, y: Long) = mutual((math.min(x, y), math.max(x, y)))
    got.foreach { case (n, deg, tri, coeff) =>
      assert(deg == nodes.count(m => m != n && adjacent(n, m)).toLong)
      val nbrs = nodes.filter(m => m != n && adjacent(n, m)).toSeq.sorted
      val expTri = nbrs.combinations(2).count { case Seq(x, y) => adjacent(x, y) }
      assert(tri == expTri.toLong)
      // the operator reports the 6dp-canonicalized coefficient (Dsl.round6)
      val expCoeff = if (deg < 2) 0.0
        else math.floor(tri.toDouble * 2 / (deg * (deg - 1)) * 1e6 + 0.5) / 1e6
      assert(coeff == expCoeff)
    }
  }

  test("minhash estimate tracks exact jaccard within the K=32 binomial bound") {
    val rows = graft.llm.Dedup.minhashEstimate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = math.abs(r.getDouble(4))
      // sd of the estimator at J≈0.85, K=32 is ~0.063; 4 sd ≈ 0.25
      assert(err <= 0.25, s"pair (${r.getLong(0)},${r.getLong(1)}) err $err")
    }
    // and on average it should be nearly unbiased
    val mean = rows.map(_.getDouble(4)).sum / rows.length
    assert(math.abs(mean) < 0.1, s"mean err $mean")
  }

  test("teravalidate: row count matches, inversions counted, checksum stable") {
    val r = Classics.mrTeravalidate(spark, sfDir).collect().head
    val n = Tables.lineitem(spark, sfDir).count()
    assert(r.getLong(0) == n)
    // ordered by shipdate, orderkey is genuinely non-monotone → real work
    assert(r.getLong(1) > 0)
    val again = Classics.mrTeravalidate(spark, sfDir).collect().head
    assert(r == again)
  }

  test("teravalidate partition-wise validation == the global-lag specification") {
    // the registered query validates per range partition + boundaries (no
    // single-task global window); it must reproduce the declared global-lag
    // spelling exactly — inversions split into within-partition + boundary
    // terms without loss for ANY range boundaries
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val global = Tables.lineitem(spark, sfDir)
      .select(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
              col("l_partkey"))
      .withColumn("prev_key", lag(col("l_orderkey"), 1).over(w))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_orderkey") < col("prev_key"), 1L).otherwise(0L))
          .as("inversions"),
        sum((col("l_orderkey") * 31 + col("l_linenumber") * 7
               + col("l_partkey")) % 1000003).as("checksum"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"))
      .collect().head
    val part = Classics.mrTeravalidate(spark, sfDir).collect().head
    assert(part == global)
  }
}
