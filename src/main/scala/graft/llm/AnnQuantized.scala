package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.11 quantized-scan similarity search: score candidates with int8
  * codes first (4× less data to scan, integer arithmetic), keep a top-R
  * shortlist per query, then re-rank the shortlist with exact float cosine
  * — the standard production memory/compute-vs-exactness trade for vector
  * search, here built on [[Quantize]]'s symmetric int8 codes.
  *
  * Unlike the LSH/IVF paths (rows-only: recall is probabilistic), this
  * operator is FULLY oracle-checkable: the quantized scores are built from
  * exact integer dot products (order-independent addition), and sqrt /
  * division are IEEE-correctly-rounded, so both engines rank identically;
  * the final exact re-rank reuses the sequential-fold cosine that already
  * hash-matches in `llm_simsearch_topk`.
  *
  * Scale: codes are ~70 bytes/vector vs 256 for float32 — the quantized
  * pass streams 4× more corpus per second from the same I/O; only R rows
  * per query reach the float re-rank. Both passes broadcast the (small)
  * query set and parallelize over candidate splits.
  */
object AnnQuantized {
  type Q = (SparkSession, String) => DataFrame

  val RerankK = 20 // quantized shortlist size
  val TopK = 5     // final answers per query

  /** int8 code column for an embedding column (same formula as Quantize).
    * Shared with [[Similarity.knnGraph]], whose candidate generation runs on
    * these codes. */
  def codes(emb: Column): Column = {
    val scale = array_max(transform(emb, x => abs(x.cast("double"))))
    transform(emb, x =>
      when(scale === 0, lit(0)).otherwise(
        floor(x.cast("double") * lit(127.0) / scale + lit(0.5)).cast("int")))
  }

  /** Default corpus blocks in the blocked quantized scan (same B×B shape as
    * [[Similarity.knnGraph]]'s candidate pass; override with
    * `spark.graft.vector.blocks` — [[Similarity.vectorBlocks]]). */
  val QBlocks = 16

  /** Int8 codes are carried as array<float>: every code is an integer in
    * [-127, 127], every pairwise product (≤ 16129) and every 64-term sum is
    * exactly representable in a double accumulator — so the "integer dot
    * product" runs through the same sequential fold as the float path while
    * remaining bit-equal to the oracle's bigint arithmetic.
    *
    * The quantized scan is the BLOCKED exact pass (round 6): corpus and
    * query set hash into [[QBlocks]] groups, the B×B block-pair cross join
    * carries B² bounded rows, and the `graft_knn_block_cands` kernel emits
    * the exact per-(query, block) top-[[RerankK]] WITH the quantized score
    * on the struct — a guaranteed superset of the global quantized top-R,
    * which one |Q|·B·R-row window then cuts to exactly the declared
    * shortlist (same score-desc/id-asc order as the theta spelling; kernel
    * scores are the same fold, so no recompute join is needed). Per-vector
    * norms are computed ONCE per vector before blocking. The former
    * spelling — a broadcast q =!= c theta join scoring |Q|·n ROWS through
    * the join machinery and ranking window — survives as
    * [[simsearchQuantizedExact]], the unit-pinned specification. */
  val simsearchQuantized: Q = (s, d) => {
    graft.plans.VectorFunctions.register(s)
    import Similarity.dot
    // The code-generation transform (a scaled floor op per dimension per
    // row, plus two norm folds) dominates this operator's scan stage, so
    // the conditional scatter pays for itself HERE — unlike the rest of
    // the vector family, where a blanket embeddings scatter was A/B'd and
    // rejected (see Tables.embeddings).
    val e = graft.Caching.scatterIfNarrow(Tables.embeddings(s, d), col("vec_id"))
      .select(col("vec_id"), col("label"), col("embedding"),
              codes(col("embedding")).cast("array<float>").as("qv"))
      .withColumn("qnorm", sqrt(dot(col("qv"), col("qv"))))
      .withColumn("enorm", sqrt(dot(col("embedding"), col("embedding"))))
    val blk = e.select(
      pmod(xxhash64(col("vec_id")),
           lit(Similarity.vectorBlocksFor(s, d, QBlocks))).as("blk"),
      col("vec_id"), col("label"), col("qv"), col("qnorm"))
    val qb = blk.where(col("label") === 0).groupBy("blk")
      .agg(collect_list(struct(col("vec_id"), col("qv"), col("qnorm")))
             .as("qmem"))
    val cb = blk.groupBy("blk")
      .agg(collect_list(struct(col("vec_id"), col("qv"), col("qnorm")))
             .as("cmem"))
      .select(col("blk").as("cblk"), col("cmem"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("qscore").desc, col("c_id"))
    val shortlist = qb.crossJoin(cb)
      .select(explode(graft.plans.VectorFunctions.knnBlockCands(
        col("qmem"), col("cmem"), lit(RerankK))).as("cd"))
      .select(col("cd.src").as("q_id"), col("cd.dst").as("c_id"),
              col("cd.score").as("qscore"))
      .withColumn("qrk", row_number().over(wq))
      .where(col("qrk") <= RerankK)
      .select("q_id", "c_id")
    val q = e.where(col("label") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
              col("enorm").as("q_enorm"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("ce"),
                     col("enorm").as("c_enorm"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id"))
    shortlist
      .join(broadcast(q), "q_id")
      .join(c, "c_id")
      .withColumn("score",
        dot(col("qe"), col("ce")) / (col("q_enorm") * col("c_enorm")))
      .withColumn("rk", row_number().over(wr))
      .where(col("rk") <= TopK)
      .select(col("q_id"), col("rk"), col("c_id"),
              round(col("score"), 6).as("score6"))
  }

  /** The declared theta-join spelling — |Q|·n scored rows through a
    * broadcast non-equi join and one global ranking window. Kept as the
    * specification the blocked kernel path must reproduce (SqlSurfaceSpec
    * pin); not registered.
    *
    * Intentional divergence on DEGENERATE corpora: like
    * [[graft.llm.Similarity.simsearchTopkExact]], this spelling ranks a
    * zero-norm pair's NaN above all real scores and sorts null scores last,
    * while the registered blocked path scores such pairs the -1 sentinel.
    * The fixtures contain no degenerates, so the equality pin holds; the
    * sentinel ordering is the deliberate semantics at scale. */
  def simsearchQuantizedExact(s: SparkSession, d: String): DataFrame = {
    graft.plans.VectorFunctions.register(s)
    import Similarity.dot
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"),
              codes(col("embedding")).cast("array<float>").as("qv"))
      .withColumn("qnorm", sqrt(dot(col("qv"), col("qv"))))
      .withColumn("enorm", sqrt(dot(col("embedding"), col("embedding"))))
    val q = e.where(col("label") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
              col("qv").as("qq"), col("qnorm").as("q_qnorm"),
              col("enorm").as("q_enorm"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("ce"),
                     col("qv").as("cq"), col("qnorm").as("c_qnorm"),
                     col("enorm").as("c_enorm"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("qscore").desc, col("c_id"))
    val shortlist = broadcast(q.select("q_id", "qq", "q_qnorm"))
      .join(c.select("c_id", "cq", "c_qnorm"), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("qq"), col("cq")) / (col("q_qnorm") * col("c_qnorm")))
          .as("qscore"))
      .withColumn("qrk", row_number().over(wq))
      .where(col("qrk") <= RerankK)
      .select("q_id", "c_id")
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id"))
    shortlist
      .join(broadcast(q.select("q_id", "qe", "q_enorm")), "q_id")
      .join(c.select("c_id", "ce", "c_enorm"), "c_id")
      .withColumn("score",
        dot(col("qe"), col("ce")) / (col("q_enorm") * col("c_enorm")))
      .withColumn("rk", row_number().over(wr))
      .where(col("rk") <= TopK)
      .select(col("q_id"), col("rk"), col("c_id"),
              round(col("score"), 6).as("score6"))
      .orderBy("q_id", "rk")
  }

  private def qdotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), " +
      s"i -> cast($a[i] as bigint) * $b[i]), (x, y) -> x + y)"

  val simsearchQuantizedSql: String = {
    val dotE = Similarity.dotSql("qe", "ce")
    val dotQQ = Similarity.dotSql("qe", "qe")
    val dotCC = Similarity.dotSql("ce", "ce")
    s"""WITH q8 AS (
       |  SELECT vec_id, label, embedding,
       |    list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
       |      ELSE cast(floor(cast(x as double) * 127.0 / scale + 0.5) as int) END) AS qv
       |  FROM (SELECT *, list_max(list_transform(embedding, x -> abs(cast(x as double)))) AS scale
       |        FROM embeddings)),
       |q AS (SELECT vec_id AS q_id, embedding AS qe, qv AS qq FROM q8 WHERE label = 0),
       |c AS (SELECT vec_id AS c_id, embedding AS ce, qv AS cq FROM q8),
       |scored AS (
       |  SELECT q_id, c_id, qe, ce,
       |    cast(${qdotSql("qq", "cq")} as double)
       |      / (sqrt(cast(${qdotSql("qq", "qq")} as double))
       |         * sqrt(cast(${qdotSql("cq", "cq")} as double))) AS qscore
       |  FROM q CROSS JOIN c WHERE q_id <> c_id),
       |shortlist AS (
       |  SELECT q_id, c_id, qe, ce,
       |    row_number() OVER (PARTITION BY q_id ORDER BY qscore DESC, c_id) AS qrk
       |  FROM scored),
       |reranked AS (
       |  SELECT q_id, c_id,
       |    $dotE / (sqrt($dotQQ) * sqrt($dotCC)) AS score
       |  FROM shortlist WHERE qrk <= $RerankK),
       |final AS (
       |  SELECT q_id, c_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rk
       |  FROM reranked)
       |SELECT q_id, cast(rk as int) AS rk, c_id, round(score, 6) AS score6
       |FROM final WHERE rk <= $TopK
       |ORDER BY q_id, rk""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "llm_simsearch_quantized" -> simsearchQuantized,
  )

  val oracle: Map[String, String] = Map(
    "llm_simsearch_quantized" -> simsearchQuantizedSql,
  )

  /** Registered SORT-FREE (round 15, tranche 3): (q_id, rk) is the rank
    * PK; the theta spelling keeps its sort (spec-only, not timed). */
  val dumpSort: Map[String, Seq[String]] = Map(
    "llm_simsearch_quantized" -> Seq("q_id", "rk"),
  )
}
