package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  TimeMode, TimerValues, TTLConfig}

/** `stream_neardup` (round 18 — round-17 verdict item 4): streaming
  * MinHash-LSH near-duplicate ADMISSION. A document stream is checked, doc
  * by doc, against the corpus of documents seen within the event-time
  * watermark horizon; each doc emits one verdict row
  * `(doc_id, verdict ∈ {exact_dup, near_dup, new}, match_id)` — the
  * training-ingest gate ("should this crawled page enter the corpus?") that
  * `llm_ingest_dedup` answers in daily batches, as a live stream.
  *
  * CONTRACT (deterministic, SQL-expressible — the registered batch twin and
  * the DuckDB oracle compute exactly this): doc `i` is compared against
  * every doc `j` with strictly earlier (ts, doc_id) whose event time lies
  * within the horizon (`ts_i − ts_j ≤ horizon`) — the corpus is everything
  * SEEN in the horizon, admitted or not, which keeps verdicts independent
  * of other verdicts (an "admitted-only" corpus would make each verdict
  * depend on the chain of prior verdicts — still deterministic, but no
  * longer one SQL query, and a single borderline doc would flip every
  * verdict downstream of it). `exact_dup` = an earlier in-horizon doc with
  * the same sha256 (match = smallest such doc_id); else `near_dup` = an
  * earlier in-horizon doc with shingle Jaccard ≥ [[graft.llm.Dedup.JaccardThreshold]]
  * (match = smallest such doc_id); else `new`. Docs with fewer than 5
  * tokens have no shingles and can only exact-match — same rule as every
  * other §2.11 dedup row.
  *
  * The STREAMING spelling realizes this contract with high probability, not
  * exactly (round-19 doc fix — the divergence bound belongs here, on the
  * contract, not only in the shape paragraph below): LSH banding means a
  * true near-pair sharing none of the 16 bands is reported `new`
  * (P(miss) = (1 − J⁴)^16 ≈ 2.2e-4 per pair at J = 0.8, worst just above
  * the threshold), and `match_id` can exceed the contract's smallest-id
  * match when the minimal candidate shares no band with the arriving doc.
  * Exact duplicates are never missed (the exact band is keyed by the text
  * hash and verified on full sha256). The spec/probe equalities pinning
  * stream ≡ batch twin are corpus-specific observations, not a guarantee;
  * downstream consumers of the admission gate should treat the streaming
  * output as a 1-in-~4500-pairs-lossy realization of the registered
  * contract. The registered/oracled row is the batch twin, which computes
  * the contract exactly.
  *
  * STREAMING SHAPE (the 100 TB path): no doc ever compares against the
  * whole horizon corpus. Each doc explodes to its 16 MinHash band keys
  * (bands of 4 of the 64 per-shingle xxhash64 minima — the same 16×4
  * banding as `llm_neardup_minhash`, P(miss | J=0.8) ≈ 2.2e-4 per true
  * pair) plus one EXACT band keyed by the text hash, and meets only docs
  * sharing a band: keyed state (per band key) holds the horizon's member
  * docs as (doc_id, ts, sha256, sorted shingle-hash array), candidates are
  * verified by EXACT Jaccard on the stored arrays (LSH bounds who is
  * compared; the threshold decision is never probabilistic), and a
  * stateless second operator folds a doc's ≤17 band verdicts into one row
  * — possible without state because pass 1 emits every band row of a doc
  * in the same micro-batch. State is evicted by the watermark: once the
  * watermark passes `ts_j + horizon` no future doc can match `j` (future
  * rows are at/after the watermark), so each band key drops dead members
  * on access and an event-time timer at (oldest member + horizon + 1 ms)
  * sweeps keys the stream went quiet on. The exact-band key space is one
  * entry per distinct in-horizon text — the usual LSH-bucket skew caveat
  * applies to pathological mega-duplicate streams (one band key holding c
  * near-identical docs costs O(c) comparisons per arrival, the streaming
  * mirror of the batch family's capped/guarded mega-cluster regime).
  *
  * IN-ORDER CONTRACT (same as `stream_asof_state`): a doc arrives after
  * every doc with an earlier (ts, doc_id). Within a micro-batch, rows are
  * processed in (ts, doc_id) order per band key, so same-batch pairs
  * resolve exactly; a behind-watermark straggler degrades by missing
  * comparisons against docs that were processed before it arrived (it is
  * still checked against the state present on arrival). The
  * watermark-buffered spelling of this operator would reuse
  * [[BufferedAsofProcessor]]'s buffering mechanics verbatim; not built —
  * admission gates want immediate verdicts.
  *
  * Registered as the batch twin (Verify/DuckDB-oracled at sf0.01); the
  * streaming spelling is pinned equal to the batch twin on the fixture in
  * StreamingSpec (cross-batch state carry + watermark eviction included).
  */
object StreamNeardup {
  /** Horizon in MINUTES of synthetic event time for the REGISTERED row; the
    * fixture assigns doc i the event time `epoch + i minutes`, so this is
    * also the doc-id distance bound. 200 splits the sf0.01 fixture's 25
    * true near pairs (id distances 4–429) roughly in half — both the
    * match and the evicted regime are exercised by the oracle. */
  val HorizonDocsDefault = 200L

  val NumBands: Int = graft.llm.Dedup.NumHashes / graft.llm.Dedup.BandSize
  /** The exact-match band: every doc (shingled or not) carries it, keyed by
    * the 64-bit text hash; membership comparison is full-sha256 equality. */
  val ExactBand: Int = NumBands

  /** One stored horizon-corpus member inside a band key's state. */
  case class NeardupMember(doc_id: Long, ts_us: Long, h: String, shs: Array[Long])

  /** Pass-1 input: one row per (doc, band), carrying ONLY the payload that
    * band family compares on (round 19 — r18 verdict item 1): the exact
    * band's row carries `h` (sha256 equality is its whole comparison) and an
    * EMPTY `shs`; each MinHash band's row carries the doc's SORTED distinct
    * shingle-hash array and an empty `h` (Jaccard on the stored arrays is
    * its whole comparison). Members are stored per band key the doc collides
    * on — that per-band self-containment is what keeps pass 1 a single
    * keyed operator — so slimming the row slims the state it becomes. */
  case class BandRow(band: Int, band_hash: Long, doc_id: Long, ts_us: Long,
                     h: String, shs: Array[Long], ts: java.sql.Timestamp)

  /** Pass-1 output: this band's best earlier matches for one doc (−1 =
    * none). Every (doc, band) input emits exactly one — the stateless
    * verdict fold needs a row even from silent bands so a no-match doc
    * still reaches the output as `new`. */
  case class BandVerdict(doc_id: Long, exact_id: Long, near_id: Long)

  /** Exact Jaccard of two sorted Long arrays (linear merge). */
  private[streaming] def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  /** Pass 1: per-band horizon state + candidate verification. Keyed by
    * (band, band_hash); EventTime mode (the watermark drives eviction
    * only — emission is immediate). */
  class BandNeardupProcessor(horizonMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, Long), BandRow, BandVerdict] {
    @transient private var members: ListState[NeardupMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[NeardupMember]("members",
        org.apache.spark.sql.Encoders.product[NeardupMember], TTLConfig.NONE)

    private def horizonUs = horizonMs * 1000L

    /** Drop members no future row can match (watermark ≥ ts + horizon) and
      * keep exactly one armed sweep timer while members remain. Returns the
      * retained members. */
    private def evictAndArm(kept: Vector[NeardupMember], wmMs: Long,
                            rearm: Boolean, firedMs: Long = -1L): Vector[NeardupMember] = {
      val live = kept.filter(m => m.ts_us / 1000L + horizonMs >= wmMs)
      if (live.isEmpty) members.clear()
      else {
        members.put(live.toArray)
        if (rearm) {
          val want = live.iterator.map(_.ts_us / 1000L).min + horizonMs + 1L
          // the firing timer is auto-removed by Spark but still listed
          // mid-fire — deleting it again WARNs per fire (see the as-of
          // processors' identical exclusion)
          val armed = getHandle.listTimers().map(_.asInstanceOf[Long]).toSet - firedMs
          armed.iterator.filter(_ != want).foreach(getHandle.deleteTimer)
          if (!armed.contains(want) && want != firedMs) getHandle.registerTimer(want)
        }
      }
      live
    }

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandRow],
                                 tv: TimerValues): Iterator[BandVerdict] = {
      val wm = tv.getCurrentWatermarkInMs()
      val stored = members.get().toVector
      val incoming = rows.toVector.sortBy(r => (r.ts_us, r.doc_id))
      val live = scala.collection.mutable.ArrayBuffer.empty[NeardupMember]
      live ++= stored.filter(m => m.ts_us / 1000L + horizonMs >= wm)
      val exact = key._1 == ExactBand
      val out = incoming.map { r =>
        var exactId = -1L
        var nearId = -1L
        live.foreach { m =>
          val earlier = m.ts_us < r.ts_us ||
            (m.ts_us == r.ts_us && m.doc_id < r.doc_id)
          if (earlier && r.ts_us - m.ts_us <= horizonUs) {
            if (exact) {
              if (m.h == r.h && (exactId < 0 || m.doc_id < exactId))
                exactId = m.doc_id
            } else if (graft.llm.Dedup.JaccardThreshold <=
                       jaccardSorted(m.shs, r.shs) &&
                       (nearId < 0 || m.doc_id < nearId))
              nearId = m.doc_id
          }
        }
        live += NeardupMember(r.doc_id, r.ts_us, r.h, r.shs)
        BandVerdict(r.doc_id, exactId, nearId)
      }
      evictAndArm(live.toVector, wm, rearm = true)
      out.iterator
    }

    override def handleExpiredTimer(key: (Int, Long), tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[BandVerdict] = {
      val wm = math.max(tv.getCurrentWatermarkInMs(), info.getExpiryTimeInMs())
      // the fired timer is auto-removed; evictAndArm re-arms iff members remain
      evictAndArm(members.get().toVector, wm, rearm = true,
        firedMs = info.getExpiryTimeInMs())
      Iterator.empty
    }
  }

  /** Pass 2: stateless fold of a doc's band verdicts (all co-batched —
    * pass 1 emits them from one per-batch call each) into the admission
    * row. Exact beats near; match is the minimum across bands, which is
    * the global minimum because an exact pair collides on the exact band
    * by construction and a Jaccard-≥t pair shares a MinHash band with
    * probability 1 − (1−t^4)^16. */
  class NeardupVerdictProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, BandVerdict, (Long, String, Long)] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(doc: Long, rows: Iterator[BandVerdict],
                                 tv: TimerValues): Iterator[(Long, String, Long)] = {
      var exactId = -1L
      var nearId = -1L
      rows.foreach { v =>
        if (v.exact_id >= 0 && (exactId < 0 || v.exact_id < exactId)) exactId = v.exact_id
        if (v.near_id >= 0 && (nearId < 0 || v.near_id < nearId)) nearId = v.near_id
      }
      val (verdict, m) =
        if (exactId >= 0) ("exact_dup", exactId)
        else if (nearId >= 0) ("near_dup", nearId)
        else ("new", -1L)
      Iterator.single((doc, verdict, m))
    }
  }

  /** Per-row band derivation — shingles, 64 MinHash minima, 16 band hashes,
    * plus the exact band — as pure column expressions (NO aggregation: the
    * streaming query stays stateless until the keyed band operator).
    * Input columns: ts (timestamp), doc_id (long), text (string). */
  private def bandRows(docs: DataFrame): DataFrame = {
    import graft.llm.Dedup.{NumHashes, BandSize}
    val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val shsStr = when(size(col("toks")) >= 5,
      array_distinct(transform(sequence(lit(1), size(col("toks")) - 4),
        i => concat_ws(" ", slice(col("toks"), i, lit(5))))))
      .otherwise(array().cast("array<string>"))
    val mhs = (0 until NumHashes).map { k =>
      array_min(transform(col("shset"), sh => xxhash64(lit(k), sh)))
    }
    val bandStructs = (0 until NumHashes / BandSize).map { b =>
      val cols = (b * BandSize until (b + 1) * BandSize).map(k => col(s"mh$k"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("band_hash"))
    }
    val exactStruct = struct(lit(ExactBand).as("band"),
      xxhash64(col("text")).as("band_hash"))
    // MinHash bands exist only for shingled docs — Spark's hash functions
    // SKIP null inputs instead of returning null, so an isNotNull filter on
    // the band hash would not drop the dead bands (every shingle-less doc
    // would otherwise share one degenerate band bucket); gate on the
    // shingle count instead. Every doc carries the exact band.
    val minhashBands = when(size(col("shset")) > 0, array(bandStructs: _*))
      .otherwise(array().cast(s"array<struct<band:int,band_hash:bigint>>"))
    docs
      .withColumn("toks", toks)
      .withColumn("shset", shsStr)
      .withColumn("h", sha2(col("text"), 256))
      .withColumn("shs", array_sort(transform(col("shset"), sh => xxhash64(sh))))
      .withColumns((0 until NumHashes).map(k => s"mh$k").zip(mhs).toMap)
      .select(explode(concat(minhashBands, array(exactStruct))).as("bb"),
        col("doc_id"), col("ts"), col("h"), col("shs"))
      .select(col("bb.band").as("band"), col("bb.band_hash").as("band_hash"),
        col("doc_id"), unix_micros(col("ts")).as("ts_us"),
        // per-band payload split (see BandRow): the exact band never reads
        // shs, the MinHash bands never read h — shipping (and storing) the
        // dead half inflated band state ~16 sha256 strings + one shingle
        // array per doc (r18 probe: 322.5 MB at 320k docs)
        when(col("bb.band") === ExactBand, col("h")).otherwise("").as("h"),
        when(col("bb.band") === ExactBand, array().cast("array<bigint>"))
          .otherwise(col("shs")).as("shs"),
        col("ts"))
  }

  /** The streaming spelling: `docs` must be a streaming DataFrame with
    * columns (ts, doc_id, text) and a watermark on `ts`. */
  def streamNeardup(docs: DataFrame, horizonMs: Long): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    bandRows(docs).as[BandRow]
      .groupByKey(r => (r.band, r.band_hash))
      .transformWithState(new BandNeardupProcessor(horizonMs),
        TimeMode.EventTime(), OutputMode.Append())
      .groupByKey(_.doc_id)
      .transformWithState(new NeardupVerdictProcessor(), TimeMode.None(),
        OutputMode.Append())
      .toDF("doc_id", "verdict", "match_id")
  }

  /** The registered BATCH twin: the identical contract computed
    * relationally over `documents` with the synthetic `ts = doc_id minutes`
    * event time, i.e. the horizon becomes a doc-id distance bound. The
    * exact arm is a sha256 self-join; the near arm is the same
    * shared-shingle self-join as `llm_neardup_pairs` with the horizon
    * predicate cutting the pair space (at production scale the streaming
    * spelling IS the scale path — the batch twin exists as the oracle
    * contract, and a horizon-bounded batch backfill would reuse the LSH
    * banding exactly like `llm_neardup_minhash`). */
  def admitNeardupBatch(s: SparkSession, d: String,
                        horizonDocs: Long = HorizonDocsDefault): DataFrame = {
    val docs = graft.Tables.documents(s, d)
    val hashed = docs.select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val exact = hashed.as("x")
      .join(hashed.as("y"), col("y.h") === col("x.h") &&
        col("y.doc_id") < col("x.doc_id") &&
        col("x.doc_id") - col("y.doc_id") <= horizonDocs)
      .groupBy(col("x.doc_id").as("doc_id"))
      .agg(min(col("y.doc_id")).as("exact_match"))
    // round 19 (r18 verdict item 2): join on 8-byte shingle DIGESTS, not the
    // ~45-byte 5-gram strings — the same swap the rest of the near-dup family
    // made in round 18 (see [[graft.llm.Dedup.shingleHashes]] for the
    // collision bound); the string-exact oracle re-proves equality each round.
    val sh = graft.llm.Dedup.shingleHashes(s, d).transform(graft.Caching.cachedOnce)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val near = sh.as("x")
      .join(sh.as("y"), col("y.sh") === col("x.sh") &&
        col("y.doc_id") < col("x.doc_id") &&
        col("x.doc_id") - col("y.doc_id") <= horizonDocs)
      .groupBy(col("x.doc_id").as("doc_id"), col("y.doc_id").as("cand_id"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id"), col("n_sh").as("n1")), "doc_id")
      .join(sizes.select(col("doc_id").as("cand_id"), col("n_sh").as("n2")), "cand_id")
      .where(col("inter").cast("double") /
             (col("n1") + col("n2") - col("inter")) >= graft.llm.Dedup.JaccardThreshold)
      .groupBy("doc_id")
      .agg(min(col("cand_id")).as("near_match"))
    docs.select("doc_id")
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_match").isNotNull, "exact_dup")
          .when(col("near_match").isNotNull, "near_dup")
          .otherwise("new").as("verdict"),
        coalesce(col("exact_match"), col("near_match"), lit(-1L)).as("match_id"))
  }

  val streamNeardupSql: String =
    s"""WITH ${graft.llm.Dedup.shinglesSqlCte},
       |hashed AS (SELECT doc_id, sha256(text) AS h FROM documents),
       |exact AS (
       |  SELECT x.doc_id, min(y.doc_id) AS exact_match
       |  FROM hashed x JOIN hashed y ON y.h = x.h
       |   AND y.doc_id < x.doc_id AND x.doc_id - y.doc_id <= $HorizonDocsDefault
       |  GROUP BY x.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
       |inter AS (
       |  SELECT x.doc_id, y.doc_id AS cand_id, count(*) AS inter
       |  FROM shingles x JOIN shingles y ON y.sh = x.sh
       |   AND y.doc_id < x.doc_id AND x.doc_id - y.doc_id <= $HorizonDocsDefault
       |  GROUP BY 1, 2),
       |near AS (
       |  SELECT i.doc_id, min(i.cand_id) AS near_match
       |  FROM inter i
       |  JOIN sizes s1 ON s1.doc_id = i.doc_id
       |  JOIN sizes s2 ON s2.doc_id = i.cand_id
       |  WHERE cast(i.inter AS double) / (s1.n_sh + s2.n_sh - i.inter)
       |        >= ${graft.llm.Dedup.JaccardThreshold}
       |  GROUP BY i.doc_id)
       |SELECT d.doc_id,
       |  CASE WHEN e.exact_match IS NOT NULL THEN 'exact_dup'
       |       WHEN n.near_match IS NOT NULL THEN 'near_dup'
       |       ELSE 'new' END AS verdict,
       |  coalesce(e.exact_match, n.near_match, -1) AS match_id
       |FROM documents d
       |LEFT JOIN exact e ON d.doc_id = e.doc_id
       |LEFT JOIN near n ON d.doc_id = n.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
