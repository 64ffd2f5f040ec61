package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Dsl.{round6, round6Sql}

/** §2.11 text analysis for a training-data pipeline (SURVEY.md; sentiment
  * pattern per the public EDBT'16 large-scale-sentiment shape, PAPERS.md:7):
  * corpus stats, language/quality filtering, heuristic language-ID scoring,
  * quality scoring, TF-IDF, n-grams, lexicon sentiment, and the multimodal
  * doc+embedding join.
  *
  * Scale notes: everything is explode → partial-agg → single shuffle.
  * Lexicons/profiles are literal inline tables → broadcast joins.
  * VOCABULARY-sized tables (document frequency, unigram counts, BPE
  * symbol table) are only conventionally small — a web-scale corpus
  * reaches 1e8+ distinct terms, which no driver should broadcast — so
  * every vocab-sided join goes through [[vocabJoin]]'s size-adaptive
  * switch instead of a hard broadcast hint.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  /** Default row ceiling for broadcasting a vocabulary table: 5e6 rows of
    * (term, count) is low hundreds of MB serialized — comfortably a
    * broadcast on a real cluster, far above every fixture vocabulary. */
  val VocabBroadcastMaxRowsDefault = 5000000L

  /** Vocabulary-sided equi-join with a size-adaptive broadcast — the
    * [[graft.llm.Dedup.neardupPairs]] corpus-size switch applied to the
    * text family. At or below `spark.graft.vocab.broadcastMaxRows` (default
    * [[VocabBroadcastMaxRowsDefault]]) the join keeps the broadcast hint;
    * above it the hint is dropped and the planner/AQE run the ordinary
    * shuffled equi-join (AQE may still choose broadcast from its own
    * runtime size estimate — the point is that WE no longer assert
    * driver-must-hold-the-vocab). Both paths are value-identical (the hint
    * only picks the physical strategy); LlmSpec pins them equal and
    * plan-asserts the shuffled path engages below a forced threshold.
    *
    * The fits-in-broadcast decision is MEMOIZED per (vocab plan, threshold)
    * for the JVM's lifetime: the round-7 spelling cached the vocab side and
    * ran an eager count() on every invocation, which put one extra cache
    * materialization + one extra job + a driver synchronization point on a
    * previously pure-broadcast path (llm_tfidf regressed 73%, round-7
    * VERDICT). Re-invoking the same operator (every bench pass, every
    * Verify run) now reuses the counted answer and stays fully lazy; the
    * single count job per DISTINCT vocabulary is the honest price of
    * choosing the right physical plan for the corpus actually present. A
    * hash collision could at worst reuse the other plan's decision — both
    * physical paths are value-identical, so that is a perf coin-flip, not a
    * correctness risk. Nothing is cached, so no executor memory accumulates
    * across a long session (round-7 ADVICE).
    *
    * ASSUMPTION (round-8 ADVICE): memoization treats the data under a vocab
    * plan as IMMUTABLE for the JVM's lifetime — true for the fixture dirs
    * and for the append-only snapshot layout a 100 TB corpus uses, but a
    * vocab that grows past the threshold under the same path would keep the
    * stale fits=true decision and force an oversized broadcast. Escape
    * hatch: set `spark.graft.vocab.memoizeFits=false` to recount on every
    * invocation (the round-7 behavior), or bounce the session for a one-off
    * refresh. The count Spark job runs OUTSIDE the map's bin lock (a
    * multi-second job under computeIfAbsent would serialize unrelated
    * first-touch threads that collide on a bin — round-8 VERDICT #3);
    * `putIfAbsent` keeps the first completed answer on a race. */
  private val vocabFits =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), java.lang.Boolean]()

  /** `fitsProbe` (round 19): the frame whose ROW COUNT decides broadcast
    * fitness — by default the vocab itself. A caller whose vocab lineage
    * contains checkpointed RDDs (the BPE merge chain) passes an equivalent
    * checkpoint-free frame with the same row count instead: LogicalRDD's
    * semanticHash embeds the RDD id, which changes on every rebuild, so
    * memoizing on the vocab plan itself would MISS every invocation and
    * re-execute the whole chain once per pass just to count it (measured:
    * llm_bpe_encode carried a ~0.35 s/pass phantom count job).
    *
    * CALLER CONTRACT (round-19 advisor): a non-null `fitsProbe` MUST have
    * exactly the vocab's row count — the verdict memoized under the probe's
    * plan is applied to the VOCAB, so a mismatched probe silently
    * broadcasts an oversized vocab (executor OOM risk) or shuffles a
    * broadcastable one (perf only). The current caller's invariant: BPE
    * merges rewrite `repr`, never add or remove words, so the pre-chain
    * word table and the post-chain vocab are row-count-equal by
    * construction. There is deliberately NO runtime equality check — the
    * check IS a second count job of the checkpoint-embedding frame, i.e.
    * exactly the phantom job this parameter exists to remove. */
  private def vocabJoin(facts: DataFrame, vocab: DataFrame, key: String,
                        fitsProbe: DataFrame = null): DataFrame = {
    val probe = Option(fitsProbe).getOrElse(vocab)
    val conf = facts.sparkSession.conf
    val maxRows = conf
      .get("spark.graft.vocab.broadcastMaxRows", VocabBroadcastMaxRowsDefault.toString)
      .toLong
    val memoize = conf.get("spark.graft.vocab.memoizeFits", "true").toBoolean
    def count(): Boolean = probe.count() <= maxRows
    val fits: Boolean =
      if (!memoize) count()
      else {
        val k = (probe.queryExecution.analyzed.semanticHash(), maxRows)
        vocabFits.get(k) match {
          case null =>
            val computed: java.lang.Boolean = count() // job outside any lock
            val prev = vocabFits.putIfAbsent(k, computed)
            (if (prev == null) computed else prev).booleanValue()
          case cached => cached.booleanValue()
        }
      }
    if (fits) facts.join(broadcast(vocab), key) else facts.join(vocab, key)
  }

  /** One row per (doc, token). Conditionally range-scattered BEFORE the
    * explode ([[graft.Caching.scatterIfNarrow]]): the explode multiplies
    * each document by its token count, so on an under-parallelized scan
    * the whole text family's heaviest compute would fuse into one task.
    * Range partitioning on doc_id still satisfies every downstream
    * doc_id-clustered aggregation/window, so consumers lose no fusion. */
  private def toks(s: SparkSession, d: String): DataFrame =
    graft.Caching.scatterIfNarrow(Tables.documents(s, d), col("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
              explode(filter(split(lower(col("text")), "\\s+"), t => t =!= "")).as("w"))

  /** Per-(doc, word) token counts — ONE corpus tokenize pre-aggregated to
    * the (doc_id, w, c) frame several operators derive their own word and
    * per-doc aggregates from (round 19). cachedOnce, so every consumer in a
    * session — [[bpeEncode]], [[unigramLogprob]] — shares one
    * materialization, and the aggregation collapses into the tokenize
    * stage (scatterIfNarrow range-partitions on doc_id, which satisfies
    * the (doc_id, w) clustering, so no extra exchange is planned). The
    * frame is aggregated, not raw-exploded — the caching discipline the
    * dsir/perplexity A/Bs established. */
  private def docWordCounts(s: SparkSession, d: String): DataFrame =
    toks(s, d).groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .transform(graft.Caching.cachedOnce)

  private val toksSqlCte: String =
    """toks AS (
      |  SELECT doc_id, lang, source, n_chars,
      |         unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS w
      |  FROM documents)""".stripMargin

  /** Corpus analytics per language. */
  val textStats: Q = (s, d) =>
    toks(s, d)
      .groupBy("lang")
      .agg(countDistinct(col("doc_id")).as("docs"),
           count(lit(1)).as("total_toks"),
           countDistinct(col("w")).as("vocab"),
           countDistinct(col("source")).as("sources"))
      .join(Tables.documents(s, d).groupBy("lang")
              .agg(sum(col("n_chars")).as("sum_chars"),
                   min(col("n_chars")).as("min_chars"),
                   max(col("n_chars")).as("max_chars")),
            Seq("lang"))

  val textStatsSql: String =
    s"""WITH $toksSqlCte,
       |t AS (
       |  SELECT lang, count(DISTINCT doc_id) AS docs, count(*) AS total_toks,
       |         count(DISTINCT w) AS vocab, count(DISTINCT source) AS sources
       |  FROM toks GROUP BY lang),
       |c AS (
       |  SELECT lang, cast(sum(n_chars) as bigint) AS sum_chars,
       |         min(n_chars) AS min_chars, max(n_chars) AS max_chars
       |  FROM documents GROUP BY lang)
       |SELECT lang, docs, total_toks, vocab, sources, sum_chars, min_chars, max_chars
       |FROM t JOIN c USING (lang)
       |ORDER BY lang""".stripMargin

  /** Language/quality filter: english docs in a size band with enough tokens. */
  val langFilter: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("n_toks", size(filter(split(lower(col("text")), "\\s+"), t => t =!= "")))
      .where(col("lang") === "en" && col("n_chars").between(100, 400) &&
             col("n_toks") >= 20)
      .select("doc_id", "lang", "n_chars", "n_toks")

  val langFilterSql: String =
    """SELECT doc_id, lang, n_chars,
      |  cast(len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) as int) AS n_toks
      |FROM documents
      |WHERE lang = 'en' AND n_chars BETWEEN 100 AND 400
      |  AND len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) >= 20
      |ORDER BY doc_id""".stripMargin

  /** Heuristic language-ID: score each doc against per-language keyword
    * profiles (n-gram-frequency heuristic), predict the argmax. Integer
    * scoring end-to-end → oracle-exact. */
  val langProfiles: Seq[(String, String, Int)] = Seq(
    ("en", "the", 3), ("en", "data", 2), ("en", "value", 1),
    ("de", "window", 3), ("de", "group", 2), ("de", "order", 1),
    ("es", "table", 3), ("es", "line", 2), ("es", "part", 1),
    ("fr", "query", 3), ("fr", "merge", 2), ("fr", "sort", 1),
    ("zh", "spark", 3), ("zh", "stream", 2), ("zh", "batch", 1))

  val langId: Q = (s, d) => {
    import s.implicits._
    val profiles = langProfiles.toDF("plang", "word", "wt")
    val scored = toks(s, d)
      .join(broadcast(profiles), col("w") === col("word"))
      .groupBy("doc_id", "plang")
      .agg(sum(col("wt")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("plang"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("plang").as("pred_lang"), col("score"))
  }

  val langIdSql: String = {
    val values = langProfiles
      .map { case (l, w, wt) => s"('$l', '$w', $wt)" }.mkString(", ")
    s"""WITH $toksSqlCte,
       |profiles(plang, word, wt) AS (VALUES $values),
       |scored AS (
       |  SELECT doc_id, plang, cast(sum(wt) as bigint) AS score
       |  FROM toks JOIN profiles ON w = word
       |  GROUP BY doc_id, plang),
       |ranked AS (
       |  SELECT doc_id, plang, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rk
       |  FROM scored)
       |SELECT doc_id, plang AS pred_lang, score
       |FROM ranked WHERE rk = 1
       |ORDER BY doc_id""".stripMargin
  }

  /** Quality scoring: token count, mean token length, stopword ratio, and a
    * composite score — ratios of exact integers, deterministic doubles. */
  val qualityScore: Q = (s, d) => {
    val stop = Seq("the", "a", "value")
    val t = toks(s, d)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
           sum(length(col("w"))).as("sum_len"),
           sum(when(col("w").isin(stop: _*), 1).otherwise(0)).as("n_stop"))
    Tables.documents(s, d).select("doc_id", "n_chars")
      .join(t, "doc_id")
      .select(col("doc_id"), col("n_toks"),
        round6(col("sum_len").cast("double") / col("n_toks")).as("mean_tok_len"),
        round6(col("n_stop").cast("double") / col("n_toks")).as("stop_ratio"),
        round6(col("n_chars").cast("double") / col("n_toks")).as("chars_per_tok"))
  }

  val qualityScoreSql: String =
    s"""WITH $toksSqlCte,
       |t AS (
       |  SELECT doc_id, count(*) AS n_toks,
       |    sum(length(w)) AS sum_len,
       |    sum(CASE WHEN w IN ('the', 'a', 'value') THEN 1 ELSE 0 END) AS n_stop
       |  FROM toks GROUP BY doc_id)
       |SELECT d.doc_id, n_toks,
       |  ${round6Sql("cast(sum_len as double) / n_toks")} AS mean_tok_len,
       |  ${round6Sql("cast(n_stop as double) / n_toks")} AS stop_ratio,
       |  ${round6Sql("cast(n_chars as double) / n_toks")} AS chars_per_tok
       |FROM documents d JOIN t ON d.doc_id = t.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** TF-IDF: top-5 terms per doc by tf * (ln(N/df) + 1), ranked on the
    * 6dp-rounded weight (absorbs any libm last-ulp delta in ln). */
  val tfidf: Q = (s, d) => {
    // tf feeds BOTH the document-frequency aggregation and the weighted
    // join; without materialization the tokenize+explode+count pipeline
    // runs twice (Catalyst does not dedupe shared subplans). Round 20: the
    // materialized frame IS [[docWordCounts]] (same analyzed plan → same
    // CacheManager entry as bpeEncode/unigramLogprob/repetitionFilter — a
    // session builds it once for all four), and the old explicit
    // `.repartition(doc_id)` after the aggregation is GONE: the plan-audited
    // build already leaves the frame clustered on doc_id (scatterIfNarrow's
    // range partitioning satisfies the (doc_id, w) grouping, so the agg
    // plans no exchange and the ranking window below accepts the range
    // clustering as-is) — the repartition was a pure extra exchange of
    // every tf row, measured at +1 Exchange in the committed before-plan.
    // At production scan widths the agg exchanges on (doc_id, w) and the
    // window re-clusters on doc_id per execution — the same two exchanges
    // the repartition spelling paid, just placed differently.
    val tf = docWordCounts(s, d).withColumnRenamed("c", "tf")
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    // n_docs rides ON the vocab side (1-row cross join before the adaptive
    // join) instead of a second broadcast onto the fact side: one broadcast
    // exchange builds (w, df, n_docs) in a single stage — one fewer
    // broadcast barrier on the fact path, which is pure fixed overhead
    // (this query's 8x-scale ratio is ~1.0; its cost IS the stage count).
    val weighted = vocabJoin(tf, dfreq.crossJoin(n), "w")
      .withColumn("weight6",
        round(col("tf") * (log(col("n_docs").cast("double") / col("df")) + 1), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("weight6").desc, col("w"))
    weighted.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .select(col("doc_id"), col("rk"), col("w").as("term"), col("tf"),
              col("df"), col("weight6"))
  }

  val tfidfSql: String =
    s"""WITH $toksSqlCte,
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
       |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |weighted AS (
       |  SELECT doc_id, w, tf, df,
       |    round(tf * (ln(cast(n_docs as double) / df) + 1), 6) AS weight6
       |  FROM tf JOIN dfreq USING (w) CROSS JOIN n),
       |ranked AS (
       |  SELECT doc_id, w, tf, df, weight6,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY weight6 DESC, w) AS rk
       |  FROM weighted)
       |SELECT doc_id, rk, w AS term, tf, df, weight6
       |FROM ranked WHERE rk <= 5
       |ORDER BY doc_id, rk""".stripMargin

  /** Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", §A1.1): per-doc
    * word count in [50, 100k], mean word length in [3, 10], ≥80% of words
    * containing an alphabetic character, and ≥2 stopword hits — the
    * published heuristic battery production corpora are filtered with
    * (distinct from [[qualityScore]], which reports OUR composite
    * metrics; this one reproduces the published rule set and its pass
    * verdict). The reported ratios are rounded to 6dp on BOTH engines —
    * the repo-wide canonicalization discipline (cf. [[entropyFilter]]).
    * The pass verdict still thresholds the UNROUNDED ratio on both
    * sides, so the filter semantics are unchanged. Dtype note: DuckDB
    * widens integer `sum()` to HUGEINT (int128); the round-10 judge
    * established bit-exactly that every VALUE here matched while the
    * raw `n_stop` column hash-failed on dtype alone, so the oracle
    * casts `n_stop` back to BIGINT to match Spark's LongType (same
    * class of fix as `llm_seq_pack`, round 4).
    *
    * Scale: wordcount-shaped — tokenize map-side, one partial+final
    * aggregation on doc_id, then a join back to documents on doc_id.
    * No vocabulary or model is broadcast; nothing grows with corpus
    * size except the doc_id key space. */
  val gopherRules: Q = (s, d) => {
    val stop = Seq("the", "a", "value")
    val t = toks(s, d)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
           sum(length(col("w"))).as("sum_len"),
           sum(when(col("w").rlike("[a-z]"), 1).otherwise(0)).as("n_alpha"),
           sum(when(col("w").isin(stop: _*), 1).otherwise(0)).as("n_stop"))
    Tables.documents(s, d).select("doc_id")
      .join(t, "doc_id")
      .select(col("doc_id"), col("n_words"),
        round6(col("sum_len").cast("double") / col("n_words")).as("mean_word_len"),
        round6(col("n_alpha").cast("double") / col("n_words")).as("alpha_frac"),
        col("n_stop"),
        when(col("n_words").between(50, 100000) &&
             (col("sum_len").cast("double") / col("n_words")).between(3.0, 10.0) &&
             col("n_alpha").cast("double") / col("n_words") >= 0.8 &&
             col("n_stop") >= 2, 1).otherwise(0).as("passes"))
  }

  val gopherRulesSql: String =
    s"""WITH $toksSqlCte,
       |t AS (
       |  SELECT doc_id, count(*) AS n_words,
       |    sum(length(w)) AS sum_len,
       |    sum(CASE WHEN regexp_matches(w, '[a-z]') THEN 1 ELSE 0 END) AS n_alpha,
       |    sum(CASE WHEN w IN ('the', 'a', 'value') THEN 1 ELSE 0 END) AS n_stop
       |  FROM toks GROUP BY doc_id)
       |SELECT d.doc_id, n_words,
       |  ${round6Sql("cast(sum_len as double) / n_words")} AS mean_word_len,
       |  ${round6Sql("cast(n_alpha as double) / n_words")} AS alpha_frac,
       |  cast(n_stop AS BIGINT) AS n_stop,
       |  CASE WHEN n_words BETWEEN 50 AND 100000
       |        AND cast(sum_len as double) / n_words BETWEEN 3.0 AND 10.0
       |        AND cast(n_alpha as double) / n_words >= 0.8
       |        AND n_stop >= 2
       |       THEN 1 ELSE 0 END AS passes
       |FROM documents d JOIN t ON d.doc_id = t.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Character-entropy filter: per-doc Shannon entropy (nats) of the
    * lowercase character distribution — the standard gibberish /
    * low-diversity screen (binary blobs, repeated-char spam, and
    * keyboard-mash score far below natural text). Determinism: the
    * per-char terms fold SEQUENTIALLY over the char-sorted count list —
    * the same left fold DuckDB's `list_reduce` performs (the
    * [[graft.llm.Similarity]] dot-product discipline), so the double sum
    * has ONE evaluation order on both engines; 6dp rounding absorbs the
    * libm ln() last ulp, and the flag thresholds the rounded value.
    *
    * Scale: char explode is map-side; the (doc, char) count and the
    * per-doc fold are wordcount-shaped partial+final aggs on doc_id, and
    * the folded list is ≤ alphabet-size per doc — collect_list here is
    * bounded by ~30 entries, not by document length. */
  val entropyFilter: Q = (s, d) => {
    val cc = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), "")).as("ch"))
      .where(col("ch") =!= "")
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("cnt"))
    cc.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("ch"), col("cnt")))).as("cs"),
           sum(col("cnt")).as("n"))
      .select(col("doc_id"), col("n"),
        size(col("cs")).as("n_distinct_chars"),
        round(-aggregate(col("cs"), lit(0.0),
          (acc, x) => acc + (x.getField("cnt").cast("double") / col("n")) *
            log(x.getField("cnt").cast("double") / col("n"))), 6).as("entropy6"))
      .withColumn("low_entropy", when(col("entropy6") < 2.8, 1).otherwise(0))
  }

  val entropyFilterSql: String =
    """WITH chars AS (
      |  SELECT doc_id, unnest(string_split(lower(text), '')) AS ch
      |  FROM documents),
      |cc AS (
      |  SELECT doc_id, ch, count(*) AS cnt FROM chars
      |  WHERE ch <> '' GROUP BY doc_id, ch),
      |g AS (
      |  SELECT doc_id, list_sort(list({'ch': ch, 'cnt': cnt})) AS cs,
      |    cast(sum(cnt) as bigint) AS n
      |  FROM cc GROUP BY doc_id)
      |SELECT doc_id, n, cast(len(cs) as int) AS n_distinct_chars,
      |  round(-list_reduce(
      |    list_transform(cs, x -> (cast(x.cnt as double) / n) *
      |                            ln(cast(x.cnt as double) / n)),
      |    (a, b) -> a + b), 6) AS entropy6,
      |  CASE WHEN round(-list_reduce(
      |    list_transform(cs, x -> (cast(x.cnt as double) / n) *
      |                            ln(cast(x.cnt as double) / n)),
      |    (a, b) -> a + b), 6) < 2.8 THEN 1 ELSE 0 END AS low_entropy
      |FROM g ORDER BY doc_id""".stripMargin

  /** Corpus distribution shift: KL(en‖rest), KL(rest‖en), and
    * Jensen-Shannon divergence between the English slice's unigram
    * distribution and the rest of the corpus, with add-one smoothing over
    * the joint vocabulary — the domain-drift measurement a training
    * pipeline runs between corpus versions or source mixes before
    * reweighting. All counts are exact integers; each divergence is a
    * SEQUENTIAL fold over the vocabulary sorted by word (the
    * `llm_entropy_filter` discipline), so the double sums have one
    * evaluation order on both engines; 6dp rounding on output.
    *
    * Scale: the per-(word, slice) counts are a wordcount shuffle; the
    * final fold runs over the DISTINCT VOCABULARY (bounded, not
    * corpus-sized). For an unbounded vocabulary KL is a plain sum over
    * words, so the fold shards by word-hash bucket and the partial
    * divergences add — same plan, one more aggregation level. */
  val distShift: Q = (s, d) => {
    val counts = toks(s, d).groupBy("w").agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cp"),
      sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("cq"))
    val packed = counts.agg(
      sort_array(collect_list(struct(col("w"), col("cp"), col("cq")))).as("vs"),
      count(lit(1)).as("v"), sum(col("cp")).as("np"), sum(col("cq")).as("nq"))
    import org.apache.spark.sql.Column
    def p(x: Column) = (x.getField("cp").cast("double") + 1) / (col("np") + col("v"))
    def q(x: Column) = (x.getField("cq").cast("double") + 1) / (col("nq") + col("v"))
    def fold(term: Column => Column) =
      aggregate(col("vs"), lit(0.0), (acc, x) => acc + term(x))
    packed.select(col("v"), col("np"), col("nq"),
      round(fold(x => p(x) * log(p(x) / q(x))), 6).as("kl_pq6"),
      round(fold(x => q(x) * log(q(x) / p(x))), 6).as("kl_qp6"),
      round(lit(0.5) * fold(x => p(x) * log(p(x) / ((p(x) + q(x)) / 2))) +
            lit(0.5) * fold(x => q(x) * log(q(x) / ((p(x) + q(x)) / 2))), 6).as("js6"))
  }

  val distShiftSql: String = {
    def pSql = "((cast(x.cp as double) + 1) / (np + v))"
    def qSql = "((cast(x.cq as double) + 1) / (nq + v))"
    def foldSql(term: String) =
      s"list_reduce(list_prepend(0.0, list_transform(vs, x -> $term)), (acc, t) -> acc + t)"
    s"""WITH $toksSqlCte,
       |counts AS (
       |  SELECT w,
       |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cp,
       |    sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS cq
       |  FROM toks GROUP BY w),
       |packed AS (
       |  SELECT list_sort(list({'w': w, 'cp': cp, 'cq': cq})) AS vs,
       |    cast(count(*) as bigint) AS v,
       |    cast(sum(cp) as bigint) AS np, cast(sum(cq) as bigint) AS nq
       |  FROM counts)
       |SELECT v, np, nq,
       |  round(${foldSql(s"$pSql * ln($pSql / $qSql)")}, 6) AS kl_pq6,
       |  round(${foldSql(s"$qSql * ln($qSql / $pSql)")}, 6) AS kl_qp6,
       |  round(0.5 * ${foldSql(s"$pSql * ln($pSql / (($pSql + $qSql) / 2))")} +
       |        0.5 * ${foldSql(s"$qSql * ln($qSql / (($pSql + $qSql) / 2))")}, 6) AS js6
       |FROM packed""".stripMargin
  }

  /** Bigram extraction + counts (top 100 with total-order tiebreak). */
  val ngrams: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
              filter(split(lower(col("text")), "\\s+"), t => t =!= "").as("t"))
      .where(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1))))
        .as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(100)

  val ngramsSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |bi AS (
      |  SELECT t[i] || ' ' || t[i+1] AS bigram
      |  FROM t, unnest(generate_series(1, len(t) - 1)) AS g(i)
      |  WHERE len(t) >= 2)
      |SELECT bigram, count(*) AS cnt
      |FROM bi GROUP BY bigram
      |ORDER BY cnt DESC, bigram
      |LIMIT 100""".stripMargin

  /** Lexicon-based sentiment scoring (broadcast lexicon join). */
  val sentimentLexicon: Seq[(String, Int)] =
    Seq(("fast", 2), ("small", 1), ("slow", -2), ("big", -1), ("dup", -1))

  val sentiment: Q = (s, d) => {
    import s.implicits._
    val lex = sentimentLexicon.toDF("word", "polarity")
    toks(s, d)
      .join(broadcast(lex), col("w") === col("word"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("polarity"), lit(0))).as("sentiment"),
           sum(when(col("polarity").isNotNull, 1).otherwise(0)).as("n_matched"),
           count(lit(1)).as("n_toks"))
  }

  val sentimentSql: String = {
    val values = sentimentLexicon
      .map { case (w, p) => s"('$w', $p)" }.mkString(", ")
    s"""WITH $toksSqlCte,
       |lex(word, polarity) AS (VALUES $values)
       |SELECT doc_id,
       |  cast(sum(coalesce(polarity, 0)) as bigint) AS sentiment,
       |  cast(sum(CASE WHEN polarity IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_matched,
       |  count(*) AS n_toks
       |FROM toks LEFT JOIN lex ON w = word
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** Multimodal record: text metadata + embedding stats in one row. */
  val multimodalStruct: Q = (s, d) => {
    graft.plans.VectorFunctions.register(s)
    Tables.documents(s, d)
      .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"), col("label"),
        size(col("embedding")).as("dim"),
        round6(sqrt(Similarity.dot(col("embedding"), col("embedding")))).as("l2_norm"),
        size(filter(split(lower(col("text")), "\\s+"), t => t =!= "")).as("n_toks"))
  }

  val multimodalStructSql: String =
    s"""SELECT doc_id, lang, label,
       |  cast(len(embedding) as int) AS dim,
       |  ${round6Sql(s"sqrt(${Similarity.dotSql("embedding", "embedding")})")} AS l2_norm,
       |  cast(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) as int) AS n_toks
       |FROM documents JOIN embeddings ON doc_id = vec_id
       |ORDER BY doc_id""".stripMargin

  /** Token counting two ways: whitespace tokens and a BPE-ish subword count
    * (greedy 1-4 char word chunks via regex — the cheap proxy for a learned
    * subword vocab when budgeting sequence lengths). Pure integer output. */
  val tokenCount: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(filter(split(lower(col("text")), "\\s+"), t => t =!= "")).as("ws_toks"),
        size(regexp_extract_all(lower(col("text")), lit("([a-z]{1,4})"), lit(1))).as("bpeish_toks"),
        length(col("text")).as("n_chars2"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |  cast(len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) as int) AS ws_toks,
      |  cast(len(regexp_extract_all(lower(text), '([a-z]{1,4})', 1)) as int) AS bpeish_toks,
      |  cast(length(text) as int) AS n_chars2
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Polynomial rolling hash over the token stream (content fingerprint that
    * is order-sensitive, unlike the min-shingle fingerprint): a left fold of
    * acc*31 + tokenCode mod 2^31-1, with tokenCode from ascii/length so both
    * engines compute identical integers. */
  val rollingHash: Q = (s, d) => {
    val toksArr = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val code = (t: org.apache.spark.sql.Column) =>
      (ascii(t) * lit(131L) + length(t).cast("long"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        aggregate(toksArr, lit(0L),
          (acc, t) => pmod(acc * 31L + code(t), lit(2147483647L))).as("rhash"))
  }

  val rollingHashSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(cast(0 as bigint),
      |      list_transform(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> ''),
      |                     t -> cast(ascii(t) * 131 + length(t) as bigint))),
      |    (acc, c) -> ((acc * 31 + c) % 2147483647 + 2147483647) % 2147483647) AS rhash
      |FROM documents ORDER BY doc_id""".stripMargin

  /** End-to-end training-data pipeline composite: exact dedup (min-id
    * survivor per content hash) → quality gate (char band + minimum token
    * count) → per-(lang, source) corpus stats. The chain a real ingest runs
    * nightly, expressed as ONE declarative plan so Catalyst pipelines the
    * dedup aggregation straight into the filter and final rollup — no
    * materialization between stages. At 100 TB each stage keeps its scale
    * path (hash-partitioned dedup, map-side filter, partial+final agg). */
  val pipelineE2e: Q = (s, d) => {
    // Round 19: the old spelling scanned the corpus TWICE (hash pass +
    // stats pass) and re-joined the keeper ids back on doc_id — an
    // exchange that carried the full TEXT column through the join shuffle.
    // Now ONE scan projects (hash, stats) per doc and the exact-dup keeper
    // IS min_by(stats, doc_id) inside the hash group: text bytes never
    // enter any exchange (only the 32-byte hash + 4 small columns do), and
    // the second corpus read is gone. Equivalence: joining keep(min
    // doc_id per hash) back to documents selects exactly the min-id row's
    // columns, which is min_by by definition; doc_id is unique so min_by
    // is deterministic. Oracle unchanged.
    val docs = Tables.documents(s, d)
    docs
      .select(sha2(col("text"), 256).as("h"),
        struct(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          size(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
            .as("n_toks")).as("st"))
      .groupBy("h").agg(min_by(col("st"), col("st.doc_id")).as("k"))
      .select(col("k.lang").as("lang"), col("k.source").as("source"),
              col("k.n_chars").as("n_chars"), col("k.n_toks").as("n_toks"))
      .where(col("n_chars").between(100, 2000) && col("n_toks") >= 10)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("kept_docs"),
           sum(col("n_toks")).cast("bigint").as("total_toks"),
           sum(col("n_chars")).cast("bigint").as("sum_chars"))
  }

  val pipelineE2eSql: String =
    """WITH keep AS (
      |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
      |docs AS (
      |  SELECT d.*, cast(len(list_filter(string_split_regex(lower(text), '\s+'),
      |                                   t -> t <> '')) as int) AS n_toks
      |  FROM documents d JOIN keep USING (doc_id))
      |SELECT lang, source, count(*) AS kept_docs,
      |  cast(sum(n_toks) as bigint) AS total_toks,
      |  cast(sum(n_chars) as bigint) AS sum_chars
      |FROM docs
      |WHERE n_chars BETWEEN 100 AND 2000 AND n_toks >= 10
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** Intra-document repetition filter (the Gopher/C4-style quality rule the
    * inter-document dedup family cannot express): fraction of DUPLICATED
    * bigrams within each doc, and the most-frequent-token share. Highly
    * repetitive documents (boilerplate, keyword stuffing, degenerate
    * generations) score high on both and are dropped by the keep flag.
    *
    * Scale: the bigram stats are pure map-side HOFs over the token array
    * (zero shuffle); the top-token share is one explode + (doc_id, w)
    * aggregation — the same single-shuffle shape as wordcount. Exact
    * integer ratios → deterministic doubles on both engines.
    */
  val repetitionFilter: Q = (s, d) => {
    val t = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        filter(split(lower(col("text")), "\\s+"), x => x =!= "").as("t"))
      .where(size(col("t")) >= 2)
    val bigr = transform(sequence(lit(1), size(col("t")) - 1),
      i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1)))
    // Round 19: the top-token branch reads the SHARED (doc_id, w, c)
    // pre-aggregation instead of running its own second corpus tokenize —
    // the per-doc max stays clustered on doc_id, so the branch adds no
    // text scan and no new exchange. (A zero-join spelling — longest
    // equal-run fold over the sorted token array — was tried and measured
    // SLOWER at sf0.1, 0.63 → 0.92 s: higher-order-function lambdas
    // evaluate interpreted per element, which loses to the codegen'd hash
    // aggregation; rejected.) Oracle unchanged.
    val perDoc = t.select(col("doc_id"), col("lang"),
        size(col("t")).cast("bigint").as("n_toks"),
        size(bigr).cast("bigint").as("n_bigrams"),
        size(array_distinct(bigr)).cast("bigint").as("n_distinct_bigrams"))
    val topTok = docWordCounts(s, d)
      .groupBy("doc_id").agg(max("c").as("top_tok_n"))
    perDoc.join(topTok, "doc_id")
      .withColumn("dup_bigram_frac",
        round6(lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams")))
      .withColumn("top_tok_share", round6(col("top_tok_n").cast("double") / col("n_toks")))
      .withColumn("keep",
        (col("dup_bigram_frac") <= 0.2 && col("top_tok_share") <= 0.1).cast("int"))
      .select("doc_id", "lang", "n_toks", "n_bigrams", "n_distinct_bigrams",
              "top_tok_n", "dup_bigram_frac", "top_tok_share", "keep")
  }

  val repetitionFilterSql: String =
    s"""WITH $toksSqlCte,
       |arr AS (
       |  SELECT doc_id, lang,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |bi AS (
       |  SELECT doc_id, lang,
       |    cast(len(t) as bigint) AS n_toks,
       |    cast(len(t) - 1 as bigint) AS n_bigrams,
       |    cast(len(list_distinct(list_transform(range(1, len(t)),
       |      i -> t[i] || ' ' || t[i+1]))) as bigint) AS n_distinct_bigrams
       |  FROM arr WHERE len(t) >= 2),
       |tt AS (
       |  SELECT doc_id, cast(max(c) as bigint) AS top_tok_n
       |  FROM (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w)
       |  GROUP BY doc_id)
       |SELECT doc_id, lang, n_toks, n_bigrams, n_distinct_bigrams, top_tok_n,
       |  dup_bigram_frac, top_tok_share,
       |  cast(CASE WHEN dup_bigram_frac <= 0.2
       |        AND top_tok_share <= 0.1 THEN 1 ELSE 0 END as int) AS keep
       |FROM (
       |  SELECT doc_id, lang, n_toks, n_bigrams, n_distinct_bigrams, top_tok_n,
       |    ${round6Sql("1.0 - cast(n_distinct_bigrams as double) / n_bigrams")} AS dup_bigram_frac,
       |    ${round6Sql("cast(top_tok_n as double) / n_toks")} AS top_tok_share
       |  FROM bi JOIN tt USING (doc_id))
       |ORDER BY doc_id""".stripMargin

  /** Unigram-LM self-scoring (the CCNet-style perplexity quality signal,
    * with the corpus's own unigram distribution standing in for the external
    * LM this container cannot ship): per document, the summed and mean
    * negative log-probability of its tokens under p(w) = cnt(w)/N, plus a
    * coarse integer bucket. Fluent, ordinary text scores low; rare-token
    * soup scores high.
    *
    * Determinism: per-token cost is integerized FIRST —
    * micro = round(ln(N/cnt)·10⁶) as bigint — so the per-doc aggregation is
    * an exact integer sum (order-independent under any partitioning), and
    * the mean is one IEEE division of exact integers. No float aggregation
    * anywhere. Scale: the unigram table is vocabulary-sized → the
    * size-adaptive [[vocabJoin]]; one shuffle for the doc_id
    * re-aggregation. */
  val unigramLogprob: Q = (s, d) => {
    // Round 19: the old spelling evaluated the corpus tokenize THREE times
    // (vocabulary counts, corpus total, scored fact side). All three now
    // derive from the shared (doc_id, w, c) pre-aggregation: the unigram LM
    // counts are sum(c) per word, the corpus total sum(c), and the per-doc
    // NLL sums c·micro per DISTINCT word — identical bigint arithmetic (the
    // micro score is per-word; multiplying by the exact count is the same
    // sum the per-token rows produced). The fact side of the vocab join
    // shrinks from token rows to distinct (doc, word) rows, and the final
    // per-doc aggregation stays clustered on doc_id (broadcast join
    // preserves partitioning) — no new exchange. Oracle unchanged.
    val dw = docWordCounts(s, d)
    val cnt = dw.groupBy("w").agg(sum("c").as("c"))
    val n = dw.agg(sum("c").as("n_total"))
    val scored = vocabJoin(dw.select(col("doc_id"), col("w"), col("c").as("dc")),
                           cnt, "w")
      .crossJoin(broadcast(n))
      .withColumn("micro",
        round(log(col("n_total").cast("double") / col("c")) * 1e6, 0).cast("bigint"))
    scored.groupBy("doc_id")
      .agg(sum(col("dc")).as("n_toks"),
           sum(col("dc") * col("micro")).as("nll_micro"))
      .withColumn("mean_nll", round6(col("nll_micro").cast("double") / col("n_toks")))
      .withColumn("nll_bucket", floor(col("mean_nll") / 1e6).cast("int"))
      .select("doc_id", "n_toks", "nll_micro", "mean_nll", "nll_bucket")
  }

  val unigramLogprobSql: String =
    s"""WITH $toksSqlCte,
       |cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
       |n AS (SELECT count(*) AS n_total FROM toks),
       |scored AS (
       |  SELECT doc_id,
       |    cast(round(ln(cast(n_total as double) / c) * 1e6, 0) as bigint) AS micro
       |  FROM toks JOIN cnt USING (w) CROSS JOIN n),
       |per AS (
       |  SELECT doc_id, count(*) AS n_toks, cast(sum(micro) as bigint) AS nll_micro
       |  FROM scored GROUP BY doc_id)
       |SELECT doc_id, n_toks, nll_micro, mean_nll,
       |  cast(floor(mean_nll / 1e6) as int) AS nll_bucket
       |FROM (
       |  SELECT doc_id, n_toks, nll_micro,
       |    ${round6Sql("cast(nll_micro as double) / n_toks")} AS mean_nll
       |  FROM per)
       |ORDER BY doc_id""".stripMargin

  val ZipfTopTerms = 500

  /** Zipf-law fit per language: least-squares slope/intercept of
    * ln(freq) ~ ln(rank) over the top-500 terms — the corpus-health
    * diagnostic (natural language tracks slope ≈ −1; spam/generated text
    * deviates). The regression is computed from EXACT integer sums: each
    * (ln rank, ln freq) point is integerized to milli-nats (≤ ~14·10³, so
    * Σxy over 500 points stays far inside int64), then
    * slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) with bigint numerators — the only
    * float ops are the two final divisions of exactly-representable
    * integers, identical on both engines (regr_slope would sum doubles in
    * partition order — nondeterministic across engines and runs).
    * Scale: term counts are one wordcount shuffle; the per-lang ranking
    * windows over vocabulary-sized data (bounded, ≪ corpus). */
  val zipfCurve: Q = (s, d) => {
    val tf = toks(s, d).groupBy("lang", "w").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("c").desc, col("w"))
    val pts = tf.withColumn("rk", row_number().over(w))
      .where(col("rk") <= ZipfTopTerms)
      .select(col("lang"),
        round(log(col("rk").cast("double")) * 1e3, 0).cast("bigint").as("x"),
        round(log(col("c").cast("double")) * 1e3, 0).cast("bigint").as("y"))
    pts.groupBy("lang")
      .agg(count(lit(1)).as("n_terms"),
           sum(col("x")).as("sx"), sum(col("y")).as("sy"),
           sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("slope_raw",
        (col("n_terms") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n_terms") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("slope", round6(col("slope_raw")))
      .withColumn("intercept",
        round6((col("sy").cast("double") - col("slope_raw") * col("sx").cast("double")) /
        col("n_terms").cast("double")))
      .select("lang", "n_terms", "slope", "intercept")
  }

  val zipfCurveSql: String =
    s"""WITH $toksSqlCte,
       |tf AS (SELECT lang, w, count(*) AS c FROM toks GROUP BY lang, w),
       |ranked AS (
       |  SELECT lang, c,
       |    row_number() OVER (PARTITION BY lang ORDER BY c DESC, w) AS rk
       |  FROM tf),
       |pts AS (
       |  SELECT lang,
       |    cast(round(ln(cast(rk as double)) * 1e3, 0) as bigint) AS x,
       |    cast(round(ln(cast(c as double)) * 1e3, 0) as bigint) AS y
       |  FROM ranked WHERE rk <= $ZipfTopTerms),
       |sums AS (
       |  SELECT lang, count(*) AS n_terms,
       |    cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
       |    cast(sum(x * y) as bigint) AS sxy, cast(sum(x * x) as bigint) AS sxx
       |  FROM pts GROUP BY lang)
       |SELECT lang, n_terms,
       |  ${round6Sql("slope_raw")} AS slope,
       |  ${round6Sql(
             "(cast(sy as double) - slope_raw * cast(sx as double)) / cast(n_terms as double)")} AS intercept
       |FROM (
       |  SELECT lang, n_terms, sx, sy,
       |    cast(n_terms * sxy - sx * sy as double) /
       |      cast(n_terms * sxx - sx * sx as double) AS slope_raw
       |  FROM sums)
       |ORDER BY lang""".stripMargin

  /** One round of BPE vocabulary training as a dataflow: count every
    * adjacent character pair across the corpus vocabulary, weighted by word
    * frequency — the argmax pair is the merge a byte-pair-encoding tokenizer
    * would learn next. (Full BPE iterates this with a re-segmented vocab;
    * the per-round dataflow is identical, so this is the repeating unit.)
    *
    * Scale: pair extraction runs over the DISTINCT word vocabulary (bounded,
    * ≪ corpus) with frequencies from one wordcount shuffle; the pair
    * aggregation is vocabulary-sized. Pure integer counts → oracle-exact. */
  val bpePairCounts: Q = (s, d) => {
    val wc = toks(s, d).groupBy("w").agg(count(lit(1)).as("wcnt"))
    wc.where(length(col("w")) >= 2)
      .select(col("wcnt"),
        explode(expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")).as("pair"))
      .groupBy("pair")
      .agg(sum(col("wcnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)
  }

  val bpePairCountsSql: String =
    s"""WITH $toksSqlCte,
       |wc AS (SELECT w, count(*) AS wcnt FROM toks GROUP BY w),
       |pairs AS (
       |  SELECT wcnt, substr(w, i, 2) AS pair
       |  FROM wc, unnest(generate_series(1, length(w) - 1)) AS g(i)
       |  WHERE length(w) >= 2)
       |SELECT pair, cast(sum(wcnt) as bigint) AS cnt
       |FROM pairs GROUP BY pair
       |ORDER BY cnt DESC, pair
       |LIMIT 20""".stripMargin

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every document by the
    * log-likelihood ratio of its tokens under a hashed-unigram model of a
    * TARGET distribution (here: `source = 'src0'`, standing in for the
    * high-quality target corpus) versus the RAW distribution (everything
    * else), with add-1 smoothing over the bucket space. High weight = looks
    * like the target; resampling by this weight is the data-selection step.
    *
    * Features are 256 buckets keyed by the first two hex chars of md5(w) —
    * md5 is the cross-engine-identical hash (xxhash64 has no DuckDB twin).
    * Determinism: per-token log-ratio is integerized to micro-nats FIRST
    * (round(·1e6) as bigint), so the per-doc aggregation is an exact
    * integer sum under any partitioning (the per-bucket spelling multiplies
    * that same integer by an exact bigint count — identical totals); the
    * mean is one IEEE division.
    * Scale: ONE tokenize pass (round 19 — the 4-consumer spelling re-ran
    * the corpus explode for tcnt/rcnt/tot/scored since Catalyst does not
    * dedupe shared subplans; the full-suite audit read 2.5× the oracle on
    * a plan whose only defect was that): tokens partial-aggregate map-side
    * to (doc, source, bucket) counts — ≤256 rows per doc regardless of
    * length — and everything downstream (the 256-row bucket table, its
    * totals, the per-doc score) derives from that cached frame. The micro
    * score depends only on the bucket, so Σ_tokens micro ≡ Σ_buckets
    * cnt·micro exactly. One corpus shuffle; bucket tables broadcast. */
  val dsirWeights: Q = (s, d) => {
    val db = toks(s, d)
      .select(col("doc_id"), col("source"),
              substring(md5(col("w")), 1, 2).as("b"))
      .groupBy("doc_id", "source", "b").agg(count(lit(1)).as("cnt"))
      .transform(graft.Caching.cachedOnce)
    val buckets = db.groupBy("b").agg(
      sum(when(col("source") === "src0", col("cnt")).otherwise(0L)).as("tc"),
      sum(when(col("source") =!= "src0", col("cnt")).otherwise(0L)).as("rc"))
    val tot = buckets.agg(sum("tc").as("nt"), sum("rc").as("nr"))
    val scored = db
      .join(broadcast(buckets.crossJoin(tot)), Seq("b"), "left")
      .withColumn("micro",
        round((log((coalesce(col("tc"), lit(0L)) + 1).cast("double") /
                   (col("nt") + 256)) -
               log((coalesce(col("rc"), lit(0L)) + 1).cast("double") /
                   (col("nr") + 256))) * 1e6, 0).cast("bigint"))
    scored.groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_toks"),
           sum(col("cnt") * col("micro")).as("dsir_micro"))
      .withColumn("avg_logratio", round6(col("dsir_micro").cast("double") / col("n_toks")))
      .select("doc_id", "n_toks", "dsir_micro", "avg_logratio")
  }

  val dsirWeightsSql: String =
    s"""WITH $toksSqlCte,
       |tb AS (SELECT doc_id, source, substr(md5(w), 1, 2) AS b FROM toks),
       |tcnt AS (SELECT b, count(*) AS tc FROM tb WHERE source = 'src0' GROUP BY b),
       |rcnt AS (SELECT b, count(*) AS rc FROM tb WHERE source <> 'src0' GROUP BY b),
       |tot AS (
       |  SELECT sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS nt,
       |         sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS nr
       |  FROM tb),
       |scored AS (
       |  SELECT doc_id,
       |    cast(round((ln(cast(coalesce(tc, 0) + 1 as double) / (nt + 256))
       |              - ln(cast(coalesce(rc, 0) + 1 as double) / (nr + 256))) * 1e6, 0)
       |         as bigint) AS micro
       |  FROM tb LEFT JOIN tcnt USING (b) LEFT JOIN rcnt USING (b) CROSS JOIN tot),
       |per AS (
       |  SELECT doc_id, count(*) AS n_toks, cast(sum(micro) as bigint) AS dsir_micro
       |  FROM scored GROUP BY doc_id)
       |SELECT doc_id, n_toks, dsir_micro,
       |  ${round6Sql("cast(dsir_micro as double) / n_toks")} AS avg_logratio
       |FROM per ORDER BY doc_id""".stripMargin

  /** CCNet-style perplexity bucketing: rank every document inside its
    * language by unigram-LM mean NLL ([[unigramLogprob]]'s signal) and cut
    * each language into head/middle/tail terciles (ntile(3) with the
    * deterministic (mean_nll, doc_id) order). Output is the per-bucket
    * summary a curation pipeline keys its sampling rates on. The bucket
    * mean is token-weighted and computed from exact integer sums — no float
    * aggregation. Scale: TWO tokenize passes, down from three (round 19
    * full-suite audit): the vocabulary table is materialized once (the
    * tfidf discipline — a small AGGREGATED cache), so the corpus total
    * derives from it instead of its own corpus pass and the scoring join
    * reads the same cache. Three other spellings were tried in
    * interleaved cross-binary A/B and REJECTED: a (doc, word)
    * pre-aggregation trades the saved tokenize passes for a
    * ~token-count-row shuffle; caching the raw TOKEN frame (to reach one
    * pass) costs more in cache materialization than the narrow
    * re-tokenize it saves (+12% at sf0.1); and deriving the total from
    * an UNcached vocabulary table re-runs the whole tokenize+agg per
    * consumer (Catalyst does not dedupe shared subplans). Both
    * aggregations partial-aggregate map-side (vocab-level and doc-level
    * shuffles only); the window partitions by language over doc-level
    * rows. */
  val perplexityBucket: Q = (s, d) => {
    val tok = toks(s, d).select("doc_id", "lang", "w")
    val cnt = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .transform(graft.Caching.cachedOnce)
    val n = cnt.agg(sum("c").as("n_total"))
    val per = vocabJoin(tok, cnt, "w").crossJoin(broadcast(n))
      .withColumn("micro",
        round(log(col("n_total").cast("double") / col("c")) * 1e6, 0).cast("bigint"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_toks"), sum(col("micro")).as("nll_micro"))
      .withColumn("mean_nll", col("nll_micro").cast("double") / col("n_toks"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("mean_nll"), col("doc_id"))
    per.withColumn("bucket", ntile(3).over(w))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("docs"),
           sum(col("n_toks")).as("toks"),
           sum(col("nll_micro")).as("nll_micro_sum"))
      .withColumn("weighted_mean_nll",
        round6(col("nll_micro_sum").cast("double") / col("toks")))
      .select("lang", "bucket", "docs", "toks", "nll_micro_sum",
              "weighted_mean_nll")
  }

  val perplexityBucketSql: String =
    s"""WITH $toksSqlCte,
       |cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
       |n AS (SELECT count(*) AS n_total FROM toks),
       |per AS (
       |  SELECT doc_id, lang, count(*) AS n_toks,
       |    cast(sum(cast(round(ln(cast(n_total as double) / c) * 1e6, 0) as bigint))
       |         as bigint) AS nll_micro
       |  FROM toks JOIN cnt USING (w) CROSS JOIN n
       |  GROUP BY doc_id, lang, n_total),
       |ranked AS (
       |  SELECT lang, n_toks, nll_micro,
       |    ntile(3) OVER (PARTITION BY lang
       |                   ORDER BY cast(nll_micro as double) / n_toks, doc_id) AS bucket
       |  FROM per)
       |SELECT lang, bucket, count(*) AS docs,
       |  cast(sum(n_toks) as bigint) AS toks,
       |  cast(sum(nll_micro) as bigint) AS nll_micro_sum,
       |  ${round6Sql("cast(sum(nll_micro) as double) / sum(n_toks)")} AS weighted_mean_nll
       |FROM ranked GROUP BY lang, bucket
       |ORDER BY lang, bucket""".stripMargin

  /** PII scrubbing: count and redact emails / IPv4 addresses / phone
    * numbers with the standard regex pass. The synthetic fixture carries no
    * PII, so the operator PLANTS deterministic PII per doc (doc_id-keyed
    * email, IP, phone appended to a text prefix) and then scrubs it — the
    * redaction dataflow, counts, and the scrubbed-content digest are all
    * real and oracle-checked; only the planted input stands in for dirty
    * data. Patterns stay in the regex subset Java and RE2 agree on.
    * Scale: pure map-side — no shuffle at all until the final sort. */
  val piiScrub: Q = (s, d) => {
    val planted = concat(
      substring(col("text"), 1, 40),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or 10.0."), (col("doc_id") % 256).cast("string"),
      lit(".7 ref +1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val email = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"
    val phone = "\\+1-555-[0-9]{4}"
    val ip = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
    Tables.documents(s, d)
      .select(col("doc_id"), planted.as("raw"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(email), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("raw"), lit(phone), lit(0))).as("n_phones"),
        regexp_replace(regexp_replace(regexp_replace(col("raw"),
          email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>").as("scrubbed"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
              size(regexp_extract_all(col("scrubbed"), lit("<IP>"), lit(0))).as("n_ips"),
              md5(col("scrubbed")).as("scrubbed_md5"))
  }

  val piiScrubSql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    substr(text, 1, 40) || ' contact user' || cast(doc_id as varchar)
      |      || '@example.com or 10.0.' || cast(doc_id % 256 as varchar)
      |      || '.7 ref +1-555-' || lpad(cast(doc_id % 10000 as varchar), 4, '0') AS raw
      |  FROM documents),
      |scrub AS (
      |  SELECT doc_id,
      |    cast(len(regexp_extract_all(raw, '[a-z0-9.]+@[a-z0-9.]+\.[a-z]+')) as int) AS n_emails,
      |    cast(len(regexp_extract_all(raw, '\+1-555-[0-9]{4}')) as int) AS n_phones,
      |    regexp_replace(regexp_replace(regexp_replace(raw,
      |      '[a-z0-9.]+@[a-z0-9.]+\.[a-z]+', '<EMAIL>', 'g'),
      |      '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
      |      '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g') AS scrubbed
      |  FROM planted)
      |SELECT doc_id, n_emails, n_phones,
      |  cast(len(regexp_extract_all(scrubbed, '<IP>')) as int) AS n_ips,
      |  md5(scrubbed) AS scrubbed_md5
      |FROM scrub ORDER BY doc_id""".stripMargin

  val ChunkSize = 64
  val ChunkStride = 48

  /** Context-window chunking: split each document into fixed 64-token
    * chunks at stride 48 (16-token overlap) — the RAG / training-example
    * preparation primitive. Emits one row per chunk with its digest, so
    * the output IS the chunk manifest a downstream embedder consumes.
    * Scale: chunk starts and slices are per-row array HOFs (zero shuffle);
    * the explode multiplies rows by ~n/stride, the expected fan-out. */
  val docChunks: Q = (s, d) => {
    val t = Tables.documents(s, d)
      .select(col("doc_id"),
              filter(split(lower(col("text")), "\\s+"), x => x =!= "").as("t"))
      .withColumn("n_toks", size(col("t")).cast("bigint"))
      .where(col("n_toks") >= 1)
    t.select(col("doc_id"), col("t"), col("n_toks"),
             posexplode(sequence(lit(1), col("n_toks"), lit(ChunkStride)))
               .as(Seq("ci", "start")))
      .withColumn("chunk_len",
        least(lit(ChunkSize), col("n_toks") - col("start") + 1).cast("bigint"))
      .withColumn("chunk_md5",
        md5(concat_ws(" ",
          expr(s"slice(t, start, $ChunkSize)"))))
      .select(col("doc_id"), col("ci").cast("int").as("chunk_idx"),
              col("start").cast("bigint").as("start_tok"),
              col("chunk_len"), col("chunk_md5"))
  }

  val docChunksSql: String =
    s"""WITH arr AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, t, cast(len(t) as bigint) AS n_toks
       |  FROM arr WHERE len(t) >= 1),
       |chunks AS (
       |  SELECT doc_id, n_toks, g.i AS start,
       |    cast((g.i - 1) / $ChunkStride as int) AS chunk_idx
       |  FROM base, unnest(generate_series(1, n_toks, $ChunkStride)) AS g(i))
       |SELECT c.doc_id, c.chunk_idx, cast(c.start as bigint) AS start_tok,
       |  cast(least($ChunkSize, c.n_toks - c.start + 1) as bigint) AS chunk_len,
       |  md5(array_to_string(b.t[c.start:c.start + ${ChunkSize - 1}], ' ')) AS chunk_md5
       |FROM chunks c JOIN base b USING (doc_id)
       |ORDER BY doc_id, chunk_idx""".stripMargin

  /** Model-based quality scoring (the DCLM / FineWeb-Edu curation step): a
    * DEPLOYED linear classifier over hashed bag-of-words — 64 md5-derived
    * buckets, fixed integer milli-weights (themselves md5-derived, so the
    * whole model is reproducible from code), per-token-normalized logit and
    * sigmoid score with a keep flag at 0.5.
    *
    * Determinism: bucket counts × integer milli-weights accumulate in exact
    * bigint (order-free under any partitioning); only the final
    * normalization and sigmoid are float — identical IEEE division and a
    * 6dp-rounded exp (the fnMath discipline). At 100 TB this is one
    * wordcount-shaped aggregation; the "model" never shuffles at all since
    * the weight is an expression of the bucket id. */
  val qualityClassifier: Q = (s, d) => {
    val bucketed = toks(s, d)
      .select(col("doc_id"),
        (conv(substring(md5(col("w")), 1, 2), 16, 10).cast("bigint") % 64).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
    val wm = conv(substring(md5(concat(lit("wt:"), col("b").cast("string"))), 1, 4), 16, 10)
      .cast("bigint") % 2001 - 1000
    bucketed.withColumn("wm", wm)
      .groupBy("doc_id")
      .agg(sum(col("cnt") * col("wm")).as("dot_milli"),
           sum(col("cnt")).as("n_toks"))
      .withColumn("logit_raw",
        col("dot_milli").cast("double") / (col("n_toks") * 1000))
      .withColumn("logit", round6(col("logit_raw")))
      .withColumn("score6", round(lit(1.0) / (lit(1.0) + exp(-col("logit_raw"))), 6))
      .withColumn("keep", (col("score6") >= 0.5).cast("int"))
      .select("doc_id", "n_toks", "dot_milli", "logit", "score6", "keep")
  }

  val qualityClassifierSql: String =
    s"""WITH $toksSqlCte,
       |bucketed AS (
       |  SELECT doc_id,
       |    cast(('0x' || substr(md5(w), 1, 2)) as bigint) % 64 AS b,
       |    count(*) AS cnt
       |  FROM toks GROUP BY doc_id, b),
       |scored AS (
       |  SELECT doc_id,
       |    cast(sum(cnt * (cast(('0x' || substr(md5('wt:' || cast(b as varchar)), 1, 4)) as bigint)
       |                    % 2001 - 1000)) as bigint) AS dot_milli,
       |    cast(sum(cnt) as bigint) AS n_toks
       |  FROM bucketed GROUP BY doc_id)
       |SELECT doc_id, n_toks, dot_milli,
       |  ${round6Sql("logit_raw")} AS logit,
       |  round(1.0 / (1.0 + exp(-logit_raw)), 6) AS score6,
       |  cast(round(1.0 / (1.0 + exp(-logit_raw)), 6) >= 0.5 as int) AS keep
       |FROM (
       |  SELECT doc_id, n_toks, dot_milli,
       |    cast(dot_milli as double) / (n_toks * 1000) AS logit_raw
       |  FROM scored)
       |ORDER BY doc_id""".stripMargin

  /** Span-corruption preprocessing (T5/UL2 denoising objective): positions
    * are span STARTS when an md5-keyed draw hits 1-in-20 (≈5%), each span
    * masks [[SpanLen]] tokens, overlapping spans merge via the distinct
    * union. Per doc: token/span/masked counts, corruption rate, and an md5
    * of the in-order masked tokens — the digest proves the actual tokens
    * were extracted, not just counted.
    *
    * Determinism: the "randomness" is md5(doc_id:pos) — reproducible across
    * engines, reruns, and cluster sizes (a production pipeline needs
    * exactly this property so retries don't produce different corpora).
    * Scale: one posexplode → span explode (×[[SpanLen]]) → distinct →
    * self-join on (doc, pos) — all hash-partitioned on doc_id. The
    * positioned-token frame feeds THREE consumers (per-doc counts, span
    * starts, the masked-token join-back), so it is materialized once
    * (round 19 — Catalyst does not dedupe shared subplans; the full-suite
    * audit read 3 corpus explodes on this plan). */
  val SpanRate = 20 // 1-in-20 positions start a span
  val SpanLen = 3

  val spanCorruption: Q = (s, d) => {
    val tk = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(filter(split(lower(col("text")), "\\s+"), t => t =!= "")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
      .transform(graft.Caching.cachedOnce)
    val n = tk.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
    val isStart =
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
                                col("pos").cast("string"))), 1, 4), 16, 10)
        .cast("bigint") % SpanRate === 0
    val starts = tk.where(isStart).select(col("doc_id"), col("pos"))
    val masked = starts.join(n, "doc_id")
      .select(col("doc_id"),
        explode(sequence(col("pos"),
                         least(col("pos") + (SpanLen - 1), col("n_toks")))).as("mpos"))
      .distinct()
    val maskedToks = masked
      .join(tk.select(col("doc_id"), col("pos").as("mpos"), col("tok")),
            Seq("doc_id", "mpos"))
    val perDoc = maskedToks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_masked"),
           md5(array_join(transform(
             array_sort(collect_list(struct(col("mpos"), col("tok")))),
             x => x.getField("tok")), " ")).as("masked_md5"))
    val nSpans = starts.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
    n.join(nSpans, Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        round6(coalesce(col("n_masked"), lit(0L)).cast("double") / col("n_toks"))
          .as("corruption_rate"),
        coalesce(col("masked_md5"), lit("")).as("masked_md5"))
  }

  val spanCorruptionSql: String =
    s"""WITH tk AS (
       |  SELECT doc_id, g.i AS pos, t[g.i] AS tok
       |  FROM (SELECT doc_id,
       |          list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
       |        FROM documents),
       |       unnest(generate_series(1, len(t))) AS g(i)),
       |n AS (SELECT doc_id, count(*) AS n_toks FROM tk GROUP BY doc_id),
       |starts AS (
       |  SELECT doc_id, pos FROM tk
       |  WHERE cast(('0x' || substr(md5(cast(doc_id as varchar) || ':' ||
       |                             cast(pos as varchar)), 1, 4)) as bigint)
       |        % $SpanRate = 0),
       |masked AS (
       |  SELECT DISTINCT s.doc_id, g.mp AS mpos
       |  FROM starts s JOIN n USING (doc_id),
       |       unnest(generate_series(s.pos,
       |         least(s.pos + ${SpanLen - 1}, n.n_toks))) AS g(mp)),
       |per_doc AS (
       |  SELECT m.doc_id, count(*) AS n_masked,
       |    md5(string_agg(t.tok, ' ' ORDER BY m.mpos)) AS masked_md5
       |  FROM masked m JOIN tk t ON m.doc_id = t.doc_id AND m.mpos = t.pos
       |  GROUP BY m.doc_id),
       |spans AS (SELECT doc_id, count(*) AS n_spans FROM starts GROUP BY doc_id)
       |SELECT n.doc_id, n.n_toks,
       |  coalesce(s.n_spans, 0) AS n_spans,
       |  coalesce(p.n_masked, 0) AS n_masked,
       |  ${round6Sql("cast(coalesce(p.n_masked, 0) as double) / n.n_toks")} AS corruption_rate,
       |  coalesce(p.masked_md5, '') AS masked_md5
       |FROM n
       |LEFT JOIN spans s ON n.doc_id = s.doc_id
       |LEFT JOIN per_doc p ON n.doc_id = p.doc_id
       |ORDER BY n.doc_id""".stripMargin

  // ---- retrieval: BM25 ranking + boolean keyword search -------------------

  /** Fixed 3-term query for the retrieval operators (all present in the
    * synthetic vocabulary at every SF, with slightly different df). */
  private val QueryTerms = Seq("join", "window", "scan")

  /** Okapi BM25 (Lucene's always-positive `ln(1 + (N-df+0.5)/(df+0.5))` idf)
    * top-20 ranking of documents for [[QueryTerms]], OR semantics.
    *
    * Shape: ONE token explode → ONE per-doc aggregation producing BOTH the
    * document length and a conditional-sum tf column per fixed query term
    * (the query is a constant ≤|query|-term list, so the pivot width is
    * bounded at any corpus scale). The per-term unpivot (a Generate over
    * the per-term struct array) and the
    * broadcast joins are projections over that frame, so its doc_id hash
    * partitioning carries through to the final per-doc score aggregation —
    * the tokenize aggregation's exchange is the ONLY corpus-sized shuffle
    * in the whole query. (The previous shape ran the tokenize+explode
    * pipeline twice — once for tf, once for dl — and re-shuffled to join
    * them back; at 100 TB tokenization IS the data work, so one pass halves
    * the scan+explode cost and the join disappears entirely.)
    *
    * Determinism: the idf is integerized to micro-nats per term BEFORE the
    * per-doc sum (bigint arithmetic is order-free; a double sum would depend
    * on Spark's partition order), and the tf-normalization chain is written
    * with identical literals/parenthesization in both engines so every IEEE
    * step is bit-identical; the final per-term contribution is rounded to an
    * integer micro-score.
    */
  val bm25: Q = (s, d) => {
    // Round 20: docstats derives from the SHARED docWordCounts cache (the
    // same materialization tfidf/bpeEncode/unigramLogprob/repetitionFilter
    // use) instead of maintaining its own per-doc cached aggregate — one
    // session-wide tokenize serves five operators, and the derivation is a
    // no-exchange aggregation over the in-memory frame (docWordCounts is
    // clustered on doc_id), cheap enough per consumer that the second
    // cache level is gone. dl = Σc and per-term tf = Σc·[w = t] are the
    // same integers the direct tokenize counted; oracle unchanged.
    val perTerm = QueryTerms.map(t =>
      sum(when(col("w") === t, col("c")).otherwise(0L)).as(s"tf_$t"))
    val docstats = docWordCounts(s, d).groupBy("doc_id")
      .agg(sum(col("c")).as("dl"), perTerm: _*)
    val stats = docstats.agg(count(lit(1)).as("n_docs"),
                             (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // unpivot to (doc_id, dl, w, tf) keeping only hits — row-identical to the
    // old filtered groupBy(doc_id, w) tf table, with dl already on the row.
    // Typed Columns, not an interpolated stack() SQL string (round-10
    // advisor): a future query term containing a quote or a non-identifier
    // char (`data-set` → `tf_data-set` parses as subtraction) would break
    // or silently mis-parse the string spelling; lit()/col() can't.
    // Plan-identical: both spellings are one Generate over the agg output.
    val tf = docstats.select(col("doc_id"), col("dl"),
        explode(array(QueryTerms.map(t =>
          struct(lit(t).as("w"), col(s"tf_$t").as("tf"))): _*)).as("p"))
      .select(col("doc_id"), col("dl"), col("p.w").as("w"), col("p.tf").as("tf"))
      .where(col("tf") > 0)
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_micro",
        round(log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
                             (col("df").cast("double") + lit(0.5))) * 1e6, 0).cast("bigint"))
    val tfnorm = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
       lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))))
    // NOT vocabulary-sized: dfreq is keyed by the fixed QueryTerms list
    // (≤ |query| rows at any corpus scale), so the hard broadcast is safe
    tf.join(broadcast(dfreq), "w")
      .withColumn("contrib_micro",
        round(col("idf_micro").cast("double") * tfnorm, 0).cast("bigint"))
      .groupBy("doc_id")
      .agg(sum(col("contrib_micro")).as("score_micro"),
           count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(20)
  }

  val bm25Sql: String = {
    val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH $toksSqlCte,
       |tf AS (
       |  SELECT doc_id, w, count(*) AS tf FROM toks
       |  WHERE w IN ($terms) GROUP BY doc_id, w),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       |stats AS (
       |  SELECT count(*) AS n_docs,
       |         cast(sum(dl) as double) / count(*) AS avgdl
       |  FROM dl),
       |dfreq AS (
       |  SELECT w, cast(round(ln(1.0 + (cast(n_docs as double) - cast(df as double) + 0.5)
       |                              / (cast(df as double) + 0.5)) * 1e6, 0) as bigint) AS idf_micro
       |  FROM (SELECT w, count(*) AS df FROM tf GROUP BY w) CROSS JOIN stats),
       |contrib AS (
       |  SELECT tf.doc_id,
       |    cast(round(cast(idf_micro as double) *
       |      ((cast(tf as double) * 2.2) /
       |       (cast(tf as double) +
       |        1.2 * (0.25 + 0.75 * (cast(dl as double) / (SELECT avgdl FROM stats))))), 0) as bigint)
       |      AS contrib_micro
       |  FROM tf JOIN dl ON tf.doc_id = dl.doc_id JOIN dfreq ON tf.w = dfreq.w)
       |SELECT doc_id, cast(sum(contrib_micro) as bigint) AS score_micro,
       |       count(*) AS n_terms_hit
       |FROM contrib GROUP BY doc_id
       |ORDER BY score_micro DESC, doc_id
       |LIMIT 20""".stripMargin
  }

  /** Boolean keyword retrieval over inverted-index semantics: documents
    * containing ALL of [[QueryTerms]] (conjunctive AND via a distinct
    * (doc,term) agg + HAVING full hit count) and NOT containing 'slow'.
    * One explode → one partial-agg shuffle; the NOT side is a left-anti
    * join on doc_id, which Spark plans map-side when the excluded-doc set
    * broadcasts. */
  val keywordSearch: Q = (s, d) => {
    // Round 19: one corpus pass instead of two — the positive terms and the
    // exclusion term filter the same tokenize, so a single aggregation
    // computes both the distinct-hit count and the exclusion flag
    // (left_anti against a distinct list ≡ max(is-excluded) IS NULL).
    // "slow" is not in QueryTerms, so the two counters never interact.
    val terms = toks(s, d)
      .where(col("w").isin((QueryTerms :+ "slow"): _*))
      .groupBy("doc_id")
      .agg(countDistinct(when(col("w").isin(QueryTerms: _*), col("w"))).as("hits"),
           max(when(col("w") === "slow", 1)).as("excl"))
      .where(col("hits") === QueryTerms.size && col("excl").isNull)
    terms
      .join(Tables.documents(s, d).select("doc_id", "source", "n_chars"), "doc_id")
      .select("doc_id", "source", "n_chars")
  }

  val keywordSearchSql: String = {
    val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH $toksSqlCte,
       |hits AS (
       |  SELECT doc_id FROM toks WHERE w IN ($terms)
       |  GROUP BY doc_id HAVING count(DISTINCT w) = ${QueryTerms.size}),
       |excluded AS (SELECT DISTINCT doc_id FROM toks WHERE w = 'slow')
       |SELECT d.doc_id, d.source, d.n_chars
       |FROM hits h JOIN documents d ON h.doc_id = d.doc_id
       |WHERE h.doc_id NOT IN (SELECT doc_id FROM excluded)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Dataset card: the per-source corpus report a curation pipeline
    * publishes with a released training set — doc/language counts, token
    * and char totals, length distribution, exact-dup rate, dominant
    * language. All statistics are engineered for the bit-exact oracle:
    * ratios of exact integers, and the median/p90 are defined by RANK (the
    * (⌊(n+1)/2⌋)-th / (⌈0.9·n⌉)-th value ordered by (n_chars, doc_id)),
    * not by an engine's interpolating percentile.
    *
    * Scale: two hash aggregations over the corpus (per-source stats, token
    * counts), one doc-sized window for the rank statistics, and a tiny
    * per-source join — nothing shuffles more than once. */
  val datasetCard: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // Round 19: the dup-rate hash pass and the token-count pass fused into
    // ONE corpus scan — total_toks is sum of per-row token counts (a size()
    // over the split array, no explode), identical by algebra to counting
    // exploded token rows. One full-text read instead of two; the
    // remaining subframes (rank windows, top_lang) touch only metadata
    // columns. Oracle unchanged.
    //
    // EDGE INVARIANTS the algebra rests on (round-19 advisor): equality to
    // the oracle's explode-based tok_cnt INNER JOIN requires (a) every
    // source to have at least one token — the oracle drops an all-empty
    // source, this spelling keeps it with total_toks = 0 — and (b) text
    // non-null per row, since size(split(null)) is -1 where the explode
    // contributed nothing. Both hold for the documents table by generator
    // contract (non-null text, every source populated); a corpus without
    // those guarantees needs coalesce(text, '') here and a LEFT-join oracle
    // before this operator is pointed at it.
    val base = docs
      .select(col("source"), col("lang"), col("n_chars"),
        sha2(col("text"), 256).as("h"),
        size(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
          .cast("bigint").as("n_toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("lang")).as("n_langs"),
           sum(col("n_chars")).as("sum_chars"),
           countDistinct(col("h")).as("n_uniq"),
           sum(col("n_toks")).as("total_toks"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val ranked = docs.select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(w))
    val med = ranked.join(base.select("source", "n_docs"), "source")
      .where(col("rn") === floor((col("n_docs") + 1) / 2))
      .select(col("source"), col("n_chars").as("median_chars"))
    val p90 = ranked.join(base.select("source", "n_docs"), "source")
      .where(col("rn") === ceil(col("n_docs") * 0.9))
      .select(col("source"), col("n_chars").as("p90_chars"))
    val langW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("cnt").desc, col("lang"))
    val topLang = docs.groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(langW))
      .where(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    base.join(med, "source")
      .join(p90, "source").join(topLang, "source")
      .select(col("source"), col("n_docs"), col("n_langs"), col("top_lang"),
              col("total_toks"), col("sum_chars"),
              (col("sum_chars").cast("double") / col("n_docs")).as("mean_chars"),
              col("median_chars"), col("p90_chars"), col("n_uniq"),
              (lit(1.0) - col("n_uniq").cast("double") / col("n_docs")).as("dup_rate"))
  }

  val datasetCardSql: String =
    s"""WITH $toksSqlCte,
       |base AS (
       |  SELECT source, count(*) AS n_docs,
       |    count(DISTINCT lang) AS n_langs,
       |    cast(sum(n_chars) as bigint) AS sum_chars,
       |    count(DISTINCT sha256(text)) AS n_uniq
       |  FROM documents GROUP BY source),
       |tok_cnt AS (SELECT source, count(*) AS total_toks FROM toks GROUP BY source),
       |ranked AS (
       |  SELECT source, n_chars,
       |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn
       |  FROM documents),
       |med AS (
       |  SELECT r.source, r.n_chars AS median_chars
       |  FROM ranked r JOIN base b ON r.source = b.source
       |  WHERE r.rn = floor((b.n_docs + 1) / 2)),
       |p90 AS (
       |  SELECT r.source, r.n_chars AS p90_chars
       |  FROM ranked r JOIN base b ON r.source = b.source
       |  WHERE r.rn = ceil(b.n_docs * 0.9)),
       |top_lang AS (
       |  SELECT source, lang AS top_lang
       |  FROM (
       |    SELECT source, lang,
       |      row_number() OVER (PARTITION BY source
       |        ORDER BY count(*) DESC, lang) AS rk
       |    FROM documents GROUP BY source, lang)
       |  WHERE rk = 1)
       |SELECT b.source, b.n_docs, b.n_langs, t.top_lang,
       |  k.total_toks, b.sum_chars,
       |  cast(b.sum_chars as double) / b.n_docs AS mean_chars,
       |  m.median_chars, p.p90_chars, b.n_uniq,
       |  1.0 - cast(b.n_uniq as double) / b.n_docs AS dup_rate
       |FROM base b
       |JOIN tok_cnt k ON b.source = k.source
       |JOIN med m ON b.source = m.source
       |JOIN p90 p ON b.source = p.source
       |JOIN top_lang t ON b.source = t.source
       |ORDER BY b.source""".stripMargin

  // ---- BPE tokenizer training ---------------------------------------------

  val BpeRounds = 3

  /** Classic BPE tokenizer TRAINING (Sennrich-style) as a distributed
    * dataflow, 3 unrolled merge rounds: the corpus reduces to the
    * word-frequency table (the ONE corpus-sized shuffle — at 100 TB this
    * vocabulary table is the working set, millions of rows not billions of
    * tokens), each word becomes its space-separated character sequence, and
    * each round (a) counts adjacent symbol pairs weighted by word frequency,
    * (b) picks the top pair with a pinned (count desc, symbol asc)
    * tiebreak, (c) applies the merge with literal string replace.
    *
    * Merge application note: both engines' `replace` scans left-to-right
    * and resumes AFTER the inserted text, so of two occurrences sharing a
    * separator space (" a b a b ") only the first merges in a round —
    * deterministic and identical cross-engine, which is what the oracle
    * checks (reference BPE merges all non-overlapping occurrences; the
    * difference only affects immediately-adjacent repeats within a round).
    *
    * Output: one row per round — the merged pair, its weighted count, and
    * the post-merge corpus symbol total + distinct-symbol vocabulary (the
    * compression curve a tokenizer trainer reports). */
  /** The shared merge chain: word-frequency table → char reprs → BpeRounds
    * of (top pair, merged table). Returns the per-round (top, after) frames
    * and the final merged vocabulary (w kept throughout, so the encoder can
    * join it back to the corpus). */
  private def bpeChain(s: SparkSession, d: String): (Seq[((String, String, Long), DataFrame)], DataFrame) =
    bpeChainFrom(
      toks(s, d).groupBy("w").agg(count(lit(1)).as("wcnt"))
        .select(col("w"), bpeRepr, col("wcnt"))
        // barrier: the vocab table is tiny relative to the corpus; without
        // it every round's three consumers re-run the corpus tokenization
        .localCheckpoint(false))

  /** ` a b c ` space-separated character representation of word `w` — the
    * BPE working form (leading/trailing spaces make every symbol boundary a
    * ` x y ` pattern for the literal-replace merge). */
  private def bpeRepr: Column =
    concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(" "))
      .as("repr")

  /** The merge loop proper, parameterized over the initial word-frequency
    * frame. Round 20: each round's top pair — a 1-row result by
    * construction — is COLLECTED to the driver and the merge is inlined as
    * string LITERALS. The round-19 spelling built a broadcast relation per
    * round and LEFT-joined it into the vocabulary (one broadcast exchange +
    * join per round, plus a `top` localCheckpoint in the train variant so
    * its two consumers shared the 1-row job); with the pair on the driver
    * the merge is a pure projection, the per-round checkpoints vanish, and
    * each merged table is a narrow projection chain over the single
    * checkpointed word-frequency table. Per round: exactly ONE scheduled
    * job (the top-pair aggregation the sequential algorithm fundamentally
    * requires). Selection, tiebreak, and the literal-replace semantics are
    * unchanged — same rows, re-proved by the unchanged oracle.
    *
    * A round with no adjacent pair left (pair-free vocabulary) returns no
    * top; the vocabulary passes through untouched and later rounds see the
    * same — mirroring the old empty-top LEFT-join behavior, where such a
    * round contributed no summary row. */
  /** Collected width of the speculative top-pair table (round 20 — round-19
    * verdict item 5): one aggregation job collects the top-N pairs of the
    * INITIAL table; the driver then accepts rank-(k+1) as round-(k+1)'s
    * merge for as long as the non-interaction guard proves it equal to the
    * sequential result, so a fully-accepted chain schedules ONE pair-count
    * job instead of [[BpeRounds]] sequential ones. */
  private val BpeSpeculateN = 64

  /** Diagnostic: merges accepted by the speculation guard in the most
    * recent chain build (rest ran sequential jobs) — same pattern as
    * [[graft.llm.Curation.lastPropagationRounds]]. */
  @volatile var lastSpeculatedMerges: Int = -1

  private def bpeChainFrom(wc0: DataFrame): (Seq[((String, String, Long), DataFrame)], DataFrame) = {
    def topPairs(df: DataFrame, n: Int): Seq[(String, String, Long)] = {
      // guard single-symbol words: Spark's sequence(1, 0) REVERSES ([1,0])
      // rather than returning empty, and ANSI element_at(tk, 2) then throws
      df.where(size(split(trim(col("repr")), " ")) >= 2)
        .select(col("wcnt"),
          explode(expr("transform(sequence(1, size(split(trim(repr), ' ')) - 1), " +
            "i -> struct(element_at(split(trim(repr), ' '), i) as s1, " +
            "element_at(split(trim(repr), ' '), i + 1) as s2))")).as("pr"))
        .select(col("wcnt"), col("pr.s1").as("s1"), col("pr.s2").as("s2"))
        .groupBy("s1", "s2").agg(sum("wcnt").as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("s1"), col("s2")).limit(n)
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    }
    // lit() for the pair symbols, never an interpolated expr string — corpus
    // tokens can contain any character; literals need no escaping
    def applyMerge(df: DataFrame, s1: String, s2: String): DataFrame =
      df.withColumn("repr",
        org.apache.spark.sql.functions.replace(col("repr"),
          lit(s" $s1 $s2 "), lit(s" $s1$s2 ")))

    /** Speculative multi-merge guard. Accepts the longest prefix of
      * `ranked` (the initial table's top-N) provably equal to the
      * sequential per-round argmax. Rank-(k+1) is round-(k+1)'s top iff
      * every pair's post-merge count keeps it below rank-(k+1)'s:
      *
      *  - a pair symbol-DISJOINT from every accepted merge has an
      *    invariant count (the merge rewrites ` a b ` → ` ab `; no
      *    adjacency of other symbols is created, destroyed, or made
      *    adjacent), so ranks among the survivors are preserved;
      *  - a pair OVERLAPPING an accepted merge only loses occurrences —
      *    it can never overtake;
      *  - merge (a, b) CREATES pairs (x, ab) / (ab, y) and leaves a
      *    RESIDUAL count of (a, b) itself (the literal-replace resume
      *    quirk keeps the second of two overlapping occurrences). Each is
      *    bounded by an INITIAL count: count(x, ab) ≤ C0(x, a) (every
      *    created occurrence came from a literal `x a b`), count(ab, y) ≤
      *    C0(b, y), and residual(a, b) ≤ C0(b, a) (an unmerged occurrence
      *    immediately follows a merged one). Any pair outside the
      *    collected top-N has C0 ≤ the N-th count. Acceptance therefore
      *    requires the candidate's count to STRICTLY exceed every such
      *    bound across all previously accepted merges (strict, so no
      *    created pair can steal the round on the symbol tiebreak).
      *
      * Any failure stops speculation; the remaining rounds run the exact
      * sequential jobs. Equality to the sequential result is also pinned
      * by BpeSpeculationSpec on an adversarial interacting corpus. */
    def acceptedPrefix(ranked: Seq[(String, String, Long)]): Seq[(String, String, Long)] = {
      if (ranked.isEmpty) return Nil
      // fewer than N pairs collected ⇒ the collection is exhaustive and
      // uncollected pairs simply don't exist (bound 0)
      val uncollected = if (ranked.size < BpeSpeculateN) 0L else ranked.last._3
      val acc = scala.collection.mutable.ArrayBuffer[(String, String, Long)](ranked.head)
      var idx = 1
      var stop = false
      while (!stop && acc.size < BpeRounds && idx < ranked.size) {
        val cand = ranked(idx)
        val candSyms = Set(cand._1, cand._2)
        val disjoint = acc.forall(m => !candSyms(m._1) && !candSyms(m._2))
        val ub = acc.iterator.map { case (a, b, _) =>
          val collectedMatches = ranked.iterator.collect {
            case (_, `a`, c) => c // source of created (x, ab)
            case (`b`, _, c) => c // source of created (ab, y) AND the residual (b, a)
          }
          (collectedMatches ++ Iterator.single(uncollected)).max
        }.max
        if (disjoint && cand._3 > ub) { acc += cand; idx += 1 }
        else stop = true
      }
      acc.toSeq
    }

    val ranked = topPairs(wc0, BpeSpeculateN)
    val speculated = acceptedPrefix(ranked)
    lastSpeculatedMerges = speculated.size
    val (afterSpec, specStepsRev) = speculated.foldLeft(
        (wc0, List.empty[((String, String, Long), DataFrame)])) {
      case ((cur, acc), (s1, s2, cnt)) =>
        val next = applyMerge(cur, s1, s2)
        (next, ((s1, s2, cnt), next) :: acc)
    }
    // exact sequential fallback for every round the guard could not prove
    val (_, stepsRev) = (speculated.size until BpeRounds).foldLeft(
        (afterSpec, specStepsRev)) { case ((cur, acc), _) =>
      topPairs(cur, 1).headOption match {
        case Some((s1, s2, cnt)) =>
          val next = applyMerge(cur, s1, s2)
          (next, ((s1, s2, cnt), next) :: acc)
        case None => (cur, acc) // pair-free: no merge, no summary row
      }
    }
    val last = stepsRev.headOption.map(_._2).getOrElse(wc0)
    (stepsRev.reverse, last)
  }

  val bpeTrain: Q = (s, d) => {
    def summary(r: Int, top: (String, String, Long), after: DataFrame): DataFrame = {
      val tot = after
        .agg(sum(col("wcnt") * size(split(trim(col("repr")), " ")))
               .cast("bigint").as("total_syms"))
      val voc = after
        .select(explode(split(trim(col("repr")), " ")).as("sym"))
        .agg(countDistinct("sym").as("vocab"))
      tot.crossJoin(voc)
        .select(lit(r).as("round"), lit(top._1).as("s1"), lit(top._2).as("s2"),
                lit(top._3).as("pair_cnt"), col("total_syms"), col("vocab"))
    }
    val (steps, _) = bpeChain(s, d)
    steps.zipWithIndex
      .map { case ((top, after), i) => summary(i + 1, top, after) }
      .reduce(_.unionAll(_))
  }

  /** Tokenizer APPLICATION: encode the corpus with the vocabulary
    * [[bpeTrain]] learned — per-document word count, BPE token count, and
    * chars-per-token compression. The merged vocabulary is word-keyed; a
    * deployed tokenizer's TRAINED vocab is bounded and broadcasts, but this
    * one is corpus-derived (unbounded with the corpus), so encoding goes
    * through the size-adaptive [[vocabJoin]] — a map-side join whenever the
    * vocab genuinely fits, a shuffled equi-join when it does not. */
  val bpeEncode: Q = (s, d) => {
    // Round 19: the old spelling ran TWO full corpus tokenize passes — one
    // inside the chain's word-frequency table and a second for the per-doc
    // encode join. Now ONE tokenize pass pre-aggregates to (doc_id, w, c)
    // — the dsir/perplexity discipline: cache aggregated frames, never raw
    // exploded ones — and BOTH the word-frequency table (groupBy w, sum c)
    // and the per-doc encode (sum c / sum c·n_syms) derive from it. At
    // 100 TB the saved pass is a full corpus read + split. Values are
    // identical by aggregation algebra (count over tokens ≡ sum of per-doc
    // counts); the oracle SQL is unchanged and re-proves it.
    // cachedOnce, NOT localCheckpoint: the cache key (analyzed plan) is
    // stable across re-invocations, whereas a checkpoint would re-persist
    // the corpus-sized frame on every pass AND poison the vocabFits memo
    // below (LogicalRDD semanticHash churns per rebuild).
    val docWord = docWordCounts(s, d)
    // checkpoint-free twin of the chain's entry frame: same rows, stable
    // plan — serves as the vocabFits probe (vocab row count is invariant
    // across merge rounds: merges rewrite repr, never add/remove words)
    val wcStable = docWord.groupBy("w").agg(sum("c").as("wcnt"))
      .select(col("w"), bpeRepr, col("wcnt"))
    val wc0 = wcStable.localCheckpoint(false)
    val (_, vocab) = bpeChainFrom(wc0)
    val syms = vocab.select(col("w"),
      size(split(trim(col("repr")), " ")).cast("bigint").as("n_syms"))
    vocabJoin(docWord, syms, "w", fitsProbe = wcStable)
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"),
           sum(col("c") * col("n_syms")).as("n_bpe_toks"))
      .join(Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_bpe_toks"),
              round6(col("n_chars").cast("double") / col("n_bpe_toks")).as("chars_per_tok"))
  }

  private def bpePairCte(src: String, p: String): String =
    s"""$p AS (
       |  SELECT s1, s2, cast(sum(wcnt) as bigint) AS pair_cnt FROM (
       |    SELECT tk[g.i] AS s1, tk[g.i + 1] AS s2, wcnt
       |    FROM (SELECT string_split(trim(repr), ' ') AS tk, wcnt FROM $src),
       |         unnest(generate_series(1, len(tk) - 1)) AS g(i))
       |  GROUP BY s1, s2 ORDER BY pair_cnt DESC, s1, s2 LIMIT 1)""".stripMargin

  private def bpeMergeCte(src: String, p: String, r: String): String =
    s"""$r AS (
       |  SELECT w, replace(repr, ' ' || s1 || ' ' || s2 || ' ',
       |                 ' ' || s1 || s2 || ' ') AS repr, wcnt
       |  FROM $src, $p)""".stripMargin

  /** Shared CTE chain for [[bpeTrainSql]] / [[bpeEncodeSql]] — mirrors
    * [[bpeChain]] (w carried through every merge round). */
  private val bpeChainCtes: String =
    s"""$toksSqlCte,
       |wc AS (SELECT w, count(*) AS wcnt FROM toks GROUP BY w),
       |r0 AS (
       |  SELECT w, ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS repr, wcnt
       |  FROM wc),
       |${bpePairCte("r0", "p1")},
       |${bpeMergeCte("r0", "p1", "r1")},
       |${bpePairCte("r1", "p2")},
       |${bpeMergeCte("r1", "p2", "r2")},
       |${bpePairCte("r2", "p3")},
       |${bpeMergeCte("r2", "p3", "r3")}""".stripMargin

  val bpeTrainSql: String = {
    def sumCte(n: Int, p: String, r: String): String =
      s"""sum$n AS (
         |  SELECT $n AS round, s1, s2, pair_cnt,
         |    (SELECT cast(sum(wcnt * len(string_split(trim(repr), ' '))) as bigint)
         |     FROM $r) AS total_syms,
         |    (SELECT count(DISTINCT sym) FROM
         |      (SELECT unnest(string_split(trim(repr), ' ')) AS sym FROM $r)) AS vocab
         |  FROM $p)""".stripMargin
    s"""WITH $bpeChainCtes,
       |${sumCte(1, "p1", "r1")},
       |${sumCte(2, "p2", "r2")},
       |${sumCte(3, "p3", "r3")}
       |SELECT round, s1, s2, pair_cnt, total_syms, vocab FROM sum1
       |UNION ALL SELECT round, s1, s2, pair_cnt, total_syms, vocab FROM sum2
       |UNION ALL SELECT round, s1, s2, pair_cnt, total_syms, vocab FROM sum3
       |ORDER BY round""".stripMargin
  }

  val bpeEncodeSql: String =
    s"""WITH $bpeChainCtes,
       |syms AS (
       |  SELECT w, cast(len(string_split(trim(repr), ' ')) as bigint) AS n_syms
       |  FROM r3),
       |per_doc AS (
       |  SELECT doc_id, count(*) AS n_words, cast(sum(n_syms) as bigint) AS n_bpe_toks
       |  FROM toks JOIN syms USING (w) GROUP BY doc_id)
       |SELECT d.doc_id, p.n_words, p.n_bpe_toks,
       |  ${round6Sql("cast(d.n_chars as double) / p.n_bpe_toks")} AS chars_per_tok
       |FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "llm_bm25" -> bm25,
    "llm_bpe_train" -> bpeTrain,
    "llm_bpe_encode" -> bpeEncode,
    "llm_dataset_card" -> datasetCard,
    "llm_keyword_search" -> keywordSearch,
    "llm_pii_scrub" -> piiScrub,
    "llm_doc_chunks" -> docChunks,
    "llm_dsir_weights" -> dsirWeights,
    "llm_perplexity_bucket" -> perplexityBucket,
    "llm_repetition_filter" -> repetitionFilter,
    "llm_unigram_logprob" -> unigramLogprob,
    "llm_zipf_curve" -> zipfCurve,
    "llm_bpe_pair_counts" -> bpePairCounts,
    "llm_pipeline_e2e" -> pipelineE2e,
    "llm_token_count" -> tokenCount,
    "llm_rolling_hash" -> rollingHash,
    "llm_text_stats" -> textStats,
    "llm_lang_filter" -> langFilter,
    "llm_lang_id" -> langId,
    "llm_quality_score" -> qualityScore,
    "llm_quality_classifier" -> qualityClassifier,
    "llm_gopher_rules" -> gopherRules,
    "llm_entropy_filter" -> entropyFilter,
    "llm_dist_shift" -> distShift,
    "llm_span_corruption" -> spanCorruption,
    "llm_tfidf" -> tfidf,
    "llm_ngrams" -> ngrams,
    "llm_sentiment_lexicon" -> sentiment,
    "llm_multimodal_struct" -> multimodalStruct,
  )

  val oracle: Map[String, String] = Map(
    "llm_bm25" -> bm25Sql,
    "llm_bpe_train" -> bpeTrainSql,
    "llm_bpe_encode" -> bpeEncodeSql,
    "llm_dataset_card" -> datasetCardSql,
    "llm_keyword_search" -> keywordSearchSql,
    "llm_pii_scrub" -> piiScrubSql,
    "llm_doc_chunks" -> docChunksSql,
    "llm_dsir_weights" -> dsirWeightsSql,
    "llm_perplexity_bucket" -> perplexityBucketSql,
    "llm_repetition_filter" -> repetitionFilterSql,
    "llm_unigram_logprob" -> unigramLogprobSql,
    "llm_zipf_curve" -> zipfCurveSql,
    "llm_bpe_pair_counts" -> bpePairCountsSql,
    "llm_pipeline_e2e" -> pipelineE2eSql,
    "llm_token_count" -> tokenCountSql,
    "llm_rolling_hash" -> rollingHashSql,
    "llm_text_stats" -> textStatsSql,
    "llm_lang_filter" -> langFilterSql,
    "llm_lang_id" -> langIdSql,
    "llm_quality_score" -> qualityScoreSql,
    "llm_quality_classifier" -> qualityClassifierSql,
    "llm_gopher_rules" -> gopherRulesSql,
    "llm_entropy_filter" -> entropyFilterSql,
    "llm_dist_shift" -> distShiftSql,
    "llm_span_corruption" -> spanCorruptionSql,
    "llm_tfidf" -> tfidfSql,
    "llm_ngrams" -> ngramsSql,
    "llm_sentiment_lexicon" -> sentimentSql,
    "llm_multimodal_struct" -> multimodalStructSql,
  )

  /** Registered SORT-FREE (round 15, second tranche): per-document scores
    * and per-group rollups are keyed lookups downstream — the trailing
    * ORDER BY was comparator-only. Keys are unique (one row per doc /
    * lang / (lang, bucket)). Verify applies these; each equals its
    * oracle's trailing ORDER BY (ExplainInvariantsSpec pins it). */
  val dumpSort: Map[String, Seq[String]] = Map(
    "llm_dsir_weights" -> Seq("doc_id"),
    "llm_perplexity_bucket" -> Seq("lang", "bucket"),
    "llm_token_count" -> Seq("doc_id"),
    "llm_rolling_hash" -> Seq("doc_id"),
    "llm_text_stats" -> Seq("lang"),
    "llm_quality_score" -> Seq("doc_id"),
    "llm_entropy_filter" -> Seq("doc_id"),
    "llm_span_corruption" -> Seq("doc_id"),
    // tranche 3 (round 15): comparator-only trailing sorts over unique keys
    // (llm_bm25 keeps its sort: ORDER BY ... LIMIT 20 is semantic top-k)
    "llm_lang_filter" -> Seq("doc_id"),
    "llm_lang_id" -> Seq("doc_id"),
    "llm_tfidf" -> Seq("doc_id", "rk"),
    "llm_gopher_rules" -> Seq("doc_id"),
    "llm_sentiment_lexicon" -> Seq("doc_id"),
    "llm_multimodal_struct" -> Seq("doc_id"),
    "llm_pipeline_e2e" -> Seq("lang", "source"),
    "llm_repetition_filter" -> Seq("doc_id"),
    "llm_unigram_logprob" -> Seq("doc_id"),
    "llm_pii_scrub" -> Seq("doc_id"),
    "llm_doc_chunks" -> Seq("doc_id", "chunk_idx"),
    "llm_quality_classifier" -> Seq("doc_id"),
    "llm_keyword_search" -> Seq("doc_id"),
    "llm_dataset_card" -> Seq("source"),
    "llm_bpe_train" -> Seq("round"),
    "llm_bpe_encode" -> Seq("doc_id"),
    "llm_zipf_curve" -> Seq("lang"),
  )
}
