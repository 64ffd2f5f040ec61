package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Idempotent cache marking.
  *
  * Spark's CacheManager keys cached plans by the ANALYZED PLAN, so
  * re-building the same DataFrame (every bench pass re-invokes each operator
  * from scratch) and calling `.cache()` again is a no-op that logs
  * `WARN CacheManager: Asked to cache already cached data` — hundreds of
  * them across a bench run, drowning real warnings in driver logs. This
  * guard asks the manager first (`Dataset.storageLevel` is exactly that
  * plan lookup: it returns the storage level of an equivalent cached plan,
  * or NONE) and only issues the cache call for genuinely new plans — the
  * cross-invocation reuse is identical, the warning noise is gone.
  */
object Caching {
  def cachedOnce(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.cache() else df
}
