package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared slice-writer for the streaming at-scale probes
  * ([[StreamNeardupProbe]], [[StreamSemdedupProbe]], the hot-band cell):
  * writes `df` (must contain the probe's event-time `ts` plus its payload
  * columns, ordered by an id column `idCol` in 0..n-1) as `slices`
  * single-file rank-range parquet slices with sortable names and
  * increasing mtimes, so a `maxFilesPerTrigger=1` file source replays them
  * in rank (= event-time) order. Skips the write when the last slice
  * already exists. */
object StreamSlices {
  def write(df: DataFrame, idCol: String, n: Long, streamDir: String,
            slices: Int): Unit = {
    if (java.nio.file.Files.exists(
          java.nio.file.Paths.get(f"$streamDir/slice_$slices%04d.parquet"))) {
      System.err.println(s"[streamslices] reusing $streamDir")
      return
    }
    Util.deleteRecursively(new java.io.File(streamDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(streamDir))
    val per = (n + slices - 1) / slices
    for (i <- 1 to slices) {
      val lo = (i - 1) * per; val hi = math.min(n, i.toLong * per)
      val tmp = s"$streamDir/tmp_$i"
      df.where(col(idCol) >= lo && col(idCol) < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val listing = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
      val part =
        try listing.filter(_.getFileName.toString.startsWith("part-"))
          .findFirst().get()
        finally listing.close()
      val dest = java.nio.file.Paths.get(f"$streamDir/slice_$i%04d.parquet")
      java.nio.file.Files.move(part, dest,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 2000L))
      Util.deleteRecursively(new java.io.File(tmp))
    }
  }
}
