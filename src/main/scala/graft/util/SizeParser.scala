package graft.util

/** Size-string parsing for config values ("200MB", "1.5GB", "500K") →
  * bytes, KiB-based multipliers — behavioral spec
  * /root/reference/pivot_and_boostrap/partition_optimization.py:17-31.
  *
  * Config-layer only. The reference used this to pick a manual batch
  * size; in Spark the analogous knobs are
  * `spark.sql.files.maxPartitionBytes` (scan split size) and AQE
  * (post-shuffle sizing), which replace the reference's
  * find_optimal_partition_size probe entirely (see SURVEY §4 — the
  * probe was estimating bytes/row from parquet *metadata* size and
  * produced nonsense anyway).
  */
object SizeParser {
  private val re = "(?i)^\\s*([0-9]*\\.?[0-9]+)\\s*([KMGT]I?B?|B)?\\s*$".r

  def parse(s: String): Option[Long] = s match {
    case re(num, unit) =>
      val mult = Option(unit).map(_.toUpperCase.stripSuffix("B").stripSuffix("I")) match {
        case None | Some("") => 1L
        case Some("K") => 1024L
        case Some("M") => 1024L * 1024
        case Some("G") => 1024L * 1024 * 1024
        case Some("T") => 1024L * 1024 * 1024 * 1024
        case _ => return None
      }
      Some((num.toDouble * mult).toLong)
    case _ => None
  }
}
