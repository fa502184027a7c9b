package graft.queries

/** Text-analysis + dedup query surface over `documents` — filled in by
  * graft.text operators (token counting, language ID, quality scoring,
  * exact/near dedup).
  */
object TextQueries {
  def all: Seq[QueryDef] = Seq.empty
}
