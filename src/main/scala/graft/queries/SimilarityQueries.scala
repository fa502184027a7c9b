package graft.queries

/** Vector-similarity query surface over `embeddings` — filled in by
  * graft.sim operators (cosine top-k, LSH-bucketed ANN, near-dup).
  */
object SimilarityQueries {
  def all: Seq[QueryDef] = Seq.empty
}
