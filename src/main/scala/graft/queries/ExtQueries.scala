package graft.queries

/** Training-data-pipeline extensions (dedup, similarity, text analysis,
  * multimodal) as oracle-gated queries.
  */
object ExtQueries {
  val all: Seq[GraftQuery] = Seq()
}
