package graft.queries

/** Filter/processor operators (SURVEY.md §2.3/§2.4) as oracle-gated
  * queries. Populated incrementally; see graft.ops.* for the library.
  */
object OpsQueries {
  val all: Seq[GraftQuery] = Seq()
}
