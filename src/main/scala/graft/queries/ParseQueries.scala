package graft.queries

/** Parsing subsystem (SURVEY.md §2.5) as oracle-gated queries. */
object ParseQueries {
  val all: Seq[GraftQuery] = Seq()
}
