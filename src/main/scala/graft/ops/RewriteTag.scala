package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** filter_rewrite_tag (reference `plugins/filter_rewrite_tag/
  * rewrite_tag.c:425`, rule struct rewrite_tag.h:32-48): rule =
  * `$key regex new_tag keep?`. On match, the record is re-emitted under
  * the new tag (templated from record-accessor refs and regex capture
  * groups); `keep` controls whether the original also survives.
  *
  * Spark mapping: the new tag is a codegen'd `regexp_replace`-style
  * template; re-emission = union of the rewritten subset with the
  * original flow (bounded, no recursion — SURVEY §7.4(4)).
  */
object RewriteTag {

  final case class Rule(field: Column, pattern: String, newTagTemplate: Column, keep: Boolean)

  /** Apply one rule. Returns the full routed DataFrame: rewritten records
    * (new tag) plus originals (all if keep, else only non-matching).
    */
  def apply(df: DataFrame, tagCol: String, rule: Rule): DataFrame = {
    val matches = coalesce(rule.field.rlike(rule.pattern), lit(false))
    val rewritten = df.filter(matches).withColumn(tagCol, rule.newTagTemplate)
    val kept = if (rule.keep) df else df.filter(!matches)
    kept.unionByName(rewritten)
  }

  /** `$1`-style capture-group reference for tag templates. */
  def capture(field: Column, pattern: String, group: Int): Column =
    regexp_extract(field, pattern, group)
}
