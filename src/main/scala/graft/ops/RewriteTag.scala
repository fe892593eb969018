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

  /** Re-injection loop (rewrite_tag.c:425 + in_emitter): rewritten
    * records re-enter routing and may match other rules under their new
    * tag. The reference bounds this by emitter hop count; here it is an
    * iterative fixpoint over a work set, `maxHops` deep — plain unions,
    * no driver-side recursion, each hop a narrow transformation.
    *
    * Rules apply in order within a hop (a later rule sees the tags an
    * earlier one produced); unmatched records pass through unchanged,
    * so the loop is idempotent once no rule matches. Rules matching
    * their own output tags would ping-pong — the hop bound caps that
    * exactly like the reference's emitter limit. The final distinct()
    * collapses the duplicates keep=true re-emission accumulates.
    */
  def reinjectLoop(df: DataFrame, tagCol: String, rules: Seq[Rule],
                   maxHops: Int = 4): DataFrame = {
    require(rules.nonEmpty, "reinjectLoop needs at least one rule")
    (1 to maxHops).foldLeft(df) { (work, _) =>
      rules.foldLeft(work) { (d, r) => apply(d, tagCol, r) }
    }.distinct()
  }
}
