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

  /** One rule: `$key regex new_tag keep`. `gate` restricts which records
    * the rule may match at all — the filter instance's Match pattern on
    * the record's tag (a rule in a `Match app.*` filter never touches a
    * `db.*` record, and a record it re-tags out of the pattern is not
    * re-matched on later passes).
    */
  final case class Rule(field: Column, pattern: String, newTagTemplate: Column,
                        keep: Boolean, gate: Column = lit(true))

  /** Apply one rule. Returns the full routed DataFrame: rewritten records
    * (new tag) plus originals (all if keep, else only non-matching).
    */
  def apply(df: DataFrame, tagCol: String, rule: Rule): DataFrame = {
    val matches =
      coalesce(rule.gate, lit(false)) && coalesce(rule.field.rlike(rule.pattern), lit(false))
    val rewritten = df.filter(matches).withColumn(tagCol, rule.newTagTemplate)
    val kept = if (rule.keep) df else df.filter(!matches)
    kept.unionByName(rewritten)
  }

  /** `$1`-style capture-group reference for tag templates. */
  def capture(field: Column, pattern: String, group: Int): Column =
    regexp_extract(field, pattern, group)

  /** Re-injection loop (rewrite_tag.c:425 + in_emitter): rewritten
    * records re-enter routing and may match other rules under their new
    * tag. The reference bounds this by emitter capacity; here it is an
    * iterative fixpoint over a work set, `maxHops` deep — plain unions,
    * no driver-side recursion, each hop a narrow transformation.
    *
    * Faithful to the reference's per-pass loop (rewrite_tag.c:380-390):
    * the FIRST matching rule wins — it fixes the new tag and its `keep`
    * flag, and later rules never see the record that pass. A matched
    * record's rewritten copy re-enters the next hop (the emitter path);
    * the original either settles into the output (`keep=true`) or is
    * dropped. Unmatched records settle unchanged. No distinct() anywhere:
    * legitimately identical input records keep their multiplicity, and
    * re-emission never manufactures duplicates (one copy per match).
    * Records still matching after `maxHops` are emitted as-is — the
    * bounded analogue of the reference's emitter backlog.
    */
  def reinjectLoop(df: DataFrame, tagCol: String, rules: Seq[Rule],
                   maxHops: Int = 4): DataFrame = {
    require(rules.nonEmpty, "reinjectLoop needs at least one rule")
    val matches = rules.map(r =>
      coalesce(r.gate, lit(false)) && coalesce(r.field.rlike(r.pattern), lit(false)))
    val anyMatch = matches.reduce(_ || _)
    // First-match-wins when-chains: rule i applies iff no earlier matched.
    val newTag = rules.zip(matches).foldRight(col(tagCol)) {
      case ((r, m), els) => when(m, r.newTagTemplate).otherwise(els)
    }
    val keepOriginal = rules.zip(matches).foldRight(lit(false)) {
      case ((r, m), els) => when(m, lit(r.keep)).otherwise(els)
    }
    var settled = Vector.empty[DataFrame]
    var work = df
    (1 to maxHops).foreach { _ =>
      val matched = work.filter(anyMatch)
      settled :+= work.filter(!anyMatch)
      settled :+= matched.filter(keepOriginal)
      work = matched.withColumn(tagCol, newTag)
    }
    (settled :+ work).reduce(_ unionByName _)
  }
}
