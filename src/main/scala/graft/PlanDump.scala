package graft

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Dumps `explain("formatted")` for NAMED queries into per-query files —
  * the optimization-round evidence trail (`plans/r16/<query>_before.txt`
  * / `_after.txt`). Unlike [[Explain]] (fixed headline list → EXPLAIN.md)
  * this takes the query list and output suffix on the command line.
  *
  * Usage:
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,..."
  * writes <outDir>/<q>_<suffix>.txt for each named query.
  *
  * Session confs mirror Bench (shuffle partitions = SPARK_GRAFT_CPUS,
  * codegen.maxFields, requireAllClusterKeysForCoPartition) so the dumped
  * plan is the one the bench actually runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = Registry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(
        new java.io.File(outDir, s"${name}_$suffix.txt"), "UTF-8")
      try w.write(plan) finally w.close()
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
