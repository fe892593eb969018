package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blob event class — the reference's file-reference signal
  * (`src/flb_input_blob.c`: a record CARRIES a file reference, not the
  * bytes; delivery happens in ordered parts, and the sink commits a
  * part list once all parts land — `plugins/out_azure_blob`'s block
  * list / `flb_blob_db` part bookkeeping).
  *
  * Spark-first re-expression: the delivery SCHEDULE is a pure plan —
  * `sequence` + `explode` over ceil(size/chunk) — so it codegens and
  * scales as a map-only projection (no shuffle until the commit
  * aggregation, which groups by blob and is one exchange of tiny
  * manifest rows). Payload slicing stays columnar (`substring`);
  * nothing collects to the driver.
  */
object Blob {

  /** Chunk plan: one row per delivery part. `sizeCol` is the blob's
    * length in units (bytes for binary, chars for text); parts are
    * `[offset, offset+len)` with the last part truncated. Blobs of size
    * 0 produce no parts (nothing to deliver — flb_input_blob skips
    * empty files the same way).
    */
  def chunkPlan(df: DataFrame, sizeCol: Column, chunk: Long): DataFrame = {
    require(chunk > 0, "chunk size must be positive")
    // guard the empty blob BEFORE the explode: sequence(0, -1) defaults
    // to step -1 and would yield [0, -1] — two bogus parts for a
    // zero-length blob instead of the empty schedule the contract (and
    // the oracle's generate_series) promises
    df.withColumn("__np", ceil(sizeCol.cast("double") / chunk).cast("long"))
      .filter(col("__np") > 0)
      .withColumn("part_idx", explode(sequence(lit(0L), col("__np") - 1)))
      .drop("__np")
      .withColumn("offset", col("part_idx") * chunk)
      .withColumn("len",
        least(lit(chunk), sizeCol.cast("long") - col("offset")))
  }

  /** Slice a text blob's payload for each part row (char units; for a
    * binary column the same plan applies over `substr(bin, ...)`).
    * A JVM String caps at ~2^31 chars, so the int casts are safe for
    * every representable payload — but a DECLARED offset/len beyond
    * that (a corrupt size column) must fail loudly instead of wrapping
    * to a negative offset and slicing garbage.
    */
  def textPayload(parts: DataFrame, textCol: Column): Column =
    // STRICT bound: offset+len == Int.MaxValue would make (offset+1)
    // overflow its int cast when len == 0, and negative offset/len are
    // the same corrupt-schedule class — all three raise (ADVICE r15)
    when(col("offset") >= 0 && col("len") >= 0 &&
         col("offset") + col("len") < lit(Int.MaxValue.toLong),
      substring(textCol,
        (col("offset") + 1).cast("int"), col("len").cast("int")))
      .otherwise(raise_error(concat(
        lit("blob part outside [0, 2^31) chars: offset="),
        col("offset").cast("string"), lit(" len="),
        col("len").cast("string"))))

  /** Commit manifest per blob — the sink-side block list: part count,
    * delivered length, and the ordered digest-of-digests (commit the
    * list, not the bytes — the azure block-blob commit shape). Ordered
    * deterministically by part_idx via the array_sort(struct) pattern.
    */
  def commitManifest(parts: DataFrame, blobIdCol: String,
                     partDigest: Column): DataFrame =
    parts
      .withColumn("__digest", partDigest)
      .groupBy(col(blobIdCol))
      .agg(
        count(lit(1)).as("n_parts"),
        sum(col("len")).as("delivered_len"),
        md5(concat_ws("", transform(
          array_sort(collect_list(struct(col("part_idx"), col("__digest")))),
          s => s.getField("__digest"))).cast("binary")).as("blocklist_md5"))
}
