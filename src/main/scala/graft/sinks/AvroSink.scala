package graft.sinks

import java.io.File

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Avro sink serialization (SURVEY §2.10; reference `src/flb_avro.c` —
  * log record → Avro GenericRecord under a caller-supplied schema).
  * The container does not ship the spark-avro connector, so this writes
  * Avro object-container files directly with the bundled avro-core:
  * one file per partition via foreachPartition — the same distributed
  * shape as a FileFormat sink (every executor writes its own split; no
  * driver collect).
  */
object AvroSink {

  /** Avro record schema for the supported flat column types (the
    * msgpack scalar domain of flb_avro.c: long/double/boolean/string;
    * nullable via union with null).
    */
  def avroSchema(schema: StructType, recordName: String = "logevent"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { f =>
      val base = f.dataType match {
        case LongType | IntegerType => Schema.create(Schema.Type.LONG)
        case DoubleType | FloatType => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case other => throw new IllegalArgumentException(
          s"avro sink supports flat scalar columns, got ${f.name}: $other")
      }
      val t = if (f.nullable)
        Schema.createUnion(Schema.create(Schema.Type.NULL), base)
      else base
      fields.add(new Schema.Field(f.name, t, null, null))
    }
    Schema.createRecord(recordName, null, "graft", false, fields)
  }

  private def toAvro(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      val v = if (row.isNullAt(i)) null else f.dataType match {
        case IntegerType => java.lang.Long.valueOf(row.getInt(i).toLong)
        case LongType => java.lang.Long.valueOf(row.getLong(i))
        case FloatType => java.lang.Double.valueOf(row.getFloat(i).toDouble)
        case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
        case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
        case StringType => row.getString(i)
        case other => throw new IllegalArgumentException(other.toString)
      }
      rec.put(f.name, v)
    }
    rec
  }

  /** Write `df` as Avro container files under `dir` (part-<pid>.avro per
    * non-empty partition).
    */
  def write(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchema(st).toString
    new File(dir).mkdirs()
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, new File(dir, f"part-$pid%05d.avro"))
        try it.foreach(r => w.append(toAvro(r, st, schema)))
        finally w.close()
      }
    }
  }

  /** Read back every container file under `dir` (golden-test helper). */
  def readAll(dir: String): Seq[Map[String, Any]] = {
    val files = Option(new File(dir).listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    files.toSeq.flatMap { f =>
      val r = new DataFileReader[GenericRecord](f, new GenericDatumReader[GenericRecord]())
      try {
        val out = scala.collection.mutable.ArrayBuffer[Map[String, Any]]()
        while (r.hasNext) {
          val rec = r.next()
          out += rec.getSchema.getFields.toArray.map { fo =>
            val fld = fo.asInstanceOf[Schema.Field]
            val v = rec.get(fld.name) match {
              case u: org.apache.avro.util.Utf8 => u.toString
              case other => other
            }
            fld.name -> v
          }.toMap
        }
        out.toSeq
      } finally r.close()
    }
  }
}
