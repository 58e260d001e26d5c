package graft.sources

import java.io.File
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Avro Object Container Files without the spark-avro module: the Avro
 * CORE library ships on Spark's classpath (it is Spark's own shuffle/
 * RPC serialization dependency), so a distributed Avro sink/source is
 * a mapPartitions away. Avro is the third interchange format corpus
 * pipelines hand over (after parquet/ORC — e.g. event-log dumps), and
 * the container format carries its schema, so readback needs no
 * sidecar.
 *
 * Scale shape: one container file per partition, written executor-side
 * (deflate codec); reads parallelize over the file list with one task
 * per container. Paths must be on storage every executor reaches —
 * exactly the contract of every file-based sink here.
 *
 * Types covered: long/int/double/float/boolean/string/binary with
 * nullability as Avro unions. That spans every column the testdata
 * tables carry; anything else fails loudly at schema mapping.
 */
object AvroIO {

  def avroSchema(schema: StructType, name: String = "row"): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"avro mapping for $other not supported (column ${f.name})")
      }
      if (f.nullable)
        fs.name(f.name)
          .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
          .withDefault(null)
      else fs.name(f.name).`type`(base).noDefault()
    }.endRecord()
  }

  /** Write one Avro container file per partition under `dir`;
    * returns the number of files written.
    *
    * Commit protocol (the parquet/ORC sinks get this from Spark's
    * committer; a hand-rolled sink must supply its own): tasks write
    * attempt-unique hidden temp files and rename them — still hidden
    * (`.part-<stamp>-NNNNN.avro.fin`) — on task success, so a retried
    * or speculative attempt never interleaves bytes and readers never
    * see a partial container. Only after the WHOLE job succeeds does
    * the driver reveal the stamped files and then delete the previous
    * write's containers — a failed job leaves the old dataset fully
    * intact (the up-front-delete alternative destroys it). The one
    * non-atomic window is the driver's reveal-then-delete sweep: a
    * crash inside it can leave old and new containers visible
    * together, which the next write() heals (everything unstamped is
    * stale); atomic replace needs a manifest, which the bare Avro
    * directory layout does not have. */
  def write(df: DataFrame, dir: String): Int = {
    val d = new File(dir)
    d.mkdirs()
    val old = Option(d.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.getName.endsWith(".avro") ||
        f.getName.endsWith(".tmp") || f.getName.endsWith(".fin"))
    // leftover hidden files from a crashed earlier job are safe to
    // clear now; visible .avro containers are NOT touched until the
    // new job has fully succeeded
    old.filter(f => f.getName.endsWith(".tmp") ||
        f.getName.endsWith(".fin"))
      .foreach { f =>
        if (!f.delete()) throw new java.io.IOException(
          s"AvroIO.write: cannot clear leftover ${f.getPath}")
      }
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val schema = df.schema
    val schemaJson = avroSchema(schema).toString
    val names = schema.fieldNames
    val finished = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val avSchema = new Schema.Parser().parse(schemaJson)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avSchema))
        writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(3))
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new File(dir, f".part-$stamp-$pid%05d.avro.$attempt%d.tmp")
        val fin = new File(dir, f".part-$stamp-$pid%05d.avro.fin")
        writer.create(avSchema, tmp)
        rows.foreach { row =>
          val rec = new GenericData.Record(avSchema)
          var i = 0
          while (i < names.length) {
            val v = row.get(i) match {
              case null => null
              case b: Array[Byte] => ByteBuffer.wrap(b)
              case x => x
            }
            rec.put(names(i), v)
            i += 1
          }
          writer.append(rec)
        }
        writer.close()
        // last-completer-wins rename: attempts of one partition carry
        // identical rows, so whichever lands is a complete container
        java.nio.file.Files.move(tmp.toPath, fin.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        Iterator.single(fin.getName)
      }
    }.collect()
    // job succeeded: reveal the new containers, then retire the old
    finished.foreach { hidden =>
      val visible = hidden.stripPrefix(".").stripSuffix(".fin")
      java.nio.file.Files.move(new File(dir, hidden).toPath,
        new File(dir, visible).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    old.filter(_.getName.endsWith(".avro")).foreach { f =>
      if (f.exists() && !f.delete()) throw new java.io.IOException(
        s"AvroIO.write: cannot retire stale ${f.getPath}")
    }
    finished.length
  }

  /** Read every container file under `dir` into a DataFrame with
    * `schema` (one task per file; the container's embedded schema is
    * resolved against the expected one by the Avro datum reader). */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val files = Option(new File(dir).listFiles())
      .getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".avro")).map(_.getPath).sorted
    val names = schema.fieldNames
    val rdd = spark.sparkContext
      .parallelize(files.toSeq, math.max(files.length, 1))
      .flatMap { path =>
        // STREAM the container instead of buffering it: a task holds
        // one record at a time regardless of file size. The reader
        // closes on exhaustion, and a task-completion listener covers
        // early termination (limit/take/failure).
        val reader = DataFileReader.openReader(
          new File(path), new GenericDatumReader[GenericRecord]())
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => reader.close()))
        new Iterator[Row] {
          private var open = true
          override def hasNext: Boolean = {
            val h = open && reader.hasNext
            if (open && !h) { reader.close(); open = false }
            h
          }
          override def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(names.toSeq.map { n =>
              rec.get(n) match {
                case u: org.apache.avro.util.Utf8 => u.toString
                case b: ByteBuffer =>
                  val a = new Array[Byte](b.remaining()); b.get(a); a
                case v => v
              }
            })
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
