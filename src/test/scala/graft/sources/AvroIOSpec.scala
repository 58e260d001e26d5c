package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class AvroIOSpec extends SparkSpec {
  import spark.implicits._

  test("all supported types roundtrip, including nulls and binary") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("bin", BinaryType)))
    val rows = Seq(
      Row(1L, 2, 3.5, 4.5f, true, "a,b\"c", Array[Byte](1, 2, 3)),
      Row(null, null, null, null, null, null, null),
      Row(-9L, -8, Double.MaxValue, 0.0f, false, "", Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = Files.createTempDirectory("avro_rt").toString
    val nFiles = AvroIO.write(df, dir)
    assert(nFiles >= 1 && nFiles <= 2)
    val back = AvroIO.read(spark, dir, schema).collect()
    assert(back.length == 3)
    val nullRow = back.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(5) && nullRow.isNullAt(6))
    val pos = back.find(r => !r.isNullAt(0) && r.getLong(0) == 1L).get
    assert(pos.getString(5) == "a,b\"c" &&
      pos.getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
    val neg = back.find(r => !r.isNullAt(0) && r.getLong(0) == -9L).get
    assert(neg.getDouble(2) == Double.MaxValue)
  }

  test("container files carry the schema and are independently readable") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val dir = Files.createTempDirectory("avro_self").toString
    AvroIO.write(df, dir)
    // open with the plain Avro reader, no expected schema: the
    // container's own header must describe the records
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    val r = org.apache.avro.file.DataFileReader.openReader(f,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val schemaFields = r.getSchema.getFields
    assert(schemaFields.size() == 2)
    assert(schemaFields.get(0).name() == "id")
    assert(r.hasNext)
    r.close()
  }

  test("unsupported column types fail loudly at schema mapping") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException] {
      AvroIO.avroSchema(df.schema)
    }
    assert(e.getMessage.contains("arr"))
  }

  test("empty directory reads as an empty frame") {
    val dir = Files.createTempDirectory("avro_empty").toString
    val schema = StructType(Seq(StructField("id", LongType)))
    assert(AvroIO.read(spark, dir, schema).count() == 0)
  }

  test("rewrite clears stale containers from a wider earlier write") {
    val dir = Files.createTempDirectory("avro_rw").toString
    val wide = spark.range(0, 100).toDF("id").repartition(8)
    assert(AvroIO.write(wide, dir) == 8)
    // fewer partitions on the second write: without the up-front clear,
    // part-00001..00007 from the first write would survive and read()
    // would silently include their rows
    val narrow = spark.range(1000, 1010).toDF("id").coalesce(1)
    assert(AvroIO.write(narrow, dir) == 1)
    val schema = StructType(Seq(StructField("id", LongType)))
    val back = AvroIO.read(spark, dir, schema)
      .collect().map(_.getLong(0)).sorted
    assert(back.toSeq == (1000L until 1010L).toSeq)
    // and no stray hidden files remain
    val leftovers = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".tmp") || f.getName.endsWith(".fin"))
    assert(leftovers.isEmpty)
  }

  test("a failed write leaves the previous dataset fully intact") {
    val dir = Files.createTempDirectory("avro_fail").toString
    AvroIO.write(spark.range(0, 50).toDF("id"), dir)
    val schema = StructType(Seq(StructField("id", LongType)))
    assert(AvroIO.read(spark, dir, schema).count() == 50)
    // a job that dies mid-write (every task throws) must not destroy
    // the old containers — the old up-front-delete protocol did
    val boom = org.apache.spark.sql.functions.udf { (_: Long) =>
      throw new RuntimeException("boom"); true
    }
    val poison = spark.range(0, 10).toDF("id")
      .filter(boom(org.apache.spark.sql.functions.col("id")))
    intercept[Exception](AvroIO.write(poison, dir))
    val back = AvroIO.read(spark, dir, schema)
      .collect().map(_.getLong(0)).sorted
    assert(back.toSeq == (0L until 50L).toSeq,
      "old dataset damaged by the failed write")
  }
}
