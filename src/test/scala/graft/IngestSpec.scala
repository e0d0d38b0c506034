package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Multimodal
import graft.sources.Ingest

/** CSV ingestion modes, rejects, seeds, audit, multimodal plumbing. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val dirty = "/root/repo/seeds/dirty_orders.csv"

  test("readCsvWithRejects routes schema-violating lines whole") {
    val schema = StructType(Seq(
      StructField("order_id", LongType),
      StructField("qty", IntegerType),
      StructField("price", DoubleType),
      StructField("order_date", StringType)))
    val (clean, rejects) = Ingest.readCsvWithRejects(spark, dirty, schema)
    // rows with qty='x' / price='oops' / price='3,75' fail the typed read
    assert(rejects.count() == 3)
    assert(clean.count() == 7)
    val lines = rows(rejects).map(_.getString(0))
    assert(lines.exists(_.contains(",x,")))
    assert(lines.exists(_.contains("oops")))
  }

  test("readCsvInfer autodetects numeric columns (BigQuery parity)") {
    val df = Ingest.seed(spark, "fx_rates")
    assert(df.schema("rate_to_usd").dataType.isInstanceOf[NumericType])
    assert(df.count() == 3)
  }

  test("audit emits one count row per table") {
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(1).toDF("y")
    val out = Ingest.audit(Seq("a" -> a, "b" -> b),
      ts("2024-01-01 00:00:00"))
    val got = rows(out).map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 1L))
  }

  test("writePartitioned + append round-trips all rows") {
    val path = "/tmp/graft_test_partwrite"
    Ingest.deletePath(spark, path)
    val df = Seq((1, "2024-01-01"), (2, "2024-01-02")).toDF("id", "d")
    Ingest.writePartitioned(df.filter($"id" === 1), path, Seq("d"),
      "overwrite")
    Ingest.writePartitioned(df.filter($"id" === 2), path, Seq("d"),
      "append")
    assert(spark.read.parquet(path).count() == 2)
  }

  test("multimodal: byte counts, deterministic stub decode, resize caps") {
    val docs = Seq(("hello world", "s1"), ("abc", "s2")).toDF("text", "source")
    val out = Multimodal.resizeStub(
      Multimodal.decodeStub(Multimodal.attachBinary(docs, "text"), "text"),
      512)
    val r = rows(out.filter($"text" === "hello world")).head
    assert(r.getAs[Long]("n_bytes") == 11L)
    assert(Seq("png", "jpeg", "webp").contains(r.getAs[String]("media_format")))
    assert(r.getAs[Long]("resized_width") <= 512 ||
      r.getAs[Long]("width") <= 512)
    // decode is deterministic: same text -> same metadata
    val again = rows(Multimodal.decodeStub(
      Multimodal.attachBinary(docs, "text"), "text")
      .filter($"text" === "hello world")).head
    assert(again.getAs[Long]("width") == r.getAs[Long]("width"))
  }

  test("frameSampleHex returns k hex-coded byte samples") {
    val docs = Seq("abcdefghij").toDF("text")
    val got = rows(Multimodal.frameSampleHex(docs, "text", 4)
      .select("frame_hex")).head.getSeq[String](0)
    assert(got.size == 4)
    assert(got.head == "61") // 'a'
  }

  test("PNG container roundtrips dimensions through real bytes") {
    import org.apache.spark.sql.functions._
    val staged = Seq("some payload text").toDF("text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("width", lit(640L))
      .withColumn("height", lit(360L))
    val parsed = rows(Multimodal.parsePngMeta(Multimodal.wrapPng(staged)))
      .head
    assert(parsed.getAs[Boolean]("sig_ok"))
    assert(parsed.getAs[Long]("parsed_width") == 640L)
    assert(parsed.getAs[Long]("parsed_height") == 360L)
    // container = 8 sig + 4 len + 4 type + 13 IHDR data + payload
    val png = parsed.getAs[Array[Byte]]("png")
    assert(png.length == 29 + "some payload text".length)
    // the signature is the real PNG magic
    assert(png.take(4).map(b => f"${b & 0xff}%02X").mkString ==
      "89504E47")
  }
}
