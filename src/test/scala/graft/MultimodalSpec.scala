package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Codec-boundary contract: the mapPartitions decode path and its two
  * Decoder implementations. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    ("d1", "hello multimodal world"),
    ("d2", "a second, longer document payload with more bytes"),
    ("d3", "x")).toDF("doc_id", "text")

  test("HashStubDecoder through decodeWith matches decodeStub column-wise") {
    val withBin = Multimodal.attachBinary(fixture, "text")
    val viaExpr = Multimodal.decodeStub(withBin, "text")
      .select("doc_id", "media_format", "width", "height", "channels")
    val viaCodec = Multimodal.decodeWith(
        withBin.select(col("doc_id"), col("payload")), "payload",
        () => new Multimodal.HashStubDecoder)
      .select("doc_id", "media_format", "width", "height", "channels")
    assert(rows(viaCodec.orderBy("doc_id")).map(_.toSeq) ==
      rows(viaExpr.orderBy("doc_id")).map(_.toSeq))
  }

  test("PngIhdrDecoder reads real IHDR fields back out of the container") {
    val staged = Multimodal.wrapPng(
      Multimodal.decodeStub(Multimodal.attachBinary(fixture, "text"),
        "text"))
    val decoded = Multimodal.decodeWith(
      staged.select(col("doc_id"), col("width").as("expect_w"),
        col("height").as("expect_h"), col("png")),
      "png", () => new Multimodal.PngIhdrDecoder)
    assert(decoded.filter(col("width") =!= col("expect_w") ||
      col("height") =!= col("expect_h") ||
      col("media_format") =!= "png" || col("channels") =!= 4).isEmpty)
  }

  test("writeBinaryFiles + binaryFile source roundtrip bytes exactly") {
    val dir = "/tmp/graft_test_binfiles"
    graft.sources.Ingest.deletePath(spark, dir)
    val staged = Multimodal.wrapPng(
      Multimodal.decodeStub(Multimodal.attachBinary(
        fixture.withColumn("id", monotonically_increasing_id()), "text"),
        "text"))
    Multimodal.writeBinaryFiles(
      staged.select(col("id"), col("png")), "id", "png", dir)
    val back = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(dir)
      .select(regexp_extract(col("path"), "doc_(\\d+)\\.png$", 1)
        .cast("long").as("id"), col("content"))
    val joined = staged.select(col("id"), col("png"))
      .join(back, "id")
    assert(joined.count() == 3)
    assert(joined.filter(col("png") =!= col("content")).isEmpty)
  }

  test("PngIhdrDecoder rejects payloads without a PNG signature") {
    val bad = Multimodal.attachBinary(fixture, "text")
      .select(col("doc_id"), col("payload"))
    val ex = intercept[Exception] {
      Multimodal.decodeWith(bad, "payload",
        () => new Multimodal.PngIhdrDecoder).count()
    }
    assert(ex.getMessage != null)
  }
}
