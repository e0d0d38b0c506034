package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / frame-sample shapes.
  *
  * The container ships no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (metadata derived from a portable content hash,
  * clearly marked below); everything around it — binary column
  * handling, schema, partition-friendly per-row transforms, sampling —
  * is real and tested. A production decoder would replace `decodeStub`
  * with a `mapPartitions` batch over the binary column (one codec
  * instance per partition, vectorized batches), keeping this exact
  * schema contract.
  */
object Multimodal {

  /** Attach an opaque binary payload + basic metadata. For the fixture
    * corpus the payload is the UTF-8 encoding of the text column (a
    * stand-in for image/audio bytes); `n_bytes` comes from the binary,
    * not the string, as it would for real media. */
  def attachBinary(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))

  /** STUB decode: fake (format, width, height, channels) derived
    * deterministically from the content hash — the placeholder for a
    * real image decode. Production: replace with a partition-mapped
    * codec; the output schema stays identical. */
  def decodeStub(df: DataFrame, textCol: String): DataFrame = {
    val h = md5Long(col(textCol))
    df.withColumn("media_format",
        element_at(array(lit("png"), lit("jpeg"), lit("webp")),
          (pmod(h, lit(3)) + 1).cast("int")))
      .withColumn("width", (pmod(h, lit(1024)) + 1).cast("long"))
      .withColumn("height",
        (pmod(shiftright(h, 10), lit(1024)) + 1).cast("long"))
      .withColumn("channels", (pmod(shiftright(h, 20), lit(3)) + 1)
        .cast("long"))
  }

  /** Wrap the payload in a REAL minimal PNG container: the 8-byte PNG
    * signature followed by an IHDR chunk carrying (width, height, bit
    * depth 8, color type 6 = RGBA) — valid container bytes built with
    * pure byte arithmetic, no codec. (Chunk CRCs are omitted — this is
    * a container-structure exercise, not an encoder.) Expects `width`/
    * `height`/`payload` columns (e.g. from [[decodeStub]] +
    * [[attachBinary]]). */
  def wrapPng(df: DataFrame): DataFrame = {
    val ihdrHex = concat(
      lit("89504E470D0A1A0A"), // PNG signature
      lit("0000000D"),         // IHDR data length = 13
      lit("49484452"),         // "IHDR"
      lpad(hex(col("width")), 8, "0"),
      lpad(hex(col("height")), 8, "0"),
      lit("0806000000"))       // depth 8, color 6, std compression flags
    df.withColumn("png", concat(unhex(ihdrHex), col("payload")))
  }

  /** Parse (width, height) back OUT OF THE CONTAINER BYTES — the
    * big-endian IHDR fields at byte offsets 17/21 — and validate the
    * signature. Real byte-level metadata extraction (what an ingest
    * pipeline does before ever invoking a codec): binary slice → hex →
    * integer, all codegen'd built-ins. */
  def parsePngMeta(df: DataFrame, binCol: String = "png"): DataFrame =
    df.withColumn("sig_ok",
        hex(substring(col(binCol), 1, 8)) === "89504E470D0A1A0A")
      .withColumn("parsed_width",
        conv(hex(substring(col(binCol), 17, 4)), 16, 10).cast("long"))
      .withColumn("parsed_height",
        conv(hex(substring(col(binCol), 21, 4)), 16, 10).cast("long"))

  /** Binary-file SINK: each row's binary column written as one
    * standalone file `<dir>/<prefix><id><suffix>` — the on-disk layout
    * `spark.read.format("binaryFile")` ingests (an image/audio landing
    * zone). IO is executor-side through the Hadoop FileSystem API (one
    * FS handle per partition), so the sink distributes and works
    * against any Hadoop-resolvable store; nothing is collected to the
    * driver. */
  def writeBinaryFiles(df: DataFrame, idCol: String, binCol: String,
      dir: String, prefix: String = "doc_", suffix: String = ".png"): Unit =
    df.select(col(idCol).cast("long"), col(binCol))
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val base = new org.apache.hadoop.fs.Path(dir)
        val fs = base.getFileSystem(conf)
        fs.mkdirs(base)
        it.foreach { r =>
          val out = fs.create(
            new org.apache.hadoop.fs.Path(base,
              prefix + r.getLong(0) + suffix), true)
          try out.write(r.getAs[Array[Byte]](1)) finally out.close()
        }
      }

  /** Frame/byte sampling: hex of `k` evenly spaced single-byte slices
    * of the payload — the shape of video frame-sampling (seek + decode
    * at k offsets) without the codec. */
  def frameSampleHex(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.withColumn("frame_hex",
      transform(sequence(lit(0), lit(k - 1)),
        i => hex(encode(col(textCol).substr(
          floor(i * greatest(length(col(textCol)) - 1, lit(1)) / lit(k))
            .cast("int") + 1,
          lit(1)), "UTF-8"))))

  /** Decoded media metadata — the fixed output contract every
    * [[Decoder]] fills, whatever the codec. */
  final case class MediaMeta(format: String, width: Long, height: Long,
      channels: Long)

  /** Pluggable codec boundary: a production image/audio decoder is
    * native code the cluster loads once per task, not per row —
    * [[decodeWith]] instantiates ONE decoder per partition and maps the
    * binary column through it. Implementations here: the deterministic
    * hash stub (no codecs ship in this environment) and a REAL
    * byte-parsing fake ([[PngIhdrDecoder]]) that proves the interface
    * end to end on q59's genuine container bytes. */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): MediaMeta
  }

  /** Stub decoder: metadata derived from the payload's md5, matching
    * [[decodeStub]] bit for bit (same portable 60-bit hash). */
  final class HashStubDecoder extends Decoder {
    def decode(payload: Array[Byte]): MediaMeta = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(payload).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      MediaMeta(Seq("png", "jpeg", "webp")((h % 3).toInt),
        h % 1024 + 1, (h >> 10) % 1024 + 1, (h >> 20) % 3 + 1)
    }
  }

  /** Test-fake codec that does REAL work: validates the 8-byte PNG
    * signature and reads width/height/color type out of the IHDR chunk
    * (big-endian fields at byte offsets 16/20/25) — the byte-level
    * parse an ingest service runs before invoking a full decoder. */
  final class PngIhdrDecoder extends Decoder {
    private def be32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    private val Sig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def decode(payload: Array[Byte]): MediaMeta = {
      require(payload.length >= 26 &&
        payload.take(8).sameElements(Sig), "not a PNG container")
      val channels = payload(25).toInt match {
        case 0 => 1L; case 2 => 3L; case 3 => 1L; case 4 => 2L; case 6 => 4L
        case c => throw new IllegalArgumentException(s"color type $c")
      }
      MediaMeta("png", be32(payload, 16), be32(payload, 20), channels)
    }
  }

  /** Run the codec boundary: one `decoderFactory()` instance per
    * partition, payloads mapped through it, [[MediaMeta]] columns
    * appended. This is the ONE deliberate exit from whole-stage codegen
    * in the repo — real codecs are native libraries, so the row-level
    * boundary is inherent; keep the input projection narrow (id +
    * payload) so nothing else rides through it. */
  def decodeWith(df: DataFrame, binCol: String,
      decoderFactory: () => Decoder): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StringType}
    val outSchema = df.schema
      .add("media_format", StringType).add("width", LongType)
      .add("height", LongType).add("channels", LongType)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      val decoder = decoderFactory() // one codec instance per partition
      it.map { row =>
        val m = decoder.decode(row.getAs[Array[Byte]](idx))
        Row.fromSeq(row.toSeq ++ Seq(m.format, m.width, m.height,
          m.channels))
      }
    }(Encoders.row(outSchema))
  }

  /** Resize stub: metadata-level downscale to fit a bounding box,
    * preserving aspect ratio. `floor` (not a bare long cast) so the
    * rounding direction is explicit and engine-portable. */
  def resizeStub(df: DataFrame, maxDim: Long): DataFrame = {
    val scaleNeeded = greatest(col("width"), col("height")) > maxDim
    def scaled(c: Column) = floor(c * maxDim /
      greatest(col("width"), col("height"))).cast("long")
    df.withColumn("resized_width",
        when(scaleNeeded, scaled(col("width"))).otherwise(col("width")))
      .withColumn("resized_height",
        when(scaleNeeded, scaled(col("height"))).otherwise(col("height")))
  }
}
