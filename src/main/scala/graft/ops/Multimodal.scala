package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions

/** Multimodal-column plumbing for the training-data surface.
  *
  * Media (image/audio/video) is modeled as an opaque `binary` content
  * column plus a typed metadata struct — the lakehouse-standard layout.
  * The actual codec work is STUBBED (decode libs aren't in this
  * container): `decodeStub` derives deterministic fake
  * width/height/format from the bytes so every downstream op — schema,
  * partition sizing, feature extraction, frame sampling — is real,
  * tested Spark plumbing that a real codec UDF can drop into.
  *
  * At scale the rules encoded here: binary payloads ride in their own
  * column (parquet keeps them out of unrelated column scans), feature
  * extraction happens in the scan pass (custom expression, no
  * serialization), and per-row work never crosses a shuffle — only
  * extracted fixed-width features do.
  */
object Multimodal {

  /** Wrap a text table into the media layout — the deterministic fake
    * corpus used by tests and declared queries: `content = utf8(text)`.
    * Real pipelines read binary columns directly from parquet. */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("content"),
      struct(
        length(col(textCol).cast("binary")).as("n_bytes"),
        lit("fake/utf8").as("mime"),
        (col(idCol) % 3).cast("int").as("modality") // 0=image,1=audio,2=video
      ).as("meta"))

  /** STUB decode — deterministic fake in place of a real image decoder.
    * Derives (width, height, channels) from the payload's md5 so
    * results are reproducible AND SQL-replayable (the DuckDB oracle
    * parses the same hex substrings; CRC32, the previous choice, has no
    * DuckDB counterpart). A real implementation swaps the arithmetic
    * for a codec call with the SAME signature (binary → struct). */
  def decodeStub(content: Column): Column = {
    val h = md5(content)
    val n = length(content)
    struct(
      (pmod(conv(substring(h, 1, 8), 16, 10).cast("long"), lit(1920L)) + 1)
        .cast("int").as("width"),
      (pmod(conv(substring(h, 9, 8), 16, 10).cast("long"), lit(1080L)) + 1)
        .cast("int").as("height"),
      when(n % 2 === 0, 3).otherwise(1).cast("int").as("channels"))
  }

  /** Feature extraction in the scan pass: 16-bin byte histogram (custom
    * Catalyst expression) normalized to a double vector — the stand-in
    * for an embedding/feature model, with the real production shape:
    * binary in, fixed-width `array<double>` out. */
  def byteFeatures(content: Column): Column = {
    val hist = GraftExpressions.byte_histogram(content)
    val total = greatest(aggregate(hist, lit(0L), (a, v) => a + v), lit(1L)).cast("double")
    transform(hist, v => v.cast("double") / total)
  }

  /** Frame sampling stub: split the payload into `n` equal byte slices
    * ("frames"). Real video sampling swaps the slicing for keyframe
    * extraction; the array-of-binary output shape and its explode
    * ergonomics are the real part. */
  def frameSample(content: Column, n: Int): Column = {
    val total = length(content)
    val frame = greatest((total / n).cast("int"), lit(1))
    transform(sequence(lit(0), lit(n - 1)),
      i => substring(content, (i * frame + 1).cast("int"), frame))
  }

  /** Resize stub: truncate-or-zero-pad the payload to `targetBytes` —
    * byte-level stand-in for image resizing (output size invariant:
    * downstream batching can rely on fixed-width payloads). */
  def resizeStub(content: Column, targetBytes: Int): Column =
    rpad(content, targetBytes, Array[Byte](0))

  /** Batched decode over partitions — the Scala analog of the
    * `mapInPandas` batch shape: the decoder sees `batchSize` payloads at
    * a time (real codecs and model-inference runtimes amortize setup per
    * batch, not per row), partitions stream through without
    * materializing, and the output schema is a typed case class. The
    * decode itself is the same deterministic STUB as [[decodeStub]]
    * (no codec libs in this container) — swap `decodeBatch`'s body for a
    * real library call with the same signature. */
  final case class DecodedMedia(media_id: Long, width: Int, height: Int,
                                channels: Int, n_bytes: Int)

  def decodeBatched(media: DataFrame, batchSize: Int = 64)
      : org.apache.spark.sql.Dataset[DecodedMedia] = {
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    implicit val enc: Encoder[DecodedMedia] = Encoders.product[DecodedMedia]
    val rows = media.select(col("media_id"), col("content"))
    rows.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        decodeBatch(batch.map(r => (r.getLong(0), r.getAs[Array[Byte]](1))))
      }
    }
  }

  /** The per-batch decode call a real implementation replaces: input is
    * one batch of (id, payload), output one row per payload. Stub
    * arithmetic mirrors [[decodeStub]] exactly (md5-derived fake
    * dimensions) so the two paths are cross-checkable. */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[DecodedMedia] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { case (id, bytes) =>
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      val w = (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1920).toInt + 1
      val h = (java.lang.Long.parseLong(hex.substring(8, 16), 16) % 1080).toInt + 1
      DecodedMedia(id, w, h, if (bytes.length % 2 == 0) 3 else 1, bytes.length)
    }
  }

  /** The composed decode → features → sample pipeline over a media table.
    * Everything is column expressions in one projection — one scan, no
    * shuffle, whole-stage codegen except the histogram expression. */
  def extractAll(media: DataFrame, frames: Int = 4): DataFrame =
    media
      .withColumn("decoded", decodeStub(col("content")))
      .withColumn("features", byteFeatures(col("content")))
      .withColumn("frames", frameSample(col("content"), frames))
      .withColumn("n_frames", size(col("frames")))
}
