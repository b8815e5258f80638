package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `BinaryType` columns with typed metadata.
  *
  * The real decode step (JPEG decode, audio resample, video frame-sample)
  * needs native codec libraries that are NOT in this container — it is
  * STUBBED with a deterministic fake (`fakeDecodeFeatures`). Everything
  * around the stub — schema, batching, partition-parallel execution, the
  * mapPartitions plumbing a Pandas-UDF/`mapInArrow` equivalent would use —
  * is real and tested. Swapping the stub for a codec call changes one
  * function body, not the plan.
  */
object Multimodal {

  /** Typed metadata every payload carries. */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", IntegerType),
    StructField("checksum", StringType)))

  /** Wrap a string column as a binary payload with metadata — stands in for
    * reading real media bytes; pure expressions, codegen'd.
    */
  def attachPayload(df: DataFrame, srcCol: String, mime: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        octet_length(col(srcCol).cast("binary")).as("n_bytes"),
        md5(col(srcCol)).as("checksum")))

  /** One decoded payload's features (the stub's output row type). */
  final case class MediaFeatures(id: Long, n_bytes: Int, feat: Seq[Double])

  /** Feature-extraction over payload batches via typed
    * `Dataset.mapPartitions` — the Scala analogue of `mapInPandas`: one
    * iterator per partition, vectorizable batch shape, no driver
    * involvement. Typed (encoder-backed) rather than `.rdd` +
    * `createDataFrame`: the plan stays Deserialize→MapPartitions→Serialize
    * with column pruning intact up to the boundary and no `Row` boxing or
    * `RDDScanExec` break in the middle.
    *
    * STUB: emits a deterministic 4-bucket byte histogram + length instead of
    * decoded image features. Replace the body with a codec call in
    * production.
    */
  def decodeFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB decode: byte-value histogram over 4 buckets, L1-normalized.
          val hist = new Array[Double](4)
          bytes.foreach(b => hist((b & 0xff) / 64) += 1.0)
          val n = math.max(bytes.length, 1).toDouble
          MediaFeatures(id, bytes.length, hist.map(_ / n).toSeq)
        }
      }
      .toDF()
  }

  /** Resize/resample plumbing — the image-resize / audio-resample analog:
    * keep every `factor`-th byte of the payload. The byte-decimation body is
    * a deterministic STUB (a real scaler needs codec libraries this
    * container lacks); the distributed shape — typed `mapPartitions`,
    * encoder-backed, no driver involvement — is the real part, as with
    * [[decodeFeatures]].
    */
  def resampleStub(df: DataFrame, idCol: String, factor: Int): DataFrame = {
    require(factor >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val out = new Array[Byte]((bytes.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
        (id, out)
      })
      .toDF(idCol, "payload_resampled")
  }

  /** Big-endian 4-byte encoding of a non-negative 32-bit value — the byte
    * order PNG/network formats use. `hex` of a long pads to 16 nibbles at
    * most; `lpad(..., 8)` keeps exactly the low 4 bytes.
    */
  private def be4(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unhex(lpad(hex(v.cast("long")), 8, "0"))

  /** A minimal syntactically-valid PNG header (8-byte signature + IHDR
    * length/type + 13-byte IHDR data) carrying the given dimensions —
    * the test-vector builder for [[imageDims]]. Trailing IHDR fields: bit
    * depth 8, color type 6 (RGBA), deflate, no filter, no interlace.
    */
  def pngHeader(width: org.apache.spark.sql.Column, height: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      unhex(lit("89504E470D0A1A0A" + "0000000D" + "49484452")),
      be4(width), be4(height),
      unhex(lit("0806000000")))

  /** Image-dimension extraction from an opaque binary payload WITHOUT any
    * codec: a PNG's width and height live at fixed big-endian offsets in
    * the IHDR chunk (bytes 17-24, 1-based), so the parse is pure
    * `substring`/`hex`/`conv` expressions — codegen'd, linear, no UDF.
    * Non-PNG payloads (signature mismatch) yield null dims. This is the
    * header-metadata half of multimodal ingest that genuinely does not
    * need a decoder; pixel work stays behind [[decodeFeatures]]'s stub.
    */
  def imageDims(df: DataFrame, payloadCol: String): DataFrame = {
    val isPng = hex(substring(col(payloadCol), 1, 8)) === lit("89504E470D0A1A0A")
    def beInt(off: Int) =
      conv(hex(substring(col(payloadCol), off, 4)), 16, 10).cast("int")
    df.withColumn("width", when(isPng, beInt(17)))
      .withColumn("height", when(isPng, beInt(21)))
  }

  /** Frame-sampling plumbing: split a payload into fixed-size "frames"
    * (byte chunks) and explode one row per sampled frame — the partitioning
    * shape a video pipeline needs (payload → n frame rows), all expressions.
    * Empty payloads produce zero frames. Note frames are BYTE slices: for
    * non-ASCII text payloads a frame boundary can split a multi-byte
    * character (real media payloads are opaque bytes, where this is the
    * correct unit).
    */
  def sampleFrames(df: DataFrame, idCol: String, frameBytes: Int, everyNth: Int): DataFrame = {
    val nFrames = ceil(octet_length(col("payload")).cast("double") / frameBytes).cast("int")
    val frameIdx = when(nFrames >= 1, sequence(lit(0), nFrames - 1))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), col("payload"), posexplode(frameIdx).as(Seq("frame_no", "f")))
      .where(col("frame_no") % everyNth === 0)
      .select(col(idCol), col("frame_no"),
        col("payload").substr(col("frame_no") * frameBytes + 1, lit(frameBytes)).as("frame"))
  }
}
