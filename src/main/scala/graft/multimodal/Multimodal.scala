package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: opaque
  * `binary` payload columns with a typed metadata struct, plus
  * decode / feature-extract / frame-sample operators — north-star
  * extension scope. The reference's nearest surface is BLOB→String
  * stringification (converter/chwriteconverter.py:17-41 in
  * /root/reference); here binary stays binary end-to-end.
  *
  * DECODE IS STUBBED: real image/audio decoding needs native
  * libraries this environment intentionally lacks, so
  * [[featureStub]] / [[frameFingerprints]] derive deterministic
  * md5-based pseudo-features instead. Everything AROUND the stub —
  * the envelope schema, the per-row batch shape, partition-parallel
  * execution, pure-`Column` plumbing — is the real design: swap the
  * md5 expressions for a decode UDF (or `mapInPandas` in PySpark)
  * and nothing else changes.
  */
object Multimodal {

  /** Envelope: payload + typed metadata, the schema a 100-TB media
    * lake carries per object (content-addressed id, format tag,
    * byte length).
    */
  def envelope(payload: Column, format: Column): Column =
    struct(
      payload.as("payload"),
      struct(
        md5(payload).as("content_id"),
        format.as("format"),
        length(payload).as("n_bytes")).as("meta"))

  /** Deterministic fixed-width pseudo-feature vector from a binary
    * payload: `dims` 16-bit integers carved from the md5 digest —
    * the stand-in for "decode then embed". Pure codegen'd column
    * expression (conv/substring over the hex digest).
    */
  def featureStub(payload: Column, dims: Int = 8): Column = {
    require(dims <= 8, "md5 yields 128 bits = 8 x 16-bit features")
    array((0 until dims).map { i =>
      conv(substring(md5(payload), i * 4 + 1, 4), 16, 10).cast("int")
    }: _*)
  }

  /** "Frame sampling": split the payload into `frames` equal byte
    * ranges and fingerprint each — the batch shape of video
    * keyframe extraction (N fixed-size outputs per input row) with
    * the decoder stubbed to md5-of-slice.
    */
  def frameFingerprints(payload: Column, frames: Int = 4): Column = {
    // frame i covers byte range [floor(len*i/frames), floor(len*(i+1)/frames))
    def cut(i: Int): Column =
      floor(length(payload) * lit(i) / lit(frames)).cast("int")
    array((0 until frames).map { i =>
      md5(payload.substr(cut(i) + 1, cut(i + 1) - cut(i)))
    }: _*)
  }

  /** "Resize": deterministic downsample of the payload to
    * `targetBytes` by striding — every ceil(len/target)-th byte is
    * kept, so the output is reproducible, size-bounded, and
    * content-derived (the real operator would decode + bilinear
    * resample; the Spark-side contract — binary in, smaller binary
    * out, pure per-row column expression, no shuffle — is identical).
    * Payloads already at or under the target pass through unchanged.
    */
  def resizeStub(payload: Column, targetBytes: Int = 64): Column = {
    val stride = greatest(
      ceil(length(payload).cast("double") / lit(targetBytes)).cast("int"),
      lit(1))
    // one 1-byte slice per kept position; positions past the end
    // yield empty slices, so short payloads need no special case in
    // the concat (binary substr/concat stay binary end-to-end)
    when(length(payload) <= targetBytes, payload)
      .otherwise(concat((0 until targetBytes).map { i =>
        payload.substr(lit(i) * stride + 1, lit(1))
      }: _*))
  }

  /** Attach the multimodal envelope + stub features to a text corpus
    * by treating the UTF-8 text bytes as the payload — how the
    * fixture (which has no real media) exercises the full pipeline
    * shape.
    */
  def fromText(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      envelope(encode(col(textCol), "UTF-8"), lit("text/plain")).as("obj"))

  /** Per-object feature extraction over the envelope — one scan,
    * no shuffle; the groupBy in [[formatSummary]] is the only
    * exchange.
    */
  def extract(objects: DataFrame, dims: Int = 8, frames: Int = 4): DataFrame =
    objects.select(
      col("*"),
      col("obj.meta.content_id").as("content_id"),
      col("obj.meta.n_bytes").as("n_bytes"),
      featureStub(col("obj.payload"), dims).as("features"),
      frameFingerprints(col("obj.payload"), frames).as("frames"))

  /** Batched decode via mapPartitions — the Scala analog of a
    * `mapInPandas` decode stage: rows stream through a per-partition
    * iterator so a real decoder can amortize model/codec
    * initialization once per partition and process micro-batches of
    * `batchSize` payloads (the GPU-feeding shape). The decoder here
    * is STUBBED deterministic (sum/xor over payload bytes standing
    * in for pixels); swap `decodeBatch` for a JNI/ONNX call and
    * nothing else changes. Output: (doc_id, n_bytes, checksum).
    */
  def decodeBatched(objects: DataFrame, batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    implicit val enc: Encoder[(Long, Int, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaLong)
    val in = objects.select(col("doc_id"), col("obj.payload").as("payload"))
    in.mapPartitions { rows: Iterator[Row] =>
      // per-partition init happens HERE (once), not per row
      rows.grouped(batchSize).flatMap { batch =>
        decodeBatch(batch.map(r => (r.getLong(0), r.getAs[Array[Byte]](1))))
      }
    }.toDF("doc_id", "n_bytes", "checksum")
  }

  /** The stub "decoder": one call per micro-batch of payloads. */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])])
      : Seq[(Long, Int, Long)] =
    batch.map { case (id, bytes) =>
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum = sum * 131 + (bytes(i) & 0xff); i += 1 }
      (id, bytes.length, sum)
    }

  /** Corpus roll-up by format: object counts, byte volume, mean
    * first-feature — the sanity aggregation a media-lake audit runs.
    */
  def formatSummary(extracted: DataFrame): DataFrame =
    extracted.groupBy(col("obj.meta.format").as("format"))
      .agg(
        count(lit(1)).as("n_objects"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("content_id")).as("n_distinct"),
        (sum(element_at(col("features"), 1)).cast("double") /
          count(lit(1)).cast("double")).as("avg_feat0"))
}
