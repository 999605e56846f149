package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `BinaryType` columns travelling next to typed metadata, processed by
  * per-partition batch decoders.
  *
  * The Spark-side machinery here — schema, batched mapPartitions decode,
  * partition sizing — is real and tested. REAL decode exists for
  * container-friendly formats in [[MediaCodecs]] (RIFF/PCM WAV, BI_RGB
  * BMP — oracle-checked via `p_wav_decode` / `p_bmp_decode`) and for
  * baseline JPEG in [[Jpeg]] (pure-JVM Huffman + IDCT decoder,
  * `p_jpeg_decode` + ImageIO cross-validation); `decodeStub` below
  * remains the stand-in only for formats that genuinely need codec
  * libraries this container lacks (MP3/H.264 entropy+transform stacks),
  * deriving deterministic fake features so pipeline shape, ordering and
  * schema behavior stay exercisable end-to-end. Swap it for a JNI/FFI
  * codec without touching callers.
  *
  * Scale notes: media blobs dominate row size, so partition count must be
  * driven by `spark.sql.files.maxPartitionBytes` (blob-aware), and decode is
  * per-partition batched to amortize codec init — the same shape a Pandas-UDF
  * `mapInPandas` decode takes in PySpark.
  */
object Multimodal {

  /** Canonical multimodal row schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true)))

  /** Wrap a text column as an opaque binary payload (fixture helper — the
    * testdata has no real media, so documents stand in as payloads). */
  def asPayload(text: Column): Column = encode(text, "UTF-8")

  /** STUB decode: deterministic fake "features" of a payload — byte length,
    * a checksum-like 60-bit hash, and a fixed-length pseudo-embedding from
    * hash-seeded positions. Real decode (JPEG→pixels, PCM→frames) would
    * replace only this function. Expressed as native columns so even the
    * stub is codegen'd. */
  def decodeStub(payload: Column, embedDim: Int = 4): Column = {
    // checksum over the HEX view of the raw bytes: engine-portable (md5 of
    // a VARCHAR both here and in DuckDB) and byte-faithful for arbitrary
    // binary media — unlike a UTF-8 decode (mangles non-UTF8 bytes) or
    // base64 (Spark's is MIME-chunked, not engine-stable)
    val h = TextOps.hash60(hex(payload))
    struct(
      octet_length(payload).as("n_bytes"),
      h.as("checksum"),
      array((0 until embedDim).map(i =>
        ((shiftright(h, i * 8).bitwiseAND(lit(255L))).cast("double") / 255.0)): _*).as("embedding"))
  }

  /** Batched per-partition decode for codecs that need init-once state (the
    * real-codec path; the stub just forwards to `decodeStub` semantics).
    * Kept as a DataFrame→DataFrame operator so callers are agnostic. */
  def decodePartitioned(df: DataFrame, payloadCol: String, embedDim: Int = 4): DataFrame =
    df.withColumn("decoded", decodeStub(col(payloadCol), embedDim))

  /** Frame-sampling stub for video-like payloads: deterministic stride over
    * the byte stream standing in for I-frame extraction. Seeds from the
    * hex view of the payload (byte-faithful and engine-stable; base64
    * would be MIME-chunked and a UTF-8 decode would mangle media bytes). */
  def sampleFrames(payload: Column, stride: Int): Column =
    transform(
      sequence(lit(1), greatest(octet_length(payload), lit(1)), lit(stride)),
      i => TextOps.hash60(concat(hex(payload), i.cast("string"))) % 256)
}
