package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.4): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and run the
  * decode / feature-extract step as a per-partition batch operator.
  *
  * The container has no image/audio codecs, so [[extractFeatures]]' inner
  * decoder is a clearly-marked deterministic STUB (byte histogram); the
  * Spark-side plumbing — schema, binary column handling, partition-batch
  * iteration, typed output — is real and tested. Swapping the stub for a
  * JNI/ONNX decoder changes one function.
  *
  * Scale posture: payloads never pass through a shuffle here — metadata
  * extraction and feature extraction are map-only; downstream joins
  * should carry (id, features) only, never the payload.
  */
object Multimodal {

  /** A decoded feature row: id, payload size, and the extracted feature
    * vector (the stub's 16-bin byte histogram, normalized). */
  case class FeatureRow(doc_id: Long, n_bytes: Long, features: Array[Double])

  /** Pack a text column as an opaque binary payload with typed metadata —
    * the shape a real pipeline has after `spark.read.format("binaryFile")`
    * or reading parquet with a `binary` media column. */
  def payloads(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      col(contentCol).cast("binary").as("payload"),
      struct(length(col(contentCol).cast("binary")).cast("long").as("n_bytes"),
        col("lang"), col("source")).as("meta"))

  /** Payload table from a real media directory via Spark's `binaryFile`
    * source — the production entry point ([[payloads]] is the
    * text-column twin for the fixture tables). Emits the same
    * (doc_id, payload, meta) shape, so [[metaTable]] / [[resize]] /
    * [[sampleFrames]] / [[extractFeatures]] run unchanged on either.
    *
    * doc_id is a hash of the dir-RELATIVE path: stable when the same
    * corpus mounts at a different prefix, yet unique across
    * subdirectories (same-named files under `recursiveFileLookup` must
    * not collide); `meta.source` keeps the relative path for
    * traceability, `meta.lang` is null (unknown for raw media).
    *
    * 100 TB posture: binaryFile assigns whole files to partitions
    * (a file never splits), reads are map-only, and media directories
    * should be filtered at the source via its `pathGlobFilter` /
    * `recursiveFileLookup` options rather than a post-scan filter —
    * pass them through `options`. */
  def payloadsFromDir(spark: org.apache.spark.sql.SparkSession, dir: String,
                      options: Map[String, String] = Map.empty): DataFrame = {
    // `path` arrives fully qualified (e.g. file:/...); qualify `dir` the
    // same way so the relative path is an exact fixed-length strip. That
    // strip is only sound under a real directory — a glob or file path
    // would misalign it into colliding/garbage ids, so reject those
    // loudly (filter WITHIN a dir via pathGlobFilter in `options`).
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val isDir =
      try fs.getFileStatus(hp).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    require(isDir,
      s"payloadsFromDir expects an existing directory (not a glob/file): $dir")
    val qualified = fs.makeQualified(hp).toString
    val prefix = if (qualified.endsWith("/")) qualified else qualified + "/"
    // +1: SQL substring is 1-based; codePointCount because Spark's
    // substring counts code points while String.length counts UTF-16
    // units (they differ on non-BMP directory names)
    val rel = expr(
      s"substring(path, ${prefix.codePointCount(0, prefix.length) + 1})")
    spark.read.format("binaryFile").options(options).load(dir)
      .select(
        xxhash64(rel).as("doc_id"),
        col("content").as("payload"),
        struct(col("length").cast("long").as("n_bytes"),
          lit(null).cast("string").as("lang"),
          rel.as("source")).as("meta"))
  }

  /** Metadata extraction over the binary payload — size, content hash,
    * magic-bytes prefix. Map-only scalar expressions (oracle-able). */
  def metaTable(payloadDf: DataFrame): DataFrame =
    payloadDf.select(col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("content_md5"),
      base64(substring(col("payload"), 1, 8)).as("magic_b64"),
      col("meta.lang").as("lang"),
      col("meta.source").as("source"))

  /** Resize as a per-partition batch operator — the image analog of
    * [[sampleFrames]]: shrink each payload by an integer `factor`.
    *
    * STUB DECODER: no image codec in this container — "resize" is byte
    * decimation (every `factor`-th byte), deterministic, so the plumbing
    * (map-only shape, per-partition init point, binary-in/binary-out
    * schema) is real and testable; a real implementation swaps the
    * decimator for decode → interpolate → encode. */
  def resize(payloadDf: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE (codec/interpolator handles)
        it.map { case (id, bytes) =>
          val out = new Array[Byte]((bytes.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
          (id, out)
        }
      }.toDF("doc_id", "payload_resized")
  }

  /** A sampled "frame": parent doc, frame index within the payload, and
    * the frame's bytes. */
  case class FrameRow(doc_id: Long, frame_idx: Long, frame: Array[Byte])

  /** Frame sampling as a per-partition batch operator — the video analog
    * of [[extractFeatures]]: decode the container, emit every `stride`-th
    * frame for downstream feature extraction. One input row fans out to
    * many frame rows; the fan-out happens INSIDE the partition (iterator
    * flatMap), so payloads never shuffle and output partitioning follows
    * the input.
    *
    * STUB DECODER: no video codec in this container — a "frame" is a
    * fixed-size byte chunk (`frameBytes`), deterministically derived, so
    * the plumbing (fan-out shape, per-partition init point, typed
    * output) is real and testable; a real implementation swaps the
    * chunker for a demuxer. */
  def sampleFrames(payloadDf: DataFrame, frameBytes: Int,
                   stride: Int): Dataset[FrameRow] = {
    require(frameBytes > 0 && stride > 0,
      s"frameBytes/stride must be positive, got $frameBytes/$stride")
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE (demuxer/codec handles)
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes // trailing partial dropped
          (0 until nFrames by stride).iterator.map { f =>
            FrameRow(id, f.toLong,
              java.util.Arrays.copyOfRange(bytes, f * frameBytes,
                (f + 1) * frameBytes))
          }
        }
      }
  }

  /** Feature extraction as a per-partition batch operator
    * (`mapPartitions`): the iterator shape is where a real implementation
    * amortizes decoder/model initialization per partition (the JVM
    * analog of `mapInPandas` batch UDFs).
    *
    * STUB DECODER: a real pipeline would decode the payload (image →
    * pixels, audio → PCM) and run a feature model. Neither codec exists
    * in this container, so the "features" are a deterministic 16-bin
    * byte histogram (bin = high nibble) — same signature, same batching,
    * fake content. Deterministic on purpose: the DuckDB oracle recomputes
    * the identical histogram from `hex(encode(text))`, so even the stub
    * path is hash-checked end to end (q36). Rounding is half-up
    * (`floor(x·1e9 + 0.5)/1e9`), matching SQL `round(x, 9)` in both
    * engines — NOT `rint`, whose half-even ties would diverge. */
  /** Perceptual hash per payload — the LAION-style media near-dup
    * signal: sample a fixed [[graft.ops.Dedup.SimHashBits]]-position
    * grid over the decoded "image", bit k = sample ≥ the grid mean
    * (average-hash/aHash). Output (doc_id, simhash) — named to drop
    * straight into [[graft.ops.Dedup.simhashPairs]], whose 15-bit
    * banding then finds Hamming-bounded near-dup media pairs with one
    * bucket-keyed shuffle, never a pairwise scan. The compare is
    * integer (`sample · 60 ≥ Σ samples`) so the bit never depends on
    * float division order — bit-identical across engines.
    *
    * STUB DECODER, like every media op here: no codec in the
    * container, so the "decoded grayscale" is the payload's own byte
    * stream read as a string (the fixture payloads are ASCII). A real
    * implementation decodes → grayscale-resamples an 8×8 grid; the
    * grid sampling, integer mean compare, fingerprint assembly and the
    * banded pair join downstream are the real, tested machinery.
    * Map-only; payloads never shuffle (only the 8-byte hash does). */
  def perceptualHashes(payloadDf: DataFrame): DataFrame = {
    val n = graft.ops.Dedup.SimHashBits
    payloadDf
      .select(col("doc_id"), col("payload").cast("string").as("__txt"))
      // grid positions 1 + (k·len) div n, k = 0..n−1: always within the
      // payload, evenly spread, repeats harmlessly when len < n
      .select(col("doc_id"), transform(sequence(lit(0), lit(n - 1)),
        k => ascii(col("__txt").substr(
          (lit(1) + floor(k * length(col("__txt")) / lit(n))).cast("int"),
          lit(1)))).as("__bs"))
      .withColumn("__sm", aggregate(col("__bs"), lit(0L),
        (a, x) => a + x.cast("long")))
      .withColumn("simhash", expr(
        s"""aggregate(sequence(0, ${n - 1}), CAST(0 AS BIGINT), (acc, k) ->
           |  acc + IF(element_at(__bs, k + 1) * $n >= __sm,
           |           shiftleft(CAST(1 AS BIGINT), k),
           |           CAST(0 AS BIGINT)))""".stripMargin))
      .select(col("doc_id"), col("simhash"))
  }

  def extractFeatures(payloadDf: DataFrame): Dataset[FeatureRow] = {
    val spark = payloadDf.sparkSession
    import spark.implicits._
    payloadDf.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE (decoder handles, model weights)
        it.map { case (id, bytes) =>
          val hist = new Array[Double](16)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1.0; i += 1 }
          val n = math.max(1, bytes.length).toDouble
          var b = 0
          while (b < 16) { hist(b) = math.floor(hist(b) / n * 1e9 + 0.5) / 1e9; b += 1 }
          FeatureRow(id, bytes.length.toLong, hist)
        }
      }
  }
}
