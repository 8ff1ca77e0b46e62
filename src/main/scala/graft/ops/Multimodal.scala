package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operator family (north star): treat image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and
  * run decode / feature-extraction as partition-wise batch functions.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * STUB: a deterministic fake that stands in for a real decoder (e.g.
  * libjpeg / ffmpeg bindings or a `mapInPandas`-style vectorized UDF in
  * PySpark). Everything around it — the binary column, the metadata
  * schema, the `mapPartitions` batch shape, the partitioning — is real
  * and is what a production decode pipeline on Spark looks like: one
  * task per input split, the decoder amortized across the partition's
  * rows, output schema declared up front.
  *
  * The fixtures carry no binary column, so the pipeline derives one
  * from `documents.text` (utf-8 bytes) — the plumbing is identical for
  * a real media payload.
  */
object Multimodal extends QueryFamily {

  /** Typed metadata over binary payloads: size, checksum, fake format
    * tag. Pure column expressions — oracle-checkable. */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.documents(spark, dir)
      .withColumn("blob", $"text".cast("binary"))
      .select(
        $"doc_id",
        octet_length($"blob").as("n_bytes"),
        md5($"blob").as("checksum"),
        element_at(
          array(lit("jpeg"), lit("png"), lit("wav")),
          (pmod(octet_length($"blob"), lit(3)) + 1).cast("int")).as("format"))
      .orderBy($"doc_id")
  }

  val qMultimodalMetaSql: String =
    """SELECT doc_id, octet_length(text::BLOB) AS n_bytes, md5(text) AS checksum,
      | ['jpeg', 'png', 'wav'][(octet_length(text::BLOB) % 3) + 1] AS format
      |FROM documents ORDER BY doc_id""".stripMargin

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** REAL image decode via `javax.imageio` (JDK-bundled PNG/BMP/GIF/
    * JPEG readers — no external codecs needed): when the payload parses
    * as an image this returns its actual format name, true dimensions
    * and an 8-bin luminance histogram. Non-image payloads return None
    * and take the deterministic stub path below (the parquet fixtures
    * carry utf-8 text payloads, so they all fall back; MultimodalSpec
    * drives real PNG bytes through the same pipeline). */
  private def decodeImage(payload: Array[Byte]): Option[(String, Int, Int, Array[Double])] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val fmt = reader.getFormatName.toLowerCase
          val img = reader.read(0)
          val (w, h) = (img.getWidth, img.getHeight)
          val bins = new Array[Double](8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              bins(lum * 8 / 256) += 1.0
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          Some((fmt, w, h, bins.map(b => math.rint(b / n * 10000) / 10000)))
        } finally reader.dispose()
      }
    } catch {
      case _: java.io.IOException => None
    } finally if (iis != null) iis.close()
  }

  /** STUB decoder: deterministic fake standing in for a real media
    * decode of formats the JVM cannot read (audio/video). Maps the
    * payload to fake dimensions and an 8-bin byte histogram "feature
    * vector". A real deployment replaces ONLY this function body
    * (bytes => decoded features); the batch shape stays. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Array[Double]) = {
    val w = 64 + (payload.length % 193)
    val h = 64 + ((payload.length * 31) % 149)
    val bins = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) % 8) += 1.0
      i += 1
    }
    val n = math.max(1, payload.length).toDouble
    (w, h, bins.map(b => math.rint(b / n * 10000) / 10000))
  }

  /** Partition-wise decode + feature extraction over a (doc_id, blob)
    * relation. `mapPartitions` so per-partition decoder setup cost (in
    * a real pipeline: codec init, model load) is amortized across the
    * batch — the Scala analogue of `mapInPandas`. Image payloads decode
    * for real through the JDK's ImageIO; everything else takes the
    * deterministic stub. */
  def featuresOf(src: DataFrame): DataFrame = {
    import src.sparkSession.implicits._
    val enc = RowEncoder.encoderFor(featureSchema)
    src.mapPartitions { rows =>
      // per-partition decoder init: no disk-backed ImageIO cache files
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getAs[Long]("doc_id")
        val payload = r.getAs[Array[Byte]]("blob")
        decodeImage(payload) match {
          case Some((fmt, w, h, feats)) => Row(id, fmt, w, h, feats)
          case None =>
            val fmt = Seq("jpeg", "png", "wav")(payload.length % 3)
            val (w, h, feats) = decodeStub(payload)
            Row(id, fmt, w, h, feats)
        }
      }
    }(enc)
  }

  /** Driver check is rows-only (no SQL oracle for the decode);
    * MultimodalSpec pins the schema, determinism, feature invariants
    * and the real-PNG decode path. */
  def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    featuresOf(
      T.documents(spark, dir)
        .withColumn("blob", $"text".cast("binary"))
        .select($"doc_id", $"blob"))
      .orderBy($"doc_id")
  }

  /** Frame sampling: split each payload into fixed-size frames (the
    * audio/video access pattern), one row per sampled frame with a
    * per-frame checksum and mean byte value. Frame extraction is pure
    * column algebra (sequence + explode + substring on binary), so it
    * scales as a projection; only every 4th frame is kept — the "sample
    * frames, not all frames" shape of video pipelines. Oracle-checked:
    * DuckDB replicates the frame math on the utf-8 text bytes. */
  def qMultimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frameLen = 64
    T.documents(spark, dir)
      .withColumn("blob", $"text".cast("binary"))
      .withColumn("n_frames",
        ceil(octet_length($"blob") / lit(frameLen.toDouble)).cast("int"))
      .withColumn("f", explode(expr("sequence(0, n_frames - 1)")))
      .filter($"f" % 4 === 0)
      .withColumn("frame", expr(s"substring(blob, f * $frameLen + 1, $frameLen)"))
      .select(
        $"doc_id", $"f".as("frame_idx"),
        octet_length($"frame").as("frame_bytes"),
        md5($"frame").as("frame_checksum"))
      .orderBy($"doc_id", $"frame_idx")
  }

  val qMultimodalFramesSql: String =
    """SELECT doc_id, f AS frame_idx,
      | octet_length(substr(text, f * 64 + 1, 64)::BLOB) AS frame_bytes,
      | md5(substr(text, f * 64 + 1, 64)) AS frame_checksum
      |FROM (SELECT doc_id, text,
      |        unnest(range(0, CAST(ceil(octet_length(text::BLOB) / 64.0) AS INT))) AS f
      |      FROM documents)
      |WHERE f % 4 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Nearest-neighbor resize of a decoded image to a w×h grayscale
    * thumbnail: source pixel (x·W/w, y·H/h), luminance via the same
    * integer 299/587/114 weights as the feature path. Real images go
    * through ImageIO; stub payloads synthesize a byte-grid pseudo-
    * image of the stub's dimensions, so the kernel is exercised on
    * every row either way. */
  private def resizeStub(payload: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val (w, h, _) = decodeStub(payload)
    val out = new Array[Byte](tw * th)
    if (payload.isEmpty) return out // zero-filled thumb for empty blobs
    val n = payload.length
    var y = 0
    while (y < th) {
      var x = 0
      while (x < tw) {
        val sx = x * w / tw; val sy = y * h / th
        out(y * tw + x) = payload((sy * w + sx) % n)
        x += 1
      }
      y += 1
    }
    out
  }

  private def resizeImage(payload: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          // a truncated/corrupt image must fall back to the stub path,
          // not fail the task
          val img = try reader.read(0) catch { case _: Exception => null }
          if (img == null) return None
          val (w, h) = (img.getWidth, img.getHeight)
          val out = new Array[Byte](tw * th)
          var y = 0
          while (y < th) {
            var x = 0
            while (x < tw) {
              val rgb = img.getRGB(x * w / tw, y * h / th)
              val lum = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              out(y * tw + x) = lum.toByte
              x += 1
            }
            y += 1
          }
          Some(out)
        } finally reader.dispose()
      }
    } finally if (iis != null) iis.close()
  }

  private val thumbSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("thumb",
      org.apache.spark.sql.types.BinaryType, nullable = false)))

  /** Partition-wise resize to a 16×16 grayscale thumbnail — the batch
    * normalization step in front of any vision encoder. Same
    * `mapPartitions` amortization contract as [[featuresOf]]; the
    * 256-byte thumbnails are the columnar shape downstream training
    * shards actually store. */
  def resizeOf(src: DataFrame, tw: Int = 16, th: Int = 16): DataFrame = {
    val enc = RowEncoder.encoderFor(thumbSchema)
    src.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getAs[Long]("doc_id")
        val payload = r.getAs[Array[Byte]]("blob")
        val thumb = resizeImage(payload, tw, th)
          .getOrElse(resizeStub(payload, tw, th))
        Row(id, thumb)
      }
    }(enc)
  }

  /** Rows-only driver check (decoder output has no SQL twin);
    * MultimodalSpec pins exact nearest-neighbor pixels on a real PNG,
    * determinism, and the 256-byte contract. */
  def qMultimodalResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    resizeOf(
      T.documents(spark, dir)
        .withColumn("blob", $"text".cast("binary"))
        .select($"doc_id", $"blob"))
      .select($"doc_id", md5($"thumb").as("thumb_md5"),
        octet_length($"thumb").as("thumb_bytes"))
      .orderBy($"doc_id")
  }

  /** Driver-facing variant of [[qMultimodalFeatures]]: the feature
    * vector is comma-joined to a string because top-level array columns
    * crash the driver harness's pandas row sort (unhashable ndarray).
    * The typed array pipeline stays the library API (MultimodalSpec). */
  def qMultimodalFeaturesFlat(spark: SparkSession, dir: String): DataFrame =
    qMultimodalFeatures(spark, dir).withColumn("features",
      expr("array_join(transform(features, x -> cast(x AS string)), ',')"))

  private val pixelSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("px", ArrayType(IntegerType, containsNull = false), nullable = false)))

  /** [[resizeOf]] with the thumbnail emitted as unsigned pixel ints
    * (0-255) instead of raw bytes — the columnar shape DOWNSTREAM
    * image algebra (perceptual hashing, embedding preprocs) consumes,
    * and one a SQL engine can read back without a codec. */
  def pixelsOf(src: DataFrame, tw: Int = 16, th: Int = 16): DataFrame = {
    val enc = RowEncoder.encoderFor(pixelSchema)
    src.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getAs[Long]("doc_id")
        val payload = r.getAs[Array[Byte]]("blob")
        val thumb = resizeImage(payload, tw, th)
          .getOrElse(resizeStub(payload, tw, th))
        Row(id, thumb.map(b => b & 0xff))
      }
    }(enc)
  }

  /** Absolute path of the materialized 16x16 pixel side-table for one
    * fixture dir — keyed by the fixture's basename so every scale
    * factor gets its own sidecar. Lives under the repo's tools/fixtures
    * (SPARK_GRAFT_FIXTURE_DIR overrides), where the DuckDB oracle can
    * read it back (Verify substitutes the {THUMBS} token in oracle SQL
    * with this path). */
  def thumbsSidecarPath(dir: String): String =
    Fixtures.sidecarPath(dir, "thumbs")

  /** Deterministic near-duplicate SEED thumbnails appended to every
    * fixture's sidecar (round-12 verdict task 5): the sf0.001/sf0.01
    * stub decodes genuinely contain no image near-dup pairs, which
    * left both phash differentials declared-vacuous at the verify
    * fixture and leaning on committed sf0.1 evidence. Three synthetic
    * grids make the cross-engine Hamming logic exercise NON-EMPTY
    * output at every fixture:
    *  - ids -3 and -2 are byte-identical (hamming 0 through both the
    *    aHash and DCT pipelines — all bands collide);
    *  - id -1 is the same grid with its first 6 pixels flipped across
    *    the mean (aHash hamming exactly 6, confined to word 0, so the
    *    7 untouched words guarantee the band collision).
    * The base grid is two-valued (40/216) with values ~88 away from
    * the 128 mean, so the 6-pixel flip's +1.375 mean shift cannot flip
    * any other bit. Negative doc_ids can never collide with corpus
    * ids (fixture generators key from 0). MultimodalSpec pins the
    * exact expected seed pairs at the smallest fixture. */
  private[graft] val seedThumbs: Seq[(Long, Seq[Int])] = {
    val base: Seq[Int] = (0 until 256).map(i => if ((i * 37) % 256 < 128) 40 else 216)
    val flipped: Seq[Int] = base.zipWithIndex.map { case (v, i) =>
      if (i < 6) (if (v == 40) 216 else 40) else v
    }
    Seq((-3L, base), (-2L, base), (-1L, flipped))
  }

  /** Materialize the decode output once per fixture: (doc_id, px[256])
    * to parquet at [[thumbsSidecarPath]], plus the [[seedThumbs]]
    * rows. This is the round-10 verdict task-4 move — decode output
    * that never landed in a relation DuckDB could read made everything
    * DOWNSTREAM of decode rows-only; with the pixels parqueted,
    * image-derived operators (q_dedup_phash) get full differential
    * oracles even though decode itself stays engine-side.
    * Deterministic: same fixture -> same row set (MultimodalSpec pins
    * it), so overwrite is idempotent. */
  def materializeThumbs(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val path = thumbsSidecarPath(dir)
    val seeds = spark.createDataFrame(
      spark.sparkContext.parallelize(
        seedThumbs.map { case (id, px) => Row(id, px) }, 1),
      pixelSchema)
    pixelsOf(
      T.documents(spark, dir)
        .withColumn("blob", $"text".cast("binary"))
        .select($"doc_id", $"blob"))
      .unionByName(seeds)
      .write.mode("overwrite").parquet(path)
    path
  }

  /** Perceptual-hash image dedup over the materialized thumbnails —
    * the standard aHash pipeline: per image, bit i = pixel i above the
    * image's own mean luminance; the 256 bits pack into 8x32-bit words
    * (32 bits per word so the packing is plain integer arithmetic in
    * any engine — no sign-bit traps); candidate pairs come from an
    * equi-join on any EXACTLY-matching word (8-band Hamming LSH: a
    * pair within 7 bit-flips of identical must agree on >= 1 word by
    * pigeonhole); survivors verify on exact Hamming distance <= 16 of
    * 256. Everything after the sidecar read is pure column algebra +
    * one banded self-join whose key cardinality scales with the corpus
    * — the same shuffle shape as the MinHash band join. Full DuckDB
    * oracle over the same sidecar (round-10 verdict task 4). */
  /** The ckpt'd (doc_id, w, word) aHash-word relation of
    * [[qDedupPhash]]. Bit-packing as posexplode + hash aggregates (the
    * oracle's own shape) rather than nested higher-order-function
    * lambdas: HOFs are CodegenFallback and evaluate interpreted (the
    * measured-30x SURVEY finding), while the exploded form stays
    * entirely inside whole-stage codegen — 256 rows per image through
    * two hash aggregates. */
  private def phashWords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = materializeThumbs(spark, dir)
    // NOT spread: the aHash pass is one light explode+sum — measured
    // 0.79 -> 1.39 s with the spread (the pixel-array shuffle costs
    // more than the map work it parallelizes). The DCT pass below IS
    // spread: its two basis contractions are ~10x the map work.
    val pxRows = spark.read.parquet(path)
      .select($"doc_id", posexplode($"px").as(Seq("i", "v")))
    val mean = pxRows.groupBy($"doc_id")
      .agg((sum($"v") / lit(256.0)).as("mean"))
    pxRows.join(mean, Seq("doc_id"))
      .groupBy($"doc_id", expr("i DIV 32").as("w"))
      .agg(sum(when($"v" > $"mean",
        expr("shiftleft(CAST(1 AS BIGINT), i % 32)")).otherwise(0L)).as("word"))
      .ckpt() // (doc_id, w, word): feeds bands AND both verify sides
  }

  /** Band-collision candidate pairs of [[qDedupPhash]] — split out so
    * ScaleSpec can assert the per-document candidate load stays O(1)
    * across fixtures. */
  private[graft] def phashCandidates(spark: SparkSession, dir: String): DataFrame =
    phashBandPairs(phashWords(spark, dir))

  private def phashBandPairs(words: DataFrame): DataFrame = {
    import words.sparkSession.implicits._
    words.select($"doc_id".as("a_id"), $"w", $"word")
      .join(words.select($"doc_id".as("b_id"), $"w", $"word"), Seq("w", "word"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id").distinct()
  }

  def qDedupPhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = phashWords(spark, dir)
    val cand = phashBandPairs(words)
    cand
      .join(words.select($"doc_id".as("a_id"), $"w", $"word".as("wa")), Seq("a_id"))
      .join(words.select($"doc_id".as("bd"), $"w".as("wb_w"), $"word".as("wb")),
        $"b_id" === $"bd" && $"w" === $"wb_w")
      .groupBy($"a_id", $"b_id")
      .agg(sum(bit_count($"wa".bitwiseXOR($"wb"))).cast("int").as("hamming"))
      .filter($"hamming" <= 16)
      .select($"a_id", $"b_id", $"hamming")
      .orderBy($"a_id", $"b_id")
  }

  /** `{THUMBS}` is substituted by Verify with [[thumbsSidecarPath]] of
    * the run's fixture dir (the sidecar is written by the Spark side
    * during query construction, before DuckDB runs). */
  val qDedupPhashSql: String =
    """WITH t AS (SELECT doc_id, px, list_sum(px) / 256.0 AS mean
      |  FROM read_parquet('{THUMBS}/*.parquet')),
      |words AS MATERIALIZED (SELECT doc_id, i // 32 AS w,
      |    sum(CASE WHEN px[i + 1] > mean
      |        THEN (1::BIGINT << (i % 32)) ELSE 0 END)::BIGINT AS word
      |  FROM t, range(0, 256) r(i)
      |  GROUP BY doc_id, i // 32),
      |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM words a JOIN words b ON a.w = b.w AND a.word = b.word
      |  WHERE a.doc_id < b.doc_id),
      |ham AS (SELECT c.a_id, c.b_id,
      |    sum(bit_count(xor(wa.word, wb.word)))::INT AS hamming
      |  FROM cand c
      |  JOIN words wa ON wa.doc_id = c.a_id
      |  JOIN words wb ON wb.doc_id = c.b_id AND wb.w = wa.w
      |  GROUP BY c.a_id, c.b_id)
      |SELECT a_id, b_id, hamming FROM ham
      |WHERE hamming <= 16 ORDER BY a_id, b_id""".stripMargin

  /** The fixed DCT-II basis for [[qDedupPhashDct]]: c(u, p) =
    * cos(pi * (2p + 1) * u / 32) for u in [0, 8) (the low frequencies
    * kept) and p in [0, 16) (the thumbnail edge). Generated ONCE here
    * and embedded into BOTH engines from the same doubles — the Spark
    * side as a broadcast 128-row relation, the DuckDB side as a VALUES
    * literal via Double.toString (shortest round-tripping decimal, so
    * the parsed double is bit-identical). */
  private val dctBasis: Seq[(Int, Int, Double)] =
    for (u <- 0 until 8; p <- 0 until 16)
      yield (u, p, math.cos(math.Pi * (2 * p + 1) * u / 32.0))

  private val dctBasisValuesSql: String =
    dctBasis.map { case (u, p, c) => s"($u, $p, $c)" }.mkString(", ")

  /** DCT words of a (doc_id, px[256]) relation — the kernel of
    * [[qDedupPhashDct]], split out so MultimodalSpec can drive
    * synthetic pixel grids (brightness-shift invariance) through it.
    *
    * The standard pHash upgrade over aHash: a 2D DCT-II of the 16x16
    * grayscale thumb, keep the top-left 8x8 (low-frequency) block,
    * threshold each coefficient against the MEDIAN of the 63 AC
    * coefficients (DC is excluded from both the hash and the median —
    * a global brightness shift moves ONLY the DC term, so the 63-bit
    * AC hash is exactly invariant to it, where including DC would let
    * one shifted coefficient drag the median and flip unrelated
    * bits). Bits pack into 4 words of 16 (bit index k = 8u + v, band
    * w = k DIV 16; the DC position k = 0 is a constant 0 bit), so
    * banding is the same exact-word equi-join as the aHash pipeline
    * and pigeonhole guarantees any pair within 3 bit-flips collides
    * on >= 1 band. 16-bit bands, not 8: an 8-bit band key space is
    * 256 values — bounded, so band-bucket sizes would grow linearly
    * with the corpus (the quadratic-candidate class the bounded-
    * bucket gate exists to catch); at 16 bits the observed key
    * cardinality scales with the corpus (sparse occupancy of 2^16
    * per band) and random collisions stay rare.
    *
    * Shape: the DCT is SEPARABLE — pass 1 contracts x against the
    * 8x16 basis (256 -> 128 rows/doc), pass 2 contracts y
    * (128 -> 64 rows/doc); both are broadcast joins against the
    * 128-row basis followed by hash aggregates, all codegen (the
    * round-11 posexplode-over-HOF lesson applied). Coefficients are
    * 6dp-stabilized before ranking so engine summation order cannot
    * flip a threshold comparison. */
  private[graft] def dctWordsOf(pxRel: DataFrame): DataFrame = {
    val spark = pxRel.sparkSession
    import spark.implicits._
    val cosM = dctBasis.toDF("u", "p", "c")
    val px = pxRel
      .select($"doc_id", posexplode($"px").as(Seq("i", "v")))
      .select($"doc_id", expr("i DIV 16").as("y"), ($"i" % 16).as("x"), $"v")
    val pass1 = px
      .join(broadcast(cosM.select($"u".as("vf"), $"p".as("x"), $"c")), Seq("x"))
      .groupBy($"doc_id", $"y", $"vf").agg(sum($"v" * $"c").as("r"))
    val coeffs = pass1
      .join(broadcast(cosM.select($"u".as("uf"), $"p".as("y"), $"c")), Seq("y"))
      .groupBy($"doc_id", $"uf", $"vf").agg(round(sum($"r" * $"c"), 6).as("cq"))
      .filter(!($"uf" === 0 && $"vf" === 0)) // drop DC: brightness carrier
    // 63 AC coefficients: the median is the 32nd order statistic
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"cq", $"uf", $"vf")
    val ranked = coeffs.withColumn("rn", row_number().over(wd))
    val thr = ranked.filter($"rn" === 32)
      .select($"doc_id", $"cq".as("thr"))
    ranked.join(thr, Seq("doc_id"))
      .groupBy($"doc_id", expr("(uf * 8 + vf) DIV 16").as("w"))
      .agg(sum(when($"cq" > $"thr",
        expr("shiftleft(CAST(1 AS BIGINT), (uf * 8 + vf) % 16)")).otherwise(0L)).as("word"))
      .ckpt() // (doc_id, w, word): feeds bands AND both verify sides
  }

  private def phashDctWords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = materializeThumbs(spark, dir)
    dctWordsOf(T.spreadScan(spark, path, spark.read.parquet(path), Seq("doc_id"))
      .select($"doc_id", $"px"))
  }

  /** Band-collision candidates of [[qDedupPhashDct]] — split out for
    * ScaleSpec's per-document candidate-load pin. */
  private[graft] def phashDctCandidates(spark: SparkSession, dir: String): DataFrame =
    phashBandPairs(phashDctWords(spark, dir))

  /** DCT-based perceptual-hash image dedup over the same materialized
    * thumbnail sidecar as [[qDedupPhash]] (round-11 verdict task 7:
    * aHash is brittle to luminance redistribution; DCT low-frequency
    * bits are the standard upgrade). Verification keeps pairs within
    * Hamming 10 of 63 (the conventional pHash duplicate threshold);
    * banding guarantees recall only up to 3 flips — pairs at 4..10
    * surface iff a 16-bit word matches exactly, the same documented
    * banding-recall trade as the aHash operator. Full DuckDB oracle
    * over the `{THUMBS}` sidecar; the [[seedThumbs]] rows keep the
    * differential non-empty at every fixture (sf0.1 additionally
    * carries real duplicate-text groups — VACUOUS_EVIDENCE.json). */
  def qDedupPhashDct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = phashDctWords(spark, dir)
    val cand = phashBandPairs(words)
    cand
      .join(words.select($"doc_id".as("a_id"), $"w", $"word".as("wa")), Seq("a_id"))
      .join(words.select($"doc_id".as("bd"), $"w".as("wb_w"), $"word".as("wb")),
        $"b_id" === $"bd" && $"w" === $"wb_w")
      .groupBy($"a_id", $"b_id")
      .agg(sum(bit_count($"wa".bitwiseXOR($"wb"))).cast("int").as("hamming"))
      .filter($"hamming" <= 10)
      .select($"a_id", $"b_id", $"hamming")
      .orderBy($"a_id", $"b_id")
  }

  val qDedupPhashDctSql: String =
    s"""WITH t AS (SELECT doc_id, px FROM read_parquet('{THUMBS}/*.parquet')),
       |cosm AS (SELECT u, p, c::DOUBLE AS c
       |  FROM (VALUES $dctBasisValuesSql) t(u, p, c)),
       |pxx AS (SELECT doc_id, i // 16 AS y, i % 16 AS x, px[i + 1] AS v
       |  FROM t, range(0, 256) r(i)),
       |p1 AS (SELECT doc_id, y, cm.u AS vf, sum(v * cm.c) AS r
       |  FROM pxx JOIN cosm cm ON cm.p = pxx.x GROUP BY doc_id, y, cm.u),
       |co AS (SELECT doc_id, cm.u AS uf, p1.vf, round(sum(r * cm.c), 6) AS cq
       |  FROM p1 JOIN cosm cm ON cm.p = p1.y GROUP BY doc_id, cm.u, p1.vf),
       |ac AS (SELECT * FROM co WHERE NOT (uf = 0 AND vf = 0)),
       |rk AS (SELECT doc_id, uf, vf, cq,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY cq, uf, vf) AS rn
       |  FROM ac),
       |thr AS (SELECT doc_id, cq AS thr FROM rk WHERE rn = 32),
       |words AS MATERIALIZED (SELECT r.doc_id, (r.uf * 8 + r.vf) // 16 AS w,
       |    sum(CASE WHEN r.cq > t2.thr
       |        THEN (1::BIGINT << ((r.uf * 8 + r.vf) % 16)) ELSE 0 END)::BIGINT AS word
       |  FROM rk r JOIN thr t2 ON t2.doc_id = r.doc_id
       |  GROUP BY r.doc_id, (r.uf * 8 + r.vf) // 16),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM words a JOIN words b ON a.w = b.w AND a.word = b.word
       |  WHERE a.doc_id < b.doc_id),
       |ham AS (SELECT c.a_id, c.b_id,
       |    sum(bit_count(xor(wa.word, wb.word)))::INT AS hamming
       |  FROM cand c
       |  JOIN words wa ON wa.doc_id = c.a_id
       |  JOIN words wb ON wb.doc_id = c.b_id AND wb.w = wa.w
       |  GROUP BY c.a_id, c.b_id)
       |SELECT a_id, b_id, hamming FROM ham
       |WHERE hamming <= 10 ORDER BY a_id, b_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_multimodal_meta", qMultimodalMeta, Some(qMultimodalMetaSql)),
    QueryDef("q_multimodal_features", qMultimodalFeaturesFlat, None),
    QueryDef("q_multimodal_frames", qMultimodalFrames, Some(qMultimodalFramesSql)),
    QueryDef("q_multimodal_resize", qMultimodalResize, None),
    QueryDef("q_dedup_phash", qDedupPhash, Some(qDedupPhashSql)),
    QueryDef("q_dedup_phash_dct", qDedupPhashDct, Some(qDedupPhashDctSql)),
  )
}
