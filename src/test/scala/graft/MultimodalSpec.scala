package graft

import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("feature pipeline has the declared schema") {
    val df = ops.Multimodal.qMultimodalFeatures(spark, sf)
    val fields = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(fields("doc_id") === "bigint")
    assert(fields("format") === "string")
    assert(fields("width") === "int")
    assert(fields("height") === "int")
    assert(fields("features") === "array<double>")
  }

  test("stub decode is deterministic and covers every row") {
    val a = ops.Multimodal.qMultimodalFeatures(spark, sf).collect()
    val b = ops.Multimodal.qMultimodalFeatures(spark, sf).collect()
    assert(a.length === ops.T.documents(spark, sf).count())
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
  }

  test("features are 8-bin normalized histograms") {
    val rows = ops.Multimodal.qMultimodalFeatures(spark, sf).collect()
    rows.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Double]]("features")
      assert(f.length === 8)
      val s = f.sum
      assert(s > 0.99 && s < 1.01, s"histogram sums to $s")
    }
  }

  test("real PNG payloads decode through ImageIO with true dimensions") {
    import java.awt.image.BufferedImage
    import org.apache.spark.sql.functions._
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val session = spark
    import session.implicits._
    val blobs = Seq(
      (1L, png(3, 2, 0xffffff)), // white: luminance 255 -> bin 7
      (2L, png(5, 4, 0x000000)), // black: luminance 0 -> bin 0
      (3L, "not an image at all".getBytes("UTF-8"))) // stub fallback
      .toDF("doc_id", "blob")
    val out = ops.Multimodal.featuresOf(blobs).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("format") === "png")
    assert(out(0).getAs[Int]("width") === 3)
    assert(out(0).getAs[Int]("height") === 2)
    assert(out(0).getAs[scala.collection.Seq[Double]]("features")(7) === 1.0)
    assert(out(1).getAs[String]("format") === "png")
    assert(out(1).getAs[Int]("width") === 5)
    assert(out(1).getAs[scala.collection.Seq[Double]]("features")(0) === 1.0)
    // the non-image row takes the deterministic stub path
    assert(Seq("jpeg", "png", "wav").contains(out(2).getAs[String]("format")))
    assert(out(2).getAs[scala.collection.Seq[Double]]("features").sum > 0.99)
  }

  test("metadata format tag agrees between meta query and feature pipeline") {
    import org.apache.spark.sql.functions._
    val meta = ops.Multimodal.qMultimodalMeta(spark, sf).select("doc_id", "format")
    val feat = ops.Multimodal.qMultimodalFeatures(spark, sf).select(
      col("doc_id"), col("format").as("f2"))
    val joined = meta.join(feat, "doc_id")
    assert(joined.filter(col("format") =!= col("f2")).count() === 0)
  }

  test("resize: exact nearest-neighbor pixels on a real PNG, 256-byte contract") {
    import java.awt.image.BufferedImage
    def png2x2: Array[Byte] = {
      // quadrants: white | black in the top row, black | white below
      val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xffffff); img.setRGB(1, 0, 0x000000)
      img.setRGB(0, 1, 0x000000); img.setRGB(1, 1, 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val session = spark
    import session.implicits._
    val blobs = Seq(
      (1L, png2x2),
      (2L, "definitely not an image".getBytes("UTF-8")))
      .toDF("doc_id", "blob")
    val out = ops.Multimodal.resizeOf(blobs, 4, 4).orderBy("doc_id").collect()
    val thumb = out(0).getAs[Array[Byte]]("thumb")
    assert(thumb.length === 16)
    // nearest-neighbor of the 2x2 checkerboard at 4x4: each source
    // pixel becomes a 2x2 block; luminance 255 (white) = -1 as byte
    val w = -1.toByte; val b = 0.toByte
    assert(thumb.toSeq === Seq(w, w, b, b, w, w, b, b, b, b, w, w, b, b, w, w))
    // stub path: deterministic and sized to contract
    val stubThumb = out(1).getAs[Array[Byte]]("thumb")
    assert(stubThumb.length === 16)
    val again = ops.Multimodal.resizeOf(blobs, 4, 4).orderBy("doc_id").collect()
    assert(again(1).getAs[Array[Byte]]("thumb").toSeq === stubThumb.toSeq)
  }

  test("pixel sidecar: unsigned ints matching the thumb bytes, deterministic materialization") {
    import org.apache.spark.sql.functions._
    val session = spark
    import session.implicits._
    val src = ops.T.documents(spark, sf)
      .withColumn("blob", col("text").cast("binary"))
      .select(col("doc_id"), col("blob"))
    // px agrees with the binary thumb byte-for-byte (unsigned view)
    val px = ops.Multimodal.pixelsOf(src).orderBy("doc_id").collect()
    val th = ops.Multimodal.resizeOf(src).orderBy("doc_id").collect()
    px.zip(th).foreach { case (p, t) =>
      val ints = p.getAs[scala.collection.Seq[Int]]("px")
      val bytes = t.getAs[Array[Byte]]("thumb")
      assert(ints.length === 256)
      assert(ints.forall(v => v >= 0 && v <= 255))
      assert(ints.toSeq === bytes.map(_ & 0xff).toSeq)
    }
    // materialization is idempotent: same row set across two writes
    def fingerprint(): (Long, Long) = {
      val path = ops.Multimodal.materializeThumbs(spark, sf)
      val df = spark.read.parquet(path)
      val r = df.select(xxhash64(col("doc_id"),
          expr("array_join(transform(px, x -> cast(x AS string)), ',')")).as("h"))
        .agg(expr("bit_xor(h)"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(fingerprint() === fingerprint())
  }

  test("phash dedup: exact duplicate thumbs pair at hamming 0; output keys sorted") {
    // sf0.1 is the smallest fixture carrying byte-identical duplicate
    // texts (8 groups); identical payloads -> identical thumbs -> the
    // pipeline MUST surface CORPUS hamming-0 pairs there (beyond the
    // synthetic seed rows, which exist at every fixture).
    val out = ops.Multimodal.qDedupPhash(spark, "/root/testdata/sf0.1").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      val h = r.getAs[Int]("hamming")
      assert(h >= 0 && h <= 16)
    }
    assert(out.exists(r => r.getAs[Int]("hamming") === 0 && r.getAs[Long]("a_id") >= 0),
      s"no corpus hamming-0 pair among ${out.length} pairs")
  }

  test("seed thumbnails pin the expected pairs at the smallest fixture (non-vacuous everywhere)") {
    // round-12 verdict task 5: the sf<=0.01 stub thumbs contain no
    // organic image near-dups, so deterministic seed grids (negative
    // doc_ids) keep both phash differentials exercising non-empty
    // output at the verify fixture. The seed design is exact: -3/-2
    // are identical (hamming 0 in both hashes); -1 flips 6 pixels
    // across the mean, confined to aHash word 0 (hamming exactly 6,
    // band collision guaranteed by the 7 untouched words).
    val dir = "/root/testdata/sf0.001"
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
        -> r.getAs[Int]("hamming")).toMap
    val a = pairs(ops.Multimodal.qDedupPhash(spark, dir))
    assert(a.get((-3L, -2L)) === Some(0))
    assert(a.get((-3L, -1L)) === Some(6))
    assert(a.get((-2L, -1L)) === Some(6))
    val d = pairs(ops.Multimodal.qDedupPhashDct(spark, dir))
    assert(d.get((-3L, -2L)) === Some(0),
      s"identical seed grids did not DCT-hash identically: $d")
  }

  test("DCT phash: duplicate thumbs at hamming 0; AC hash exactly brightness-invariant") {
    val session = spark
    import session.implicits._
    // identical thumbs must hash identically through the DCT path too
    val out = ops.Multimodal.qDedupPhashDct(spark, "/root/testdata/sf0.1").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      val h = r.getAs[Int]("hamming")
      assert(h >= 0 && h <= 10)
    }
    assert(out.exists(_.getAs[Int]("hamming") === 0),
      s"no hamming-0 pair among ${out.length} DCT pairs")
    // the aHash-vs-pHash distinction: a GLOBAL brightness shift lands
    // entirely in the DC coefficient, which the 63-bit AC hash
    // excludes — the shifted image must produce the IDENTICAL words
    // (this is why the DCT variant exists; a luminance redistribution
    // that preserves per-pixel rank order also leaves aHash bits
    // unchanged, but only the DCT hash is invariant by construction
    // rather than by rank preservation)
    val base = (0 until 256).map(i => (i * 7 + (i / 16) * 3) % 200)
    val rows = Seq(
      (1L, base),
      (2L, base.map(_ + 40)) // +40 brightness, still in [0, 255]
    ).toDF("doc_id", "px")
    val words = ops.Multimodal.dctWordsOf(rows).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => r.getAs[Int]("w") -> r.getAs[Long]("word")).toMap)
      .toMap
    assert(words(1L) === words(2L),
      s"brightness shift changed the AC DCT hash: ${words(1L)} vs ${words(2L)}")
  }
}
