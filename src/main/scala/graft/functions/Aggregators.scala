package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregators (SURVEY.md §4.3 "possibly one Aggregator
  * for minhash signatures" — delivered). Aggregators participate in
  * partial aggregation: `reduce` runs map-side before the shuffle, so
  * the exchanged rows are one buffer per (group, partition), not one
  * per input row — the property that makes them usable at 100 TB.
  */
object Aggregators {

  /** One-pass k-wide MinHash signature over pre-hashed shingle values.
    * Replaces an explode(k) + two-level groupBy: input rows carry one
    * 31-bit hash; the buffer keeps the k running minima of the affine
    * permutations `(2s+1)*h + (12345 + 6789s) mod 2^31-1` (identical
    * constants to the SQL-oracle pipeline). */
  final class MinHashSig(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    private val p = 2147483647L

    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var s = 0
      while (s < k) {
        val mh = ((2L * s + 1L) * h + (12345L + s * 6789L)) % p
        if (mh < buf(s)) buf(s) = mh
        s += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var s = 0
      while (s < k) { if (b(s) < a(s)) a(s) = b(s); s += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** One-pass 32-bit SimHash over pre-hashed tokens. Input is the
    * token's md5 prefix parsed as a 32-bit integer; bit b (in the
    * hex-nibble indexing the SQL oracle uses: nibble = hex char at
    * position b/4, bit-in-nibble = b%4) contributes +1/-1 to counter b.
    * Finish emits the '0'/'1' signature string. */
  final class SimHashSig extends Aggregator[Long, Array[Int], String] {
    override def zero: Array[Int] = new Array[Int](32)

    override def reduce(buf: Array[Int], h: Long): Array[Int] = {
      var b = 0
      while (b < 32) {
        val bit = (h >> (4 * (7 - b / 4) + (b % 4))) & 1L
        buf(b) += (if (bit == 1L) 1 else -1)
        b += 1
      }
      buf
    }

    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 32) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Int]): String = {
      val sb = new StringBuilder(32)
      var i = 0
      while (i < 32) { sb.append(if (buf(i) > 0) '1' else '0'); i += 1 }
      sb.toString
    }

    override def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Bloom-filter sketch over pre-hashed values (xxhash64 longs):
    * buffer = bitset words, insert sets k double-hashed bits, merge is
    * word-wise OR. The finished sketch is an `array<bigint>` column a
    * probe side tests with [[graft.functions.BloomMightContain]] —
    * the 100 TB decontamination shape: aggregate the (small) eval set
    * into a ~2 MB sketch once, broadcast it, and probe the corpus with
    * a zero-shuffle codegen'd filter instead of a corpus-wide join.
    * Bit positions use double hashing `h1 + i*h2` (Kirsch-Mitzenmacher,
    * public-knowledge construction) so insert and probe agree. */
  final class BloomSketch(mBits: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")

    override def zero: Array[Long] = new Array[Long](mBits / 64)

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val h1 = h
      val h2 = (h >>> 32) | 1L
      var i = 0
      while (i < k) {
        val pos = ((h1 + i * h2) & Long.MaxValue) % mBits
        buf((pos >>> 6).toInt) |= 1L << (pos & 63L)
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Geometric mean: buffer = (sum of logs, count). */
  final class GeoMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** One-pass upper-triangle Gram accumulator (X^T X) over d-dim
    * float vectors: the buffer is the d(d+1)/2 running products, so
    * each partition contributes ONE 2080-slot array to the shuffle
    * instead of 2080 exploded struct rows per input vector. The
    * d^2-bounded merge is exactly how a 1000-executor covariance /
    * PCA pass stays one-scan at 100 TB. */
  final class GramTriangle(d: Int)
      extends Aggregator[Seq[Float], Array[Double], Array[Double]] {
    override def zero: Array[Double] = new Array[Double](d * (d + 1) / 2)

    override def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] = {
      // fail schema drift loudly: a null or wrong-width embedding would
      // otherwise surface as an opaque NPE/AIOOBE deep inside codegen'd
      // aggregation (and a longer vector would silently truncate)
      require(v != null && v.length == d,
        s"GramTriangle: expected non-null length-$d embedding, got " +
          (if (v == null) "null" else s"length ${v.length}"))
      val x = new Array[Double](d)
      var i = 0
      while (i < d) { x(i) = v(i).toDouble; i += 1 }
      var idx = 0
      i = 0
      while (i < d) {
        val xi = x(i)
        var j = i
        while (j < d) { buf(idx) += xi * x(j); idx += 1; j += 1 }
        i += 1
      }
      buf
    }

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Double]): Array[Double] = buf
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Column-API forms (untyped usage inside groupBy().agg). */
  def minhashSig(k: Int)(col: Column): Column = udaf(new MinHashSig(k), Encoders.scalaLong).apply(col)
  def bloomSketch(mBits: Int, k: Int)(col: Column): Column =
    udaf(new BloomSketch(mBits, k), Encoders.scalaLong).apply(col)
  def simhashSig(col: Column): Column = udaf(new SimHashSig, Encoders.scalaLong).apply(col)
  def geoMean(col: Column): Column = udaf(new GeoMean, Encoders.scalaDouble).apply(col)
  def gramTriangle(d: Int)(col: Column): Column =
    udaf(new GramTriangle(d),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()).apply(col)
}
