package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY.md §4.3 revisited): the two hot
  * kernels of the similarity/dedup families, implemented with
  * `doGenCode` so they compile into whole-stage-codegen'd loops instead
  * of per-element higher-order-function lambda dispatch. Semantics are
  * bit-identical to the HOF formulations they replace (same sequential
  * double-precision accumulation order), so the DuckDB oracles are
  * unchanged.
  */

/** cosine(a, b) over two double arrays; null when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) null else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: may inline into scopes that already declare n/i/...
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i); double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |if ($nx == 0.0 || $ny == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / Math.sqrt($nx * $ny); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** hamming(a, b): number of differing byte positions of two equal-length
  * strings (e.g. '0'/'1' SimHash signatures); null on length mismatch. */
case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    if (x.length != y.length) null
    else {
      var d = 0; var i = 0
      while (i < x.length) { if (x(i) != y(i)) d += 1; i += 1 }
      d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xb = ctx.freshName("xb"); val yb = ctx.freshName("yb")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      s"""
         |byte[] $xb = $a.getBytes(); byte[] $yb = $b.getBytes();
         |if ($xb.length != $yb.length) { ${ev.isNull} = true; }
         |else {
         |  int $d = 0;
         |  for (int $i = 0; $i < $xb.length; $i++) if ($xb[$i] != $yb[$i]) $d++;
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

/** mightContain(bloomWords, hash): test k double-hashed bit positions
  * of a [[graft.functions.Aggregators.BloomSketch]] bitset. Probe-side
  * twin of the sketch aggregator — bit positions are the identical
  * `h1 + i*h2` double-hash, m derived from the word-array length. The
  * codegen'd form keeps a 100 TB decontamination probe inside
  * whole-stage codegen: one array-read + mask per hash function. */
case class BloomMightContain(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def nullSafeEval(words: Any, hash: Any): Any = {
    val arr = words.asInstanceOf[ArrayData]
    val mBits = arr.numElements().toLong * 64L
    val h1 = hash.asInstanceOf[Long]
    val h2 = (h1 >>> 32) | 1L
    var i = 0
    var all = true
    while (i < k && all) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % mBits
      all = ((arr.getLong((pos >>> 6).toInt) >>> (pos & 63L)) & 1L) == 1L
      i += 1
    }
    all
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, h) => {
      // fresh names: this code may inline into scopes (e.g. inside a
      // higher-order-function lambda) that already declare i/pos/etc.
      val m = ctx.freshName("mBits"); val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2"); val all = ctx.freshName("all")
      val i = ctx.freshName("i"); val pos = ctx.freshName("pos")
      s"""
         |long $m = (long) $w.numElements() * 64L;
         |long $h1 = $h;
         |long $h2 = ($h1 >>> 32) | 1L;
         |boolean $all = true;
         |for (int $i = 0; $i < $k && $all; $i++) {
         |  long $pos = (($h1 + $i * $h2) & Long.MAX_VALUE) % $m;
         |  $all = (($w.getLong((int) ($pos >>> 6)) >>> ($pos & 63L)) & 1L) == 1L;
         |}
         |${ev.value} = $all;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** editWithin1(a, b): true iff the byte-level edit distance of two
  * strings is <= 1 — the bounded verifier for FastSS k=1 candidate
  * pairs. A two-pointer scan (common prefix, branch on length parity,
  * suffix compare) runs O(n) with early exit, vs the O(n*m) DP both
  * of `levenshtein(a, b)` and its thresholded form pay per call —
  * measured 956k verifies at sf0.1 drop from ~3 s to threshold noise.
  * Byte-level equals char-level for ASCII identifiers (the FastSS
  * deletion variants are byte-safe on ASCII too); multi-byte UTF-8
  * substitutions count per byte, i.e. the check is conservative. */
case class EditWithin1(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  // inherit null-intolerant nullability (nullable iff an input is):
  // BinaryExpression's default eval returns null on null input, so
  // declaring nullable=false here would lie to the optimizer and risk
  // NPE/wrong filters under codegen when a NULL reaches the SQL
  // function registration

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    EditWithin1.within1(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.EditWithin1.within1($a.getBytes(), $b.getBytes());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditWithin1 =
    copy(left = newLeft, right = newRight)
}

object EditWithin1 {
  /** Static kernel shared by eval and codegen (a plain static call
    * stays inside whole-stage codegen; the JIT inlines it). */
  def within1(x: Array[Byte], y: Array[Byte]): Boolean = {
    val la = x.length; val lb = y.length
    val diff = la - lb
    if (diff > 1 || diff < -1) return false
    val min = if (la < lb) la else lb
    var i = 0
    while (i < min && x(i) == y(i)) i += 1
    if (i == min) return true // pure prefix: lev = |la - lb| <= 1
    if (diff == 0) {
      // substitution at i: suffixes beyond i must match exactly
      var j = i + 1
      while (j < la && x(j) == y(j)) j += 1
      j == la
    } else {
      // insertion/deletion at i: skip one byte of the longer side
      val (lng, sht) = if (diff > 0) (x, y) else (y, x)
      var j = i
      while (j < sht.length && lng(j + 1) == sht(j)) j += 1
      j == sht.length
    }
  }
}

/** jaroWinkler(a, b): Jaro-Winkler similarity in [0, 1] — the
  * record-linkage scoring kernel. Standard algorithm (match window
  * floor(max/2)-1, transpositions halved, Winkler prefix boost 0.1·p
  * for p <= 4 applied above jaro > 0.7), with the same conventions as
  * DuckDB's `jaro_winkler_similarity` (rapidfuzz lineage): either side
  * empty -> 0.0. The double arithmetic mirrors that implementation's
  * accumulation order term-for-term, so oracle scores match
  * bit-for-bit (validated pairwise over the fixture corpus). Byte-level
  * matching == char-level for ASCII inputs; multi-byte UTF-8 code
  * points compare per byte (conservative, both engines operate on
  * UTF-8 bytes). O(|a|·window) time, two small boolean scratch arrays;
  * a static kernel keeps the call inside whole-stage codegen. */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a.getBytes(), $b.getBytes());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Static kernel shared by eval and codegen (JIT-inlined). */
  def similarity(x: Array[Byte], y: Array[Byte]): Double = {
    val l1 = x.length; val l2 = y.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = {
      val w = (if (l1 > l2) l1 else l2) / 2 - 1
      if (w < 0) 0 else w
    }
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = if (i - window > 0) i - window else 0
      val hi = if (i + window + 1 < l2) i + window + 1 else l2
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && x(i) == y(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (x(i) != y(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    var sim = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (sim > 0.7) {
      val pm = if ((if (l1 < l2) l1 else l2) < 4) (if (l1 < l2) l1 else l2) else 4
      var p = 0
      var stop = false
      while (p < pm && !stop) {
        if (x(p) == y(p)) p += 1 else stop = true
      }
      sim = sim + 0.1 * p * (1.0 - sim)
    }
    sim
  }
}

/** hilbert(x, y): index of cell (x, y) on the order-`bits` Hilbert
  * space-filling curve over the [0, 2^bits)^2 grid — the classic
  * xy->d bit walk (quadrant digit + reflect/swap rotation per level,
  * MSB to LSB). Unlike Morton interleaving, consecutive Hilbert
  * indices are always Manhattan-adjacent cells (ZOrderSpec proves
  * both bijectivity and unit-step adjacency exhaustively on a grid),
  * so a layout sorted by this key fragments a 2-D predicate box into
  * fewer file runs than a Z-order sort of the same data. A native
  * expression rather than Column algebra: the per-level rotation
  * rewrites x and y in terms of BOTH previous values, so an unrolled
  * Column formulation grows ~3^bits nodes, while here it is a
  * `bits`-iteration codegen'd loop. Inputs outside the grid are
  * masked to their low `bits` bits (callers scale first). */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val mask = (1L << bits) - 1
    var x = a.asInstanceOf[Long] & mask
    var y = b.asInstanceOf[Long] & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx"); val y = ctx.freshName("hy")
      val d = ctx.freshName("hd"); val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx"); val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      val mask = (1L << bits) - 1
      s"""
         |long $x = $a & ${mask}L, $y = $b & ${mask}L, $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = ($x & $s) > 0 ? 1L : 0L;
         |  long $ry = ($y & $s) > 0 ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points; array inputs are cast to array<double>
  * so callers can pass float embeddings directly. */
object F {
  private def e(c: Column) = GraftShims.toExpr(c)

  def cosineSimilarity(a: Column, b: Column): Column =
    GraftShims.toColumn(CosineSimilarity(
      e(a.cast("array<double>")), e(b.cast("array<double>"))))

  def hammingDistance(a: Column, b: Column): Column =
    GraftShims.toColumn(HammingDistance(
      e(a.cast("string")), e(b.cast("string"))))

  def editWithin1(a: Column, b: Column): Column =
    GraftShims.toColumn(EditWithin1(
      e(a.cast("string")), e(b.cast("string"))))

  def jaroWinkler(a: Column, b: Column): Column =
    GraftShims.toColumn(JaroWinkler(
      e(a.cast("string")), e(b.cast("string"))))

  def bloomMightContain(words: Column, hash: Column, k: Int): Column =
    GraftShims.toColumn(BloomMightContain(
      e(words.cast("array<bigint>")), e(hash.cast("bigint")), k))

  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    GraftShims.toColumn(HilbertIndex(
      e(x.cast("bigint")), e(y.cast("bigint")), bits))
}
