package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Dot product over two `array<double>` columns as a native Catalyst
  * expression with a tight codegen loop.
  *
  * Why not an unrolled 64-term expression: at dim=64 the expanded
  * arithmetic blows whole-stage codegen past janino's 64 KB method limit
  * and every consumer silently falls back to interpreted eval — a ~35×
  * slowdown measured on the all-pairs cosine queries. Why not a UDF: boxing
  * of `WrappedArray[Double]` per row. This loop compiles to ~20 bytecodes
  * and keeps the surrounding stage in codegen.
  *
  * Accumulation is sequential (index 0 → n-1), exactly the order an
  * ANSI-SQL left-associated `a[1]*b[1] + a[2]*b[2] + …` evaluates in, so
  * results stay bit-identical to the DuckDB oracle.
  *
  * Nulls: null if either array is null (standard null-intolerant
  * semantics); mismatched lengths use the common prefix (callers control
  * schemas; fixed-dim embedding columns never hit this).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $acc += $a.getDouble($i) * $b.getDouble($i);
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** PQ asymmetric-distance sum over a flat per-query lookup table: given
  * `lut` (array<double>, laid out block-major as `lut[b*cents + cid]`)
  * and a candidate's `codes` (array<int>, one entry per block), returns
  * `Σ_b lut[b*cents + codes[b]]` — the whole ADC score in one in-row
  * codegen loop.
  *
  * Why an expression: the compositional form explodes each candidate to
  * (block, code) rows, joins the broadcast LUT, and hash-aggregates the
  * sum back — an 8× row blowup plus a shuffleless-but-real aggregation in
  * the search hot path. This loop reads 8 doubles from a broadcast-local
  * array instead; the serving join stays one row per candidate. At 100 TB
  * the candidate stream is the dominant cost of an IVF-PQ search, so the
  * 8× matters.
  *
  * Parity: blocks accumulate in order 0..n-1 starting from 0.0 — `ld2`
  * values are squared distances (≥ 0.0), so the leading `0.0 +` term and
  * the oracle's bare `m0 + m1 + …` chain are bit-identical. `cents` is
  * derived as `lut.length / codes.length`; an out-of-range code fails
  * LOUDLY rather than silently reading a neighboring block's entry.
  *
  * Nulls: null if either array is null (standard null-intolerant
  * semantics). */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val nb = codes.numElements()
    require(nb > 0 && lut.numElements() % nb == 0,
      s"pq_adc: LUT length ${lut.numElements()} not a multiple of block count $nb")
    val cents = lut.numElements() / nb
    var acc = 0.0
    var blk = 0
    while (blk < nb) {
      // a null code slot would read as 0 (block 0's first centroid) and
      // silently misscore — fail loudly instead, like the range check
      require(!codes.isNullAt(blk), s"pq_adc: null code at block $blk")
      val c = codes.getInt(blk)
      require(c >= 0 && c < cents, s"pq_adc: code $c out of range [0, $cents)")
      require(!lut.isNullAt(blk * cents + c), s"pq_adc: null LUT entry at ($blk, $c)")
      acc += lut.getDouble(blk * cents + c)
      blk += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val nb = ctx.freshName("nb")
      val cents = ctx.freshName("cents")
      val blk = ctx.freshName("blk")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
        |int $nb = $codes.numElements();
        |if ($nb <= 0 || $lut.numElements() % $nb != 0) {
        |  throw new IllegalArgumentException("pq_adc: LUT length " +
        |    $lut.numElements() + " not a multiple of block count " + $nb);
        |}
        |int $cents = $lut.numElements() / $nb;
        |double $acc = 0.0;
        |for (int $blk = 0; $blk < $nb; $blk++) {
        |  if ($codes.isNullAt($blk)) {
        |    throw new IllegalArgumentException("pq_adc: null code at block " + $blk);
        |  }
        |  int $c = $codes.getInt($blk);
        |  if ($c < 0 || $c >= $cents) {
        |    throw new IllegalArgumentException(
        |      "pq_adc: code " + $c + " out of range [0, " + $cents + ")");
        |  }
        |  if ($lut.isNullAt($blk * $cents + $c)) {
        |    throw new IllegalArgumentException(
        |      "pq_adc: null LUT entry at (" + $blk + ", " + $c + ")");
        |  }
        |  $acc += $lut.getDouble($blk * $cents + $c);
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** In-row coarse-quantizer assignment: the top-`n` nearest centroids for a
  * vector, scored against a FLAT broadcast centroid array — the whole
  * cell-assignment loop of an IVF-family index in one expression.
  *
  * Why an expression: the compositional form cross-joins every vector
  * against the K-row centroid table (a K× row blowup, each copy carrying
  * the 64-double vector) and ranks with a per-vector window — the rank
  * sort buffer was the 250 MiB peak-task-memory hotspot in the 10×
  * ScaleProbe of the IVF-PQ residual pipeline. This loop reads the
  * broadcast-local centroid array instead: ONE row per vector in, one out,
  * no window, peak memory flat in K and corpus size.
  *
  * Children: `cids` (array<long>, centroid ids SORTED ASCENDING — the
  * caller builds them with array_sort so index order is id order),
  * `cents` (array<double>, row-major flat K×dim), `cnrms` (array<double>,
  * K precomputed L2 norms), `v` (array<double>, the vector). Static
  * params: `n` (how many cells), `byCos` (true = rank by cosine DESC,
  * the IVF convention here; false = rank by squared L2 ASC, the
  * kmeans/IVFADC convention). Ties keep the LOWER centroid id — exactly
  * `row_number() OVER (ORDER BY score [DESC], cid)`.
  *
  * Parity: the dot product and the query norm accumulate sequentially
  * (index 0 → dim-1) like [[DotProduct]]/`l2norm`, cosine divides
  * `dot / (vnrm * cnrm)` and L2 composes `vnrm² − 2·dot + cnrm²` in the
  * same association order as the oracle SQL — score bits match the
  * window-ranked form exactly, so the selected cells are identical.
  *
  * The heavy loop lives in a static helper ([[VecTopCells.topCells]]) so
  * generated code stays tiny (NOTES lesson 8); nulls use standard
  * null-intolerant semantics. */
case class VecTopCells(
    first: Expression, second: Expression, third: Expression, fourth: Expression,
    n: Int, byCos: Boolean) extends QuaternaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_top_cells"

  override def nullSafeEval(cids: Any, cents: Any, cnrms: Any, v: Any): Any =
    VecTopCells.topCells(cids.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData],
      cnrms.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData], n, byCos)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cids, cents, cnrms, v) =>
      s"${ev.value} = graft.expressions.VecTopCells.topCells(" +
        s"$cids, $cents, $cnrms, $v, $n, $byCos);")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

object VecTopCells {
  /** See [[VecTopCells]]. Insertion-sorted top-`n` (n is 1 or nprobe —
    * tiny), strict-better comparisons so equal scores keep the earlier
    * (lower-id) centroid. */
  def topCells(
      cids: ArrayData, cents: ArrayData, cnrms: ArrayData, v: ArrayData,
      n: Int, byCos: Boolean): ArrayData = {
    val dim = v.numElements()
    val k = cids.numElements()
    require(cnrms.numElements() == k,
      s"vec_top_cells: ${cnrms.numElements()} norms for $k centroids")
    require(cents.numElements() == k.toLong * dim,
      s"vec_top_cells: flat centroid length ${cents.numElements()} != $k*$dim")
    var sd = 0.0
    var i = 0
    while (i < dim) { val x = v.getDouble(i); sd += x * x; i += 1 }
    val vnrm = math.sqrt(sd)
    val m = math.min(n, k)
    val bestS = new Array[Double](m)
    val bestK = new Array[Int](m)
    var filled = 0
    var c = 0
    while (c < k) {
      var dot = 0.0
      val off = c * dim
      var j = 0
      while (j < dim) { dot += v.getDouble(j) * cents.getDouble(off + j); j += 1 }
      val score =
        if (byCos) dot / (vnrm * cnrms.getDouble(c))
        else vnrm * vnrm - 2.0 * dot + cnrms.getDouble(c) * cnrms.getDouble(c)
      var pos = filled
      while (pos > 0 && (if (byCos) score > bestS(pos - 1) else score < bestS(pos - 1))) pos -= 1
      if (pos < m) {
        var q = math.min(filled, m - 1)
        while (q > pos) { bestS(q) = bestS(q - 1); bestK(q) = bestK(q - 1); q -= 1 }
        bestS(pos) = score
        bestK(pos) = c
        if (filled < m) filled += 1
      }
      c += 1
    }
    val res = new Array[Long](filled)
    i = 0
    while (i < filled) { res(i) = cids.getLong(bestK(i)); i += 1 }
    new GenericArrayData(res)
  }
}

object VectorOps {
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** ADC sum: see [[PqAdc]]. `lut` array<double> block-major, `codes`
    * array<int> one code per block. */
  def pqAdc(lut: Column, codes: Column): Column =
    GraftBridge.column(PqAdc(GraftBridge.expression(lut), GraftBridge.expression(codes)))

  /** L2 norm via the same sequential accumulation. */
  def l2norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))

  /** Top-`n` coarse cells in rank order: see [[VecTopCells]]. */
  def topCells(
      cids: Column, cents: Column, cnrms: Column, v: Column,
      n: Int, byCos: Boolean = true): Column =
    GraftBridge.column(VecTopCells(
      GraftBridge.expression(cids), GraftBridge.expression(cents),
      GraftBridge.expression(cnrms), GraftBridge.expression(v), n, byCos))
}
