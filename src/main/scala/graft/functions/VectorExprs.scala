package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.core.Bridge

/** Codegen'd vector primitives over `array<float>` / `array<double>`
  * embedding columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted per element — lambda invocation per multiply. These are
  * tight generated Java loops over the underlying ArrayData (participating
  * in whole-stage codegen), which is what a 100-TB similarity scan wants.
  * Element nulls are not expected in embedding vectors (elements are read
  * primitively); length mismatch uses the shorter length, like `zip_with`
  * would after dropping the tail.
  */
trait VectorElementSupport { self: Expression =>
  protected def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def checkArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float|double>, got ${other.catalogString}")
    }

  protected def readElem(dt: DataType, arr: String, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case _ => throw new IllegalStateException("unreachable")
  }

  protected def elemValue(dt: DataType, arr: ArrayData, i: Int): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case _ => throw new IllegalStateException("unreachable")
  }
}

/** Σ aᵢ·bᵢ in double precision. */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with VectorElementSupport {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    checkArray(left, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess => checkArray(right, prettyName)
      case f => f
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (la, lb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (ta, tb) = (elementType(left), elementType(right))
    val n = math.min(la.numElements(), lb.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += elemValue(ta, la, i) * elemValue(tb, lb, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${readElem(elementType(left), a, i)} * ${readElem(elementType(right), b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
}

/** Σ aᵢ² in double precision. */
case class VectorNorm2(child: Expression)
    extends UnaryExpression with VectorElementSupport {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm2"

  override def checkInputDataTypes(): TypeCheckResult = checkArray(child, prettyName)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val t = elementType(child)
    var s = 0.0
    var i = 0
    while (i < arr.numElements()) {
      val v = elemValue(t, arr, i)
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = ${readElem(elementType(child), a, i)};
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm2 =
    copy(child = newChild)
}

/** argmin_c ‖v − cᵢ‖² over a static centroid matrix — the IVF list
  * assignment — as ONE fused expression. Formulated as an `array()` of
  * per-centroid dot expressions, a 64-centroid assignment blows past
  * whole-stage-codegen limits and every dot falls back to interpreted eval
  * (measured ~100× slower at 100k rows); here both eval paths are a single
  * tight double loop over a referenced double[][]. Uses ‖c‖² − 2·v·c (the
  * ‖v‖² term is row-constant and cannot change the argmin); ties keep the
  * lowest index, matching array_position(d, array_min(d)).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with VectorElementSupport {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = checkArray(child, prettyName)

  private lazy val norms: Array[Double] = centroids.map(_.map(x => x * x).sum)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val isFloat = elementType(child) == FloatType
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(arr.numElements(), cent.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) * cent(i)
        i += 1
      }
      val d = norms(c) - 2.0 * dot
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val nrm = ctx.addReferenceObj("centNorms", norms, "double[]")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val cent = ctx.freshName("cent")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  double[] $cent = $cents[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $cent.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${readElem(elementType(child), a, i)} * $cent[$i];
         |  }
         |  double $d = $nrm[$c] - 2.0 * $dot;
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Batched asymmetric-distance computation for product quantization: given
  * a row's PQ codes (`array<int>`, length m) and Q precomputed query LUTs
  * (`luts(q)(s)(code)` = subspace distance), returns the Q ADC totals as
  * `array<double>` — one tight loop, ~Q·m adds per row, no per-query plan
  * branches. The LUT tensor is a codegen reference object, so the multi-
  * query ANN scan stays a SINGLE pass over the (8-byte-per-vector) codes.
  */
case class PqAdcBatch(child: Expression, luts: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_adc_batch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> codes, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val out = new Array[Double](luts.length)
    var q = 0
    while (q < luts.length) {
      val lut = luts(q)
      var s = 0.0
      var m = 0
      val nm = math.min(codes.numElements(), lut.length)
      while (m < nm) { s += lut(m)(codes.getInt(m)); m += 1 }
      out(q) = s
      q += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val l = ctx.addReferenceObj("pqLuts", luts, "double[][][]")
      val out = ctx.freshName("out")
      val q = ctx.freshName("q")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val nm = ctx.freshName("nm")
      val lut = ctx.freshName("lut")
      s"""
         |double[] $out = new double[$l.length];
         |for (int $q = 0; $q < $l.length; $q++) {
         |  double[][] $lut = $l[$q];
         |  double $s = 0.0;
         |  int $nm = java.lang.Math.min($a.numElements(), $lut.length);
         |  for (int $m = 0; $m < $nm; $m++) {
         |    $s += $lut[$m][$a.getInt($m)];
         |  }
         |  $out[$q] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdcBatch =
    copy(child = newChild)
}

/** Loop-based rounded-argmin PQ encoder — the fused form of
  * `Pq.assignRounded`'s unrolled-chain + struct-array-min formulation,
  * with IDENTICAL semantics: per subspace, each centroid's squared
  * distance is the same left-to-right addition chain, rounded exactly as
  * Spark's `round(_, scale)` rounds doubles (BigDecimal.valueOf → HALF_UP,
  * NaN/Inf passed through), argmin ties broken by lowest centroid id.
  *
  * Exists because the unrolled Column formulation expands to m·k codegen'd
  * distance chains (16×16×4-dim ≈ thousands of generated locals) — one
  * encode inside a fused stage overflows Janino's 64 KB method limit and
  * knocks the WHOLE stage out of whole-stage codegen (observed on q216's
  * ADC scan). Here the generated code is one call into this expression's
  * compiled loop, so the stage stays fused; equality with the unrolled
  * form is pinned by Round16Spec on real data plus random vectors.
  */
case class PqEncodeRounded(child: Expression,
    centroids: Array[Array[Array[Double]]], scale: Int)
    extends UnaryExpression with VectorElementSupport {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode_rounded"

  override def checkInputDataTypes(): TypeCheckResult =
    checkArray(child, prettyName)

  private lazy val isFloat = elementType(child) == FloatType

  def encodeRow(v: ArrayData): ArrayData = {
    val m = centroids.length
    val out = new Array[Int](m)
    var off = 0
    var s = 0
    while (s < m) {
      val cs = centroids(s)
      val subDim = cs(0).length
      // a subspace touching ANY out-of-range OR null element gets code 0 —
      // matching the unrolled form, where an out-of-range element_at (or a
      // null array element) nulls every candidate's distance chain and the
      // struct array_min tie-breaks to centroid 0. (A NULL input vector
      // null-propagates here, vs the unrolled form's accidental [0,...] —
      // the one documented divergence.)
      var hasNull = false
      if (off + subDim <= v.numElements()) {
        var j = 0
        while (j < subDim && !hasNull) {
          if (v.isNullAt(off + j)) hasNull = true
          j += 1
        }
      }
      if (!hasNull && off + subDim <= v.numElements()) {
        var best = 0
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < cs.length) {
          val cent = cs(c)
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val x = (if (isFloat) v.getFloat(off + i).toDouble
                     else v.getDouble(off + i)) - cent(i)
            d += x * x
            i += 1
          }
          // Spark round(double, scale): NaN/Inf unchanged, else
          // BigDecimal.valueOf (shortest-repr) HALF_UP
          val dr =
            if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
            else java.math.BigDecimal.valueOf(d)
              .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
          if (dr < bestD) { bestD = dr; best = c }
          c += 1
        }
        out(s) = best
      } // else: out(s) stays 0 for the truncated/null-touching subspace
      off += subDim
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = encodeRow(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pqEncoder", this,
        classOf[PqEncodeRounded].getName)
      s"${ev.value} = $ref.encodeRow($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeRounded =
    copy(child = newChild)
}

/** ADC distance of ONE query (selected per row by index) against a codes
  * column: `Σ_m luts[qIdx][m][codes[m]]`. The IVF×PQ join shape — after
  * candidates are pruned to (query, row) pairs by probed-list equi-join,
  * each pair needs exactly its own query's ADC, not the full Q-vector
  * [[PqAdcBatch]] computes (which would undo the ~nProbe/nLists scan saving
  * by paying every query's lookups on every candidate row). The LUT tensor
  * is a codegen reference object; per row the work is m lookups + adds.
  */
case class PqAdcSelect(left: Expression, right: Expression,
    luts: Array[Array[Array[Double]]]) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_select"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int> codes, int queryIdx), got (${l.catalogString}, ${r.catalogString})")
  }

  /** Shared by the interpreted and codegen paths. Contract checks fail
    * LOUDLY with a typed error instead of AIOOBE-from-generated-code or —
    * worse — a silently partial sum: a qi from a different query batch, a
    * codes column of the wrong m, or a code beyond the codebook's k are
    * all caller bugs (mixed codebooks), never data conditions to tolerate.
    */
  def adcRow(codes: ArrayData, qi: Int): Double = {
    if (qi < 0 || qi >= luts.length)
      throw new IllegalArgumentException(
        s"$prettyName: query index $qi outside LUT batch [0, ${luts.length})")
    val lut = luts(qi)
    if (codes.numElements() != lut.length)
      throw new IllegalArgumentException(
        s"$prettyName: codes has m=${codes.numElements()} subspaces but the " +
          s"LUT was built for m=${lut.length} — mixed codebooks?")
    var s = 0.0
    var m = 0
    while (m < lut.length) {
      val code = codes.getInt(m)
      if (code < 0 || code >= lut(m).length)
        throw new IllegalArgumentException(
          s"$prettyName: code $code at subspace $m outside codebook k=${lut(m).length}")
      s += lut(m)(code)
      m += 1
    }
    s
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    adcRow(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("pqAdcSelect", this,
        classOf[PqAdcSelect].getName)
      s"${ev.value} = $ref.adcRow($a, $b);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcSelect =
    copy(left = l, right = r)
}

object VectorExprs {
  def dot(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expr(a), Bridge.expr(b)))
  def norm2(a: Column): Column =
    Bridge.column(VectorNorm2(Bridge.expr(a)))
  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(NearestCentroid(Bridge.expr(v), centroids))
  def pqAdcBatch(codes: Column, luts: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqAdcBatch(Bridge.expr(codes), luts))
  def pqAdcSelect(codes: Column, queryIdx: Column,
      luts: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqAdcSelect(Bridge.expr(codes), Bridge.expr(queryIdx), luts))
  def pqEncodeRounded(v: Column, centroids: Array[Array[Array[Double]]],
      scale: Int): Column =
    Bridge.column(PqEncodeRounded(Bridge.expr(v), centroids, scale))
}
