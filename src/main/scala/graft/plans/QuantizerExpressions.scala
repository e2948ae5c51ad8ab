package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native quantizer kernels for the ANN tier (SURVEY.md §4 tier b).
  *
  * The composable forms — `aggregate`/`zip_with` folds over CODEBOOK
  * LITERALS — have two costs the literal shape cannot shed: the
  * codebooks expand to thousands of `CreateArray`/`Literal` nodes that
  * every analyzer and optimizer pass re-walks (3-4 s of fixed per-query
  * overhead for an IVF-PQ plan), and the folds evaluate interpretively
  * with boxed lambda variables on the corpus-wide encode path. These
  * expressions keep the trained codebooks as PLAIN JVM ARRAYS referenced
  * from the expression object (shipped via `ctx.addReferenceObj` in
  * codegen), so the plan tree is O(1) in codebook size and the hot loops
  * are primitive Java.
  *
  * Arithmetic is ORDER-IDENTICAL to the HOF forms it replaces
  * (left-to-right double accumulation, distance = ‖c‖² − 2·v·c with the
  * precomputed ‖c‖², strict `<` keeping the earlier id on ties), so
  * swapping them in changes no result bit.
  */
private[graft] object QuantizerExpressions {
  /** Element read for float OR double vector arrays. */
  def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float> or array<double>, got $other")
  }
}

/** Nearest-centroid id: argmin_i ‖c_i‖² − 2·v·c_i (strict `<`, earlier
  * id wins ties) — the coarse-quantizer assignment kernel, evaluated as
  * one primitive loop per row in whole-stage codegen.
  */
case class NearestCentroidExpr(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  @transient private lazy val cc: Array[Double] = cents.map(c => c.map(x => x * x).sum)
  @transient private lazy val isFloat = QuantizerExpressions.isFloatArray(child.dataType)

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nearest_centroid"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var best = -1
    var bd = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val n = math.min(c.length, a.numElements())
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += (if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)) * c(d)
        d += 1
      }
      val dist = cc(i) - 2.0 * dot
      if (dist < bd) { bd = dist; best = i }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
      val ccRef = ctx.addReferenceObj("cc", cc, "double[]")
      val (i, d, n, dot, bd, best) = (ctx.freshName("i"), ctx.freshName("d"),
        ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("bd"), ctx.freshName("best"))
      val get = if (isFloat) s"(double) $v.getFloat($d)" else s"$v.getDouble($d)"
      s"""
        int $best = -1;
        double $bd = Double.MAX_VALUE;
        for (int $i = 0; $i < $centsRef.length; $i++) {
          double[] c = $centsRef[$i];
          int $n = Math.min(c.length, $v.numElements());
          double $dot = 0.0;
          for (int $d = 0; $d < $n; $d++) { $dot += ($get) * c[$d]; }
          double dist = $ccRef[$i] - 2.0 * $dot;
          if (dist < $bd) { $bd = dist; $best = $i; }
        }
        ${ev.value} = $best;
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Product-quantization encode: per-subspace argmin codes plus the total
  * squared reconstruction error, as ONE struct-valued expression —
  * replaces `subspaces` separate fold trees. books(s)(j) is subspace
  * s's j-th centroid.
  */
case class PqEncodeExpr(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  @transient private lazy val cc: Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x * x).sum))
  @transient private lazy val subDim = books.head.head.length
  @transient private lazy val isFloat = QuantizerExpressions.isFloatArray(child.dataType)

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("err", DoubleType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val codes = new Array[Int](books.length)
    var err = 0.0
    var s = 0
    while (s < books.length) {
      val off = s * subDim
      // ‖sv‖² first (the dotFast(sv, sv) term of the HOF form)
      var svv = 0.0
      var d = 0
      while (d < subDim) {
        val x = if (isFloat) a.getFloat(off + d).toDouble else a.getDouble(off + d)
        svv += x * x
        d += 1
      }
      var best = -1
      var bd = Double.MaxValue
      var j = 0
      while (j < books(s).length) {
        val c = books(s)(j)
        var dot = 0.0
        d = 0
        while (d < subDim) {
          dot += (if (isFloat) a.getFloat(off + d).toDouble else a.getDouble(off + d)) * c(d)
          d += 1
        }
        val dist = cc(s)(j) - 2.0 * dot
        if (dist < bd) { bd = dist; best = j }
        j += 1
      }
      codes(s) = best
      err += svv + bd
      s += 1
    }
    InternalRow(new GenericArrayData(codes), err)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val booksRef = ctx.addReferenceObj("books", books, "double[][][]")
      val ccRef = ctx.addReferenceObj("cc", cc, "double[][]")
      val (s, d, j, codes, err) = (ctx.freshName("s"), ctx.freshName("d"),
        ctx.freshName("j"), ctx.freshName("codes"), ctx.freshName("err"))
      val vals = ctx.freshName("vals")
      val get = (idx: String) =>
        if (isFloat) s"(double) $v.getFloat($idx)" else s"$v.getDouble($idx)"
      s"""
        int[] $codes = new int[$booksRef.length];
        double $err = 0.0;
        for (int $s = 0; $s < $booksRef.length; $s++) {
          int off = $s * $subDim;
          double svv = 0.0;
          for (int $d = 0; $d < $subDim; $d++) {
            double x = ${get(s"off + $d")};
            svv += x * x;
          }
          int best = -1;
          double bd = Double.MAX_VALUE;
          for (int $j = 0; $j < $booksRef[$s].length; $j++) {
            double[] c = $booksRef[$s][$j];
            double dot = 0.0;
            for (int $d = 0; $d < $subDim; $d++) { dot += (${get(s"off + $d")}) * c[$d]; }
            double dist = $ccRef[$s][$j] - 2.0 * dot;
            if (dist < bd) { bd = dist; best = $j; }
          }
          $codes[$s] = best;
          $err += svv + bd;
        }
        Object[] $vals = new Object[2];
        $vals[0] = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
        $vals[1] = $err;
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($vals);
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Asymmetric SQ8 ADC dot: Σ_j w_j · code_j over per-query weights
  * (array<double>, broadcast with the query row) and candidate codes
  * (array<int>, the compressed scan side). This IS the SQ8 hot loop —
  * it runs once per candidate×query pair over the whole corpus, so it
  * gets `doGenCode` (FAISS's SQ ADC scan layout: the query-dependent
  * affine terms are folded into w/offset, the candidate side stays
  * compressed integers).
  *
  * Semantics exactly match the HOF form it replaces
  * (`aggregate(zip_with(w, codes, (wj, cj) => wj * cj.cast("double")), 0d, +)`):
  * mismatched lengths → NULL (zip_with pads with null), any null
  * element → NULL (null poisons the fold), sequential left-to-right
  * double accumulation.
  */
case class SqAdcDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_sq_adc_dot expects (array<double>, array<int>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sq_adc_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val w = l.asInstanceOf[ArrayData]
    val c = r.asInstanceOf[ArrayData]
    val n = w.numElements()
    if (n != c.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (w.isNullAt(i) || c.isNullAt(i)) return null
      s += w.getDouble(i) * c.getInt(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, c) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        final int $n = $w.numElements();
        if ($n != $c.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($w.isNullAt($i) || $c.isNullAt($i)) { ${ev.isNull} = true; break; }
            $s += $w.getDouble($i) * ((double) $c.getInt($i));
          }
          if (!${ev.isNull}) { ${ev.value} = $s; }
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-query ADC lookup table lut(s)(j) = ‖q_s − c_sj‖². Runs on the
  * broadcast query side (bounded rows), so interpreted eval suffices —
  * the win is the O(1) plan tree.
  */
case class AdcLutExpr(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val subDim = books.head.head.length
  @transient private lazy val isFloat = QuantizerExpressions.isFloatArray(child.dataType)

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_adc_lut"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val lut = new Array[Any](books.length)
    var s = 0
    while (s < books.length) {
      val off = s * subDim
      val row = new Array[Double](books(s).length)
      var j = 0
      while (j < books(s).length) {
        val c = books(s)(j)
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          val x = if (isFloat) a.getFloat(off + d).toDouble else a.getDouble(off + d)
          val diff = x - c(d)
          acc += diff * diff
          d += 1
        }
        row(j) = acc
        j += 1
      }
      lut(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(lut)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `nProbe` nearest inverted-list ids, ties on distance broken by the
  * earlier id (the array_sort-on-(dist, id)-structs contract). Broadcast
  * query side — interpreted eval.
  */
case class ProbeListExpr(child: Expression, cents: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val cc: Array[Double] = cents.map(c => c.map(x => x * x).sum)
  @transient private lazy val isFloat = QuantizerExpressions.isFloatArray(child.dataType)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_probe_list"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val dists = new Array[(Double, Int)](cents.length)
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val n = math.min(c.length, a.numElements())
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += (if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)) * c(d)
        d += 1
      }
      dists(i) = (cc(i) - 2.0 * dot, i)
      i += 1
    }
    val top = dists.sortBy(identity).take(math.min(nProbe, dists.length)).map(_._2)
    new GenericArrayData(top)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
