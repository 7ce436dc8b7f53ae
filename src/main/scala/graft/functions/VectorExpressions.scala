package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the embedding operators.
  *
  * Spark's higher-order array functions (`aggregate`, `zip_with`) are
  * interpreted — every element hop allocates and boxes. These expressions
  * generate a tight primitive `double[]` loop via `doGenCode`, keeping the
  * similarity math inside whole-stage codegen; the interpreted `nullSafeEval`
  * twin computes the identical left-to-right sums, so results are
  * bit-identical on either path (and match the DuckDB oracle's sequential
  * `list_sum` formulation).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"expects two array<double> args, got $l and $r")
    }
}

/** Σ x_i·y_i over two double arrays (length = min of the two). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toDoubleArray()
    val ys = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(xs.length, ys.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += xs(i) * ys(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |double[] $xs = $a.toDoubleArray();
         |double[] $ys = $b.toDoubleArray();
         |int $n = java.lang.Math.min($xs.length, $ys.length);
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $dot += $xs[$i] * $ys[$i]; }
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity: Σx·y / (√Σx² · √Σy²). One pass over both arrays. */
case class CosineSim(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toDoubleArray()
    val ys = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(xs.length, ys.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      dot += xs(i) * ys(i); nx += xs(i) * xs(i); ny += ys(i) * ys(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      s"""
         |double[] $xs = $a.toDoubleArray();
         |double[] $ys = $b.toDoubleArray();
         |int $n = java.lang.Math.min($xs.length, $ys.length);
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $xs[$i] * $ys[$i];
         |  $nx += $xs[$i] * $xs[$i];
         |  $ny += $ys[$i] * $ys[$i];
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Elementwise difference of two double arrays (length = min of the two) —
  * the residual kernel of the IVF-PQ family (r = x − c_fine(x), Jégou et
  * al. 2011 §IV). A plain `zip_with` computes the same doubles but
  * interpreted (boxed element hops); this stays inside whole-stage
  * codegen. The DuckDB twin is `list_transform(range(1, d+1),
  * i -> a[i] - b[i])` — the identical per-index IEEE subtraction.
  */
case class VectorSub(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"expects two array<double> args, got $l and $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toDoubleArray()
    val ys = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(xs.length, ys.length)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = xs(i) - ys(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |double[] $xs = $a.toDoubleArray();
         |double[] $ys = $b.toDoubleArray();
         |int $n = java.lang.Math.min($xs.length, $ys.length);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) { $out[$i] = $xs[$i] - $ys[$i]; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid id of a vector against a LITERAL centroid matrix —
  * the IVF assignment kernel. Semantically identical to the composed form
  * `array_position(dots, array_max(dots)) - 1` over per-centroid
  * [[DotProduct]]s (max under Spark's NaN-greatest ordering, then the
  * FIRST index attaining it; ±0.0 compare equal so the tie falls to the
  * lower id, matching the DuckDB twin's `d.dt = m.md`). The best index is
  * tracked INSIDE the max loop with the same NaN-greatest comparison — a
  * NaN max returns the first NaN's position, exactly like Spark SQL's
  * `array_position` (NaN = NaN is true in both Spark and DuckDB), never a
  * −1 that would poison a downstream `element_at(..., 0)`.
  *
  * Exists because the composed form is a tree of nlist × dim literal
  * nodes: fine at nlist ≤ 64, but at the corpus-sized cell counts the
  * round-18 sf10 probe introduced (512 cells × 64 dims ≈ 33k literals)
  * Catalyst analysis + codegen of the tree costs more than the data —
  * measured 5× on ann_ivf at sf1. Here the matrix rides as ONE codegen
  * reference object and the argmax is a tight primitive loop, O(nlist ×
  * dim) per row inside whole-stage codegen with constant plan size.
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects array<double>, got $t")
  }

  private def argmax(xs: Array[Double]): Int = {
    val dots = new Array[Double](cents.length)
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(xs.length, c.length)
      var d = 0.0
      var i = 0
      while (i < n) { d += xs(i) * c(i); i += 1 }
      dots(j) = d
      j += 1
    }
    var mx = dots(0)
    var best = 0
    j = 1
    while (j < dots.length) {
      val d = dots(j)
      if (!java.lang.Double.isNaN(mx) && (java.lang.Double.isNaN(d) || d > mx)) { mx = d; best = j }
      j += 1
    }
    best
  }

  override def nullSafeEval(v: Any): Any =
    argmax(v.asInstanceOf[ArrayData].toDoubleArray())

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the matrix as ONE reference object — constant generated-code size
    // no matter how many cells the quantizer has
    val mat = ctx.addReferenceObj("centroids", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val xs = ctx.freshName("xs"); val dots = ctx.freshName("dots")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val mx = ctx.freshName("mx"); val best = ctx.freshName("best")
      val c = ctx.freshName("c")
      s"""
         |double[] $xs = $v.toDoubleArray();
         |double[] $dots = new double[$mat.length];
         |for (int $j = 0; $j < $mat.length; $j++) {
         |  double[] $c = $mat[$j];
         |  int $n = java.lang.Math.min($xs.length, $c.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $d += $xs[$i] * $c[$i]; }
         |  $dots[$j] = $d;
         |}
         |double $mx = $dots[0];
         |int $best = 0;
         |for (int $j = 1; $j < $dots.length; $j++) {
         |  double $d = $dots[$j];
         |  if (!java.lang.Double.isNaN($mx) && (java.lang.Double.isNaN($d) || $d > $mx)) { $mx = $d; $best = $j; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-centroid id of a vector against a centroid matrix that arrives
  * as a COLUMN (`array<array<double>>`) — the fine-assignment kernel of the
  * two-level IVF quantizer. Same argmax/tie semantics as the literal-matrix
  * [[NearestCentroid]] (max dot under NaN-greatest, FIRST position attaining
  * it — tracked inside the max loop, so a NaN max yields the first NaN's
  * position rather than −1; ±0.0 ties fall to the position order — the
  * DuckDB twin's min-fcid-at-max-dot), but the matrix is data: one row per coarse cell in
  * a broadcast fine-centroid table, so assignment is a broadcast join plus
  * this projection — never an nlist×dim literal tree, never a shuffle. The
  * inner loops read the matrix through `ArrayData.getDouble` (no
  * per-row materialization of the matrix into heap arrays).
  */
case class NearestCentroidDyn(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"expects (array<double>, array<array<double>>), got $l and $r")
    }

  override def nullSafeEval(v: Any, m: Any): Any = {
    val xs = v.asInstanceOf[ArrayData].toDoubleArray()
    val mat = m.asInstanceOf[ArrayData]
    val rows = mat.numElements()
    if (rows == 0) return -1
    val dots = new Array[Double](rows)
    var j = 0
    while (j < rows) {
      val c = mat.getArray(j)
      val n = math.min(xs.length, c.numElements())
      var d = 0.0
      var i = 0
      while (i < n) { d += xs(i) * c.getDouble(i); i += 1 }
      dots(j) = d
      j += 1
    }
    var mx = dots(0)
    var best = 0
    j = 1
    while (j < dots.length) {
      val d = dots(j)
      if (!java.lang.Double.isNaN(mx) && (java.lang.Double.isNaN(d) || d > mx)) { mx = d; best = j }
      j += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) => {
      val xs = ctx.freshName("xs"); val rows = ctx.freshName("rows")
      val dots = ctx.freshName("dots"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val mx = ctx.freshName("mx"); val best = ctx.freshName("best")
      s"""
         |double[] $xs = $v.toDoubleArray();
         |int $rows = $m.numElements();
         |int $best = -1;
         |if ($rows > 0) {
         |  double[] $dots = new double[$rows];
         |  for (int $j = 0; $j < $rows; $j++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $c = $m.getArray($j);
         |    int $n = java.lang.Math.min($xs.length, $c.numElements());
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) { $d += $xs[$i] * $c.getDouble($i); }
         |    $dots[$j] = $d;
         |  }
         |  double $mx = $dots[0];
         |  $best = 0;
         |  for (int $j = 1; $j < $rows; $j++) {
         |    double $d = $dots[$j];
         |    if (!java.lang.Double.isNaN($mx) && (java.lang.Double.isNaN($d) || $d > $mx)) { $mx = $d; $best = $j; }
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFns {
  /** Codegen'd dot product of two `array<double>` columns. */
  def dot_product(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd cosine similarity of two `array<double>` columns. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSim(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd elementwise difference of two `array<double>` columns. */
  def vector_sub(a: Column, b: Column): Column =
    GraftSqlBridge.column(VectorSub(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd nearest-centroid id of an `array<double>` column against a
    * literal centroid matrix (see [[NearestCentroid]]).
    */
  def nearest_centroid(v: Column, cents: Seq[Array[Double]]): Column =
    GraftSqlBridge.column(NearestCentroid(
      GraftSqlBridge.expression(v), cents.map(_.clone()).toArray))

  /** Codegen'd nearest-centroid id of an `array<double>` column against an
    * `array<array<double>>` matrix COLUMN (see [[NearestCentroidDyn]]).
    */
  def nearest_centroid_dyn(v: Column, mats: Column): Column =
    GraftSqlBridge.column(NearestCentroidDyn(
      GraftSqlBridge.expression(v), GraftSqlBridge.expression(mats)))
}
