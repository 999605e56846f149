package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop vector kernels as native Catalyst expressions. The HOF
  * spelling (`aggregate(zip_with(...))`) is interpreted — every element pays
  * a boxed lambda call outside whole-stage codegen; a 64-dim dot over a
  * candidate-pair join dominated the near-dup query wall-clock. This
  * expression emits a primitive loop inside codegen instead. Accumulation is
  * left-to-right in double — bit-identical to the HOF spelling and to
  * DuckDB's `list_sum(list_transform(...))`, so oracle hashes are unchanged. */
object VectorMath {

  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  // NaN elements of `a` contribute 0 (gblinear sparse-missing semantics)

  def dotNanFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i); if (x == x) s += x.toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def dotNanFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i); if (x == x) s += x.toDouble * b.getDouble(i); i += 1 }
    s
  }

  def dotNanDF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val x = a.getDouble(i); if (x == x) s += x * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def dotNanDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val x = a.getDouble(i); if (x == x) s += x * b.getDouble(i); i += 1 }
    s
  }
}

/** dot(a, b) over array<float>/array<double> columns in any combination;
  * null arrays yield null (BinaryExpression null-intolerant default).
  * `skipNaN` makes NaN elements of `a` contribute 0 — the gblinear
  * missing-feature convention. */
case class VectorDot(left: Expression, right: Expression,
    skipNaN: Boolean = false) extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires array<float|double> inputs, got (${left.dataType.sql}, ${right.dataType.sql})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def method: String = {
    val base = (elemType(left.dataType).get, elemType(right.dataType).get) match {
      case (FloatType, FloatType) => "FF"
      case (FloatType, DoubleType) => "FD"
      case (DoubleType, FloatType) => "DF"
      case (DoubleType, DoubleType) => "DD"
    }
    (if (skipNaN) "dotNan" else "dot") + base
  }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    method match {
      case "dotFF" => VectorMath.dotFF(x, y)
      case "dotFD" => VectorMath.dotFD(x, y)
      case "dotDF" => VectorMath.dotDF(x, y)
      case "dotDD" => VectorMath.dotDD(x, y)
      case "dotNanFF" => VectorMath.dotNanFF(x, y)
      case "dotNanFD" => VectorMath.dotNanFD(x, y)
      case "dotNanDF" => VectorMath.dotNanDF(x, y)
      case "dotNanDD" => VectorMath.dotNanDD(x, y)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VectorMath.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$cls.$method($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorDot = copy(left = newLeft, right = newRight)
}
