package graft.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` injection point — exposes graft's codegen
  * kernels to plain SQL, so `spark.sql("SELECT graft_dot(a, b) ...")` works
  * in any session configured with
  * `.config("spark.sql.extensions", "graft.ext.GraftExtensions")`.
  *
  * Only expressions that are pure functions of their columns are registered
  * (model-bound expressions like `graft_predict` carry a driver-built
  * [[graft.predict.FlatModel]] and are constructed through
  * [[graft.predict.Predictor]] instead). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def fn(name: String, builder: Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[VectorDot].getName, name),
    builder)

  private def binary(name: String, make: (Expression, Expression) => Expression)
      (children: Seq[Expression]): Expression = children match {
    case Seq(a, b) => make(a, b)
    case _ => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${children.size}")
  }

  /** (identifier, info, builder) triples — shared by the extensions hook and
    * [[register]]. */
  private def unary1(name: String, make: Expression => Expression)
      (children: Seq[Expression]): Expression = children match {
    case Seq(a) => make(a)
    case _ => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${children.size}")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    fn("graft_dot", binary("graft_dot", VectorDot(_, _))),
    fn("graft_dot_skipnan", binary("graft_dot_skipnan", VectorDot(_, _, skipNaN = true))),
    fn("graft_nfc", unary1("graft_nfc", NfcNormalize(_))))

  /** Register into an ALREADY-RUNNING session (the extensions config only
    * applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /** Bind a trained model to SQL: registers `<name>(features)` (transformed
    * prediction), `<name>_margin(features)` and `<name>_leaf(features)` over
    * an `array<double>` column — `SELECT my_model(features) FROM t`. The
    * flattened model rides the plan as a codegen reference object, exactly
    * like the Column API path. */
  def registerModel(spark: org.apache.spark.sql.SparkSession, name: String,
      model: graft.model.BoosterModel): Unit = {
    import graft.predict.{FlatModel, TreePredict}
    val flat = FlatModel(model)
    def unary(fnName: String, mode: Int) = {
      val builder = (children: Seq[Expression]) => children match {
        case Seq(f) => TreePredict(f, flat, mode): Expression
        case _ => throw new IllegalArgumentException(
          s"$fnName expects 1 argument (features array<double>), got ${children.size}")
      }
      spark.sessionState.functionRegistry.registerFunction(
        new FunctionIdentifier(fnName),
        new ExpressionInfo(classOf[TreePredict].getName, fnName), builder)
    }
    unary(name, TreePredict.Value)
    unary(s"${name}_margin", TreePredict.MarginScalar)
    unary(s"${name}_leaf", TreePredict.Leaf)
  }
}
