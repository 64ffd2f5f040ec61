package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Native Catalyst dot product over float vectors (SURVEY.md §2.11 /
  * builder-prompt custom-operator preference (b): a codegen'd Expression
  * beats a Scala UDF beats an interpreted higher-order function).
  *
  * Semantics: sequential left fold `0.0 + a(0)*b(0) + a(1)*b(1) + …` with
  * each float widened to double before multiplying — BIT-IDENTICAL to the
  * `aggregate(zip_with(...))` reference formulation in [[graft.llm.Similarity]]
  * and to the DuckDB list_reduce oracle, so swapping it into an oracle-checked
  * query changes nothing but speed. Nulls: inputs with null elements are not
  * produced by any fixture; elements are read as primitive floats.
  *
  * At 100 TB this is the kernel of every similarity scan — whole-stage
  * codegen emits the loop inline in the join stage, no lambda interpreter,
  * no per-element boxing.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
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
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  val dotName = "graft_dot"

  private val dotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProduct(a, b)
    case other => throw new IllegalArgumentException(
      s"$dotName expects 2 arguments, got ${other.size}")
  }

  private val dotInfo = new ExpressionInfo(
    classOf[DotProduct].getName, null, dotName,
    "_FUNC_(a, b) - dot product of two float vectors in double precision", "")

  /** Idempotent session-level registration (for sessions built without the
    * [[GraftExtensions]] config). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(dotName)
    if (!reg.functionExists(id)) reg.registerFunction(id, dotInfo, dotBuilder)
  }

  /** Column-API handle; requires [[register]] (or the extension) first. */
  def dot(a: Column, b: Column): Column = call_function(dotName, a, b)
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` wires the vector
  * kernel into every session at startup — the idiomatic deployment path. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (FunctionIdentifier(VectorFunctions.dotName),
        new ExpressionInfo(classOf[DotProduct].getName, VectorFunctions.dotName),
        { case Seq(a, b) => DotProduct(a, b) }))
}
