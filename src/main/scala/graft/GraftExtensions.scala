package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}

import graft.functions.FloatDotProduct

/** SQL-surface registration of the native vector expressions, so `spark.sql`
  * users get the same codegen'd hot path as the Scala API:
  *
  *   spark.sql("SELECT vec_id, vec_cosine(embedding, q.qe) FROM ...")
  *
  * Two entry points:
  *   - config `spark.sql.extensions=graft.GraftExtensions` (new sessions)
  *   - [[GraftFunctions.register]] (an existing session)
  */
object GraftFunctions {

  private def dot(a: Expression, b: Expression): Expression = FloatDotProduct(a, b)

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "vec_dot"),
      (c: Seq[Expression]) => dot(c(0), c(1))),
    (FunctionIdentifier("vec_l2norm"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "vec_l2norm"),
      (c: Seq[Expression]) => Sqrt(dot(c(0), c(0)))),
    (FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "vec_cosine"),
      (c: Seq[Expression]) =>
        Divide(dot(c(0), c(1)), Multiply(Sqrt(dot(c(0), c(0))), Sqrt(dot(c(1), c(1)))))))

  def register(spark: SparkSession): Unit = all.foreach { case (id, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}

/** Plug-in for `spark.sql.extensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
