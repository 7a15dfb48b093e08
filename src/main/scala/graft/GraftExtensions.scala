package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.VectorDot

/** Session extensions: registers graft's native expressions in the SQL
  * function registry so `SELECT vector_dot(a, b)` works from plain SQL.
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * — the Column API ([[graft.functions.VectorDot.apply]]) needs no
  * registration and works on any session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Expression

  /** (identifier, info, builder) triples — the exact shape
    * `SparkSessionExtensions.injectFunction` consumes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vector_dot takes exactly 2 arguments")
        VectorDot(children.head, children(1))
      }))
}
