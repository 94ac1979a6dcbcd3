package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, PqAssign}

/** Engine extension point, wired via the standard
  * `SparkSessionExtensions` mechanism (usable both programmatically with
  * `.withExtensions(new GraftExtensions)` and via
  * `spark.sql.extensions=graft.plans.GraftExtensions` on any cluster).
  *
  * Registers the engine's native expressions into the session's function
  * registry so they are first-class SQL functions — resolvable by the
  * analyzer, optimizable by Catalyst, and codegen'd by Tungsten like any
  * built-in. No custom logical rules or strategies are registered: parity
  * needs none (SURVEY.md §4), and the extension layer's operators all
  * lower to built-in plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))
    ))
    ext.injectFunction((
      new FunctionIdentifier("pq_assign"),
      new ExpressionInfo(classOf[PqAssign].getName, "pq_assign"),
      (children: Seq[Expression]) =>
        PqAssign(children.head, children(1), children(2), children(3))
    ))
  }
}
