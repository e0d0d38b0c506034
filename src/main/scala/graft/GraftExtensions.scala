package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CosineSimilarity, DotProduct}

/** Engine extensions, injected via the standard
  * `spark.sql.extensions=graft.GraftExtensions` config (or
  * `.withExtensions` at build time): registers the engine's native
  * expressions so SQL users get them by name. For a session that
  * already exists, `org.apache.spark.sql.graft.GraftSqlRegistry
  * .register` installs the same functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** (identifier, info, builder) triples — the single source of truth
    * for both injection paths. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children(0), children(1))),
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) =>
        DotProduct(children(0), children(1))))
}
