package graft.expressions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.expressions.GraftExtensions")`
  * or use the [[GraftFunctions]] Column wrappers (no registration
  * needed) from the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("token_fingerprint"),
      new ExpressionInfo(classOf[TokenFingerprint].getName, "token_fingerprint"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "token_fingerprint takes exactly one argument")
        TokenFingerprint(children.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
  }
}

/** Column-API wrappers for graft's native expressions. Requires the
  * session to be built with the [[GraftExtensions]] extension
  * (GraftSession does this) — resolution goes through the session
  * function registry.
  */
object GraftFunctions {
  def tokenFingerprint(c: Column): Column =
    org.apache.spark.sql.functions.call_function("token_fingerprint", c)
}
