package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's native Catalyst expressions and the public
  * `Column` API.
  *
  * Spark 4 `Column`s wrap `ColumnNode`s, and the Expression⇄Column
  * converters live behind `private[sql]` — so this one-file shim sits in
  * the `org.apache.spark.sql` package (the established pattern for Spark
  * extension libraries that ship custom expressions). Everything else in
  * graft stays in its own namespace and uses only these two hooks.
  *
  * This removes the previous requirement that callers run
  * `GraftFunctions.register(spark)` before using graft's Column builders:
  * a Column built here is self-contained — no session-global function
  * registry mutation, no undefined-function analysis errors on sessions
  * that never registered. (SQL-text usage still goes through
  * `GraftFunctions.register` / `GraftExtensions`.)
  */
object GraftColumn {
  /** Wrap a Catalyst expression as a public Column. */
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression. */
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
