package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's private[sql] Column <-> Expression converters, so
  * graft's custom Catalyst expressions can surface as user-facing Columns.
  * (In Spark 4 a Column wraps a ColumnNode, not an Expression; the official
  * converter lives in `org.apache.spark.sql.classic.ExpressionUtils`.)
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager ColumnNode -> Expression conversion. [[expression]] returns a
    * LAZY `ColumnNodeExpression` wrapper, which the analyzer only unwraps
    * at Dataset API boundaries — inside a function-registry builder it
    * survives to codegen and dies Unevaluable. This converts immediately,
    * yielding a plain (possibly Unresolved*) Catalyst tree the analyzer
    * handles like any parsed SQL.
    */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Release the cached RDD behind a `localCheckpoint()`ed Dataset.
    * `Dataset.unpersist` goes through the cacheManager, which never
    * registered a local checkpoint — the checkpoint RDD sits directly in
    * `sc.persistentRdds` until the ContextCleaner happens to GC it, which
    * a long-lived driver (or a leak-counting spec) cannot rely on. A
    * superseded checkpoint (a k-means iteration's previous centroids)
    * should release deterministically; this unpersists the underlying
    * `LogicalRDD`'s RDD, and is a no-op for any other plan shape.
    */
  def unpersistLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Apply an extension's function registrations onto an EXISTING session
    * (the same `registerFunctions` path `withExtensions` runs at session
    * build) — for callers that cannot control session creation order.
    */
  def registerFunctionExtensions(spark: SparkSession,
      f: SparkSessionExtensions => Unit): Unit = {
    val ext = new SparkSessionExtensions
    f(ext)
    ext.registerFunctions(spark.sessionState.functionRegistry)
  }
}
