package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), which Spark 4 hid
  * when the Column API was decoupled from Catalyst. Custom native
  * expressions (graft.functions) need exactly these two hops and nothing
  * else from the internal surface. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager conversion. `expression` returns a lazy `ColumnNodeExpression`
    * that only becomes the real Catalyst node during analysis, so
    * builder code can never pattern-match on it (e.g. to recognize a
    * `.desc` column as a `SortOrder`). This converts immediately —
    * same hop `Dataset.sortInternal` uses. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** The session's stable UUID (`private[sql]` on the classic
    * session) — the key that scopes graft's SQL registry per session,
    * as temp views are. Non-classic sessions fall back to session-state
    * identity (same lifetime, same uniqueness within a JVM). */
  def sessionUUID(spark: SparkSession): String = spark match {
    case c: classic.SparkSession => c.sessionUUID
    case other => "id-" + System.identityHashCode(other.sessionState)
  }
}
