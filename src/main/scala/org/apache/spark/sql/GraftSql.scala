package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard pattern for libraries that ship custom Catalyst expressions
  * without a SQL-function registration round-trip.
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Unload every cached state-store provider on this JVM's executors.
    *
    * A finished bounded drain leaves its providers (and their in-memory
    * copies of the final state version — 100M+ dedup entries at the
    * 100M-event corpus) cached in [[execution.streaming.state.StateStore]]
    * until the minutely maintenance task notices the query is gone; a
    * following drain then builds ITS state against that dead heap
    * (measured: stream_replay_dedup pass-1 29 s, pass-2 68-149 s in one
    * session). Bounded drains are sequential and their checkpoints are
    * deleted right after, so dropping the provider cache eagerly is pure
    * release; a live query racing this would merely reload from its
    * checkpoint.
    */
  def unloadStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()
}
